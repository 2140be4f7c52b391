package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.canon.ConnectedComponents
import graft.extract.{ExtractMetrics, Lit, PatternAutomaton, PatternRule, TripleExtractor}
import graft.model.{GraphEdge, Ids, Page, Schema}
import graft.store.TableIO

/** Rule-diff incremental recompute — the full G3 shape (≙ joern's
  * ArgumentTainter re-analyzing only affected functions and patching the
  * graph delta, `tools/argumentTainter/ArgumentTainterMain.java`,
  * `ddg/DataDependenceGraph/DDGDifference.java`).
  *
  * Given (oldRules, newRules):
  *   1. diff the rule sets structurally;
  *   2. derive the affected-page predicate — a page can gain or lose a
  *      triple of a changed rule only if its text contains EVERY literal of
  *      that rule (the necessary-condition prefilter, same shape as the
  *      reference's `queryTemplate.groovy` literal pre-grep). Substring
  *      containment over lowercased text is a strict superset of the
  *      tokenizer's view, so no affected page can be missed;
  *   3. map affected urls to their triples-table buckets, invalidate
  *      exactly those ([[TableIO.invalidateBuckets]] — manifest-first,
  *      crash-safe);
  *   4. re-extract ONLY pages hashing into the touched buckets (a bucket
  *      holds every page that hashes there, affected or not) under the new
  *      rules, reusing the materialized GLOBAL canonical mapping, and let
  *      [[TableIO.writeBucketed]] recompute exactly the missing buckets.
  *
  * If a `same_as` rule changed, the global canonical mapping itself is
  * stale and the recompute falls back to a full rebuild (all buckets) —
  * detected, not hoped away.
  *
  * Scale shape: the diff cost is proportional to |touched buckets| / |all
  * buckets| of the corpus, not to corpus size — extraction, canonical join
  * and write all run over the restricted page set only.
  */
object Incremental {

  /** Rules whose semantics changed: structural symmetric difference. */
  def changedRules(oldRules: Seq[PatternRule], newRules: Seq[PatternRule]): Seq[PatternRule] = {
    val o = oldRules.toSet
    val n = newRules.toSet
    ((o diff n) ++ (n diff o)).toSeq.sortBy(_.ruleId)
  }

  /** Necessary-condition page filter: SOME changed rule has ALL its literal
    * words contained in the page's EXTRACTED text — derived with the same
    * [[graft.extract.TextExtractor.pageText]] the extractor itself reads
    * (html-backed pages ignore the `text` column entirely, so a column
    * predicate over `text` would miss them and leave stale buckets). A
    * literal-free rule matches structurally anywhere → every page. */
  def affectedPages(pages: Dataset[Page], changed: Seq[PatternRule]): Dataset[Page] = {
    val litsPerRule: Seq[Seq[String]] =
      changed.map(_.items.collect { case Lit(w) => w.toLowerCase })
    if (litsPerRule.isEmpty) pages.limit(0)
    else if (litsPerRule.exists(_.isEmpty)) pages
    else pages.filter { p =>
      val txt = graft.extract.TextExtractor.pageText(p.html, p.text).toLowerCase
      litsPerRule.exists(lits => lits.forall(txt.contains))
    }
  }

  private def bucketCol(numBuckets: Int): Column =
    pmod(xxhash64(col("url")), lit(numBuckets)).cast("int")

  /** Remap canonical ids in both triple slots (broadcast — merge-sized). */
  private def applyRemap(t: DataFrame, r: DataFrame): DataFrame =
    t.join(broadcast(r.withColumnRenamed("from", "subj")
        .withColumnRenamed("to", "subjTo")), Seq("subj"), "left")
      .join(broadcast(r.withColumnRenamed("from", "obj")
        .withColumnRenamed("to", "objTo")), Seq("obj"), "left")
      .select(
        coalesce(col("subjTo"), col("subj")).as("subj"), col("pred"),
        coalesce(col("objTo"), col("obj")).as("obj"),
        col("objValue"), col("url"), col("conf"))

  /** Eager merge fallout: find the buckets holding rows whose canonical ids
    * changed and overwrite exactly those. Returns the rewritten buckets. */
  private def rewriteStaleTriples(spark: SparkSession, triplesDir: String,
                                  remap: DataFrame, remapN: Long,
                                  numBuckets: Int): Set[Int] = {
    import spark.implicits._
    val old = TableIO.read(spark, triplesDir)
    val tb = bucketCol(numBuckets).as("b")
    // merges are usually few: below the literal threshold the stale-row
    // probe is ONE scan with an isin predicate that pushes into parquet
    // (row-group stats skip clean files); past it, two broadcast-semi
    // column scans. Either way only (subj|obj, url) columns are read.
    val stale =
      (if (remapN <= 256) {
        val ks = remap.select($"from").as[Long].collect().toSeq
        old.filter(col("subj").isin(ks: _*) || col("obj").isin(ks: _*)).select(tb)
      } else {
        val keys = broadcast(remap.select($"from"))
        old.join(keys, col("subj") === col("from"), "left_semi").select(tb)
          .union(old.join(keys, col("obj") === col("from"), "left_semi").select(tb))
      }).distinct().collect().map(_.getInt(0)).toSet
    if (stale.nonEmpty) {
      val rewritten = applyRemap(TableIO.read(spark, triplesDir, Some(stale)), remap)
        .dropDuplicates("subj", "pred", "obj", "objValue", "url")
      TableIO.rewriteBuckets(rewritten, triplesDir, col("url"), stale,
        numBuckets = numBuckets)
    }
    stale
  }

  /** Deterministic batch tag: xor of the batch's page-url hashes — the same
    * batch (even redelivered or re-deduped) always produces the same tag. */
  private def batchTag(flatB: DataFrame): String = {
    val r = flatB.filter(col("rowKind") === "p")
      .agg(expr("bit_xor(xxhash64(url))")).head()
    java.lang.Long.toHexString(if (r.isNullAt(0)) 0L else r.getLong(0))
  }

  /** Append signed entity-refcount deltas EXACTLY ONCE. Deltas are not
    * idempotent by key (existing entities already have rows), so
    * exactly-once rests on a per-batch MARKER in the manifest counters:
    * addCounters sum-merges by key, a fresh key is an insert, and the
    * manifest commit is atomic with the data files — a redelivered batch
    * sees its marker and skips. Returns true when the marker was already
    * present (a resume). */
  private def appendRefDeltas(spark: SparkSession, outDir: String,
                              deltas: DataFrame, marker: String,
                              numBuckets: Int): Boolean = {
    val dir = s"$outDir/entity_refcounts"
    val applied = TableIO.readManifest(dir).exists(_.counters.contains(marker))
    if (!applied) {
      val d = deltas.localCheckpoint(true)
      // an entity-free batch re-derives the same empty delta on any retry —
      // no marker needed, and committing one would be a pointless snapshot
      if (!d.isEmpty)
        TableIO.appendBucketed(d, dir, col("id"), Map(marker -> 1L), numBuckets)
    }
    applied
  }

  /** Maintenance fold for the refcount delta log (the compact-verb family):
    * collapse to one row per entity (sum of signed deltas), dropping
    * zero-count entities — aggregate-equivalent by construction. The
    * manifest counters (incl. every batch marker) carry over through the
    * snapshot swap, so exactly-once holds across a fold. */
  def foldRefcounts(spark: SparkSession, outDir: String,
                    numBuckets: Int = TableIO.NumBuckets): Long = {
    val dir = s"$outDir/entity_refcounts"
    val m = TableIO.readManifest(dir)
    if (m.isEmpty) return 0L
    val folded = TableIO.read(spark, dir).groupBy("id")
      .agg(sum("n").as("n")).filter(col("n") =!= 0L)
      .localCheckpoint(true)
    swapWrite(folded, dir, col("id"), m.get.counters, numBuckets)
    folded.count()
  }

  /** Entity-id remap lifted to the SAME_AS node-id space (merge-sized). */
  private def nodeRemap(spark: SparkSession, r: DataFrame): DataFrame = {
    import spark.implicits._
    r.as[(Long, Long)]
      .map { case (f, t) => (Ids.entityNodeId(f), Ids.entityNodeId(t)) }
      .toDF("oldDst", "newDst").localCheckpoint(true)
  }

  private def applyEdgeRemap(e: DataFrame, remapNode: DataFrame): DataFrame =
    e.join(broadcast(remapNode),
      col("dst") === col("oldDst") && col("kind") === Schema.EdgeKinds.SameAs, "left")
      .select(col("src"), coalesce(col("newDst"), col("dst")).as("dst"),
        col("kind"), col("variable"), col("label"))

  /** Eager SAME_AS merge fallout on the edges table (dst references roots;
    * rows scatter by src hash). Returns the rewritten buckets. */
  private def rewriteStaleSameAs(spark: SparkSession, edgesDir: String,
                                 remap: DataFrame, numBuckets: Int): Set[Int] = {
    val remapNode = nodeRemap(spark, remap)
    val stale = TableIO.read(spark, edgesDir)
      .filter(col("kind") === Schema.EdgeKinds.SameAs)
      .join(broadcast(remapNode), col("dst") === col("oldDst"), "left_semi")
      .select(pmod(xxhash64(col("src")), lit(numBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSet
    if (stale.nonEmpty) {
      val rewritten = applyEdgeRemap(TableIO.read(spark, edgesDir, Some(stale)), remapNode)
      TableIO.rewriteBuckets(rewritten, edgesDir, col("src"), stale,
        numBuckets = numBuckets)
    }
    stale
  }

  /** Read the triples table with any pending merge remap applied — the
    * merge-on-read path. The broadcast join is merge-sized; the dedup is
    * what the physical rewrite would have done (url is in the dedup key and
    * determines the bucket, so it collapses only genuine within-page
    * duplicates). With no pending remap this is exactly `TableIO.read`. */
  def readTriples(spark: SparkSession, outDir: String): DataFrame = {
    val t = TableIO.read(spark, s"$outDir/triples")
    pendingRemap(spark, outDir) match {
      case None => t
      case Some(r) => applyRemap(t, r)
        .dropDuplicates("subj", "pred", "obj", "objValue", "url")
    }
  }

  /** Read the edges table with any pending merge remap applied to its
    * SAME_AS rows (the only edge kind referencing canonical roots). No
    * dedup needed: each mapped id has exactly one SAME_AS row and the remap
    * touches only its dst. */
  def readEdges(spark: SparkSession, outDir: String): DataFrame = {
    val e = TableIO.read(spark, s"$outDir/edges")
    pendingRemap(spark, outDir) match {
      case None => e
      case Some(r) => applyEdgeRemap(e, nodeRemap(spark, r))
    }
  }

  private def remapDir(outDir: String): String = s"$outDir/canon_remap"

  private def pendingRemap(spark: SparkSession, outDir: String): Option[DataFrame] =
    TableIO.readManifest(remapDir(outDir)) match {
      case Some(m) if m.buckets.values.sum > 0 =>
        Some(TableIO.read(spark, remapDir(outDir)))
      case _ => None
    }

  /** Fold a pending deferred remap into the physical triples AND edges rows
    * and drop the side table — the maintenance job that restores
    * zero-overhead reads (run it with [[TableIO.compact]] on the same
    * schedule; the KgCli `compact` verb does both). Idempotent: a crash
    * between the rewrites and the side-table delete re-applies a remap
    * whose `from` values no longer exist, a no-op. Returns the rewritten
    * (triplesBuckets, edgesBuckets). */
  def compactMergeRemap(spark: SparkSession, outDir: String,
                        numBuckets: Int = TableIO.NumBuckets): (Set[Int], Set[Int]) = {
    val rd = remapDir(outDir)
    if (TableIO.readManifest(rd).isEmpty) return (Set.empty, Set.empty)
    // the remap must survive the side-table delete below (blocks, not files)
    val r = TableIO.read(spark, rd).localCheckpoint(true)
    val rn = r.count()
    val folded =
      if (rn == 0) (Set.empty[Int], Set.empty[Int])
      else (rewriteStaleTriples(spark, s"$outDir/triples", r, rn, numBuckets),
        rewriteStaleSameAs(spark, s"$outDir/edges", r, numBuckets))
    TableIO.deleteRecursively(rd)
    folded
  }

  /** Apply a rule diff to a materialized build at `outDir`. Returns the set
    * of invalidated/recomputed triples buckets (empty = no-op diff). */
  def applyRuleDiff(spark: SparkSession, pages: Dataset[Page],
                    oldRules: Seq[PatternRule], newRules: Seq[PatternRule],
                    outDir: String, nPersons: Int = 500,
                    numBuckets: Int = TableIO.NumBuckets): Set[Int] = {
    val changed = changedRules(oldRules, newRules)
    if (changed.isEmpty) return Set.empty

    // a same_as diff changes the connected-components input globally: the
    // materialized mapping is stale, so every bucket is affected
    val sameAsChanged = changed.exists(_.pred == "same_as")
    val touched: Set[Int] =
      if (sameAsChanged) (0 until numBuckets).toSet
      else affectedPages(pages, changed)
        .select(bucketCol(numBuckets).as("b")).distinct()
        .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return Set.empty

    TableIO.invalidateBuckets(s"$outDir/triples", touched)

    val restricted =
      if (touched.size == numBuckets) pages
      else pages.filter(bucketCol(numBuckets).isin(touched.toSeq: _*))
    val components =
      if (sameAsChanged) None
      else Some(TableIO.read(spark, s"$outDir/components"))
    val t = Pipeline.run(spark, restricted, nPersons,
      rules = newRules, precomputedComponents = components)
    TableIO.writeBucketed(t.triples, s"$outDir/triples", col("url"),
      Map("ruleDiffTouchedBuckets" -> touched.size.toLong), numBuckets)
    if (sameAsChanged) {
      // refresh the mapping table too — later diffs depend on it
      TableIO.invalidateBuckets(s"$outDir/components", (0 until numBuckets).toSet)
      TableIO.writeBucketed(t.components, s"$outDir/components", col("id"),
        Map("ruleDiffTouchedBuckets" -> touched.size.toLong), numBuckets)
      // the evidence sidecar derives from the same_as rows — refresh it in
      // lockstep or a later removePages would recompute a stale mapping
      val evDir = s"$outDir/sameas_evidence"
      if (TableIO.readManifest(evDir).isDefined) {
        TableIO.invalidateBuckets(evDir, (0 until numBuckets).toSet)
        TableIO.writeBucketed(Pipeline.sameAsEvidence(t.flat), evDir, col("a"),
          Map("ruleDiffTouchedBuckets" -> touched.size.toLong), numBuckets)
      }
    }
    patchGraphTables(spark, t, outDir, sameAsChanged, touched.size.toLong, numBuckets)
    t.flatEnc.unpersist(false)
    if (components.isEmpty) t.components.unpersist(false)
    touched
  }

  /** Patch the materialized graph tables (when present) so they stay
    * consistent with the refreshed triples — the DDGDifference shape: drop
    * the affected subgraph, add the recomputed one. Rule-derived graph
    * content is exactly the Triple provenance nodes and their SUBJ/OBJ
    * edges (mentions/links/hosts come from the gazetteer, SAME_AS from the
    * mapping); `t` covers the re-extracted pages, so its Triple subgraph
    * replaces theirs. nodes/edges are bucketed by id/src — affected rows
    * scatter across every bucket, so the patch is a full-table REWRITE
    * (snapshot-swap, crash-recoverable): O(|graph|) I/O but zero
    * re-extraction CPU, still far below a rebuild. The triples table
    * itself stays O(touched buckets). */
  private def patchGraphTables(spark: SparkSession, t: Pipeline.Tables,
                               outDir: String, fullRebuild: Boolean,
                               touchedN: Long, numBuckets: Int): Unit = {
    if (TableIO.readManifest(s"$outDir/nodes").isEmpty) return
    val meta = Map("ruleDiffTouchedBuckets" -> touchedN)
    val (newNodes, newEdges) =
      if (fullRebuild) (t.nodes, t.edges)
      else {
        val oldNodes = TableIO.read(spark, s"$outDir/nodes")
        val oldEdges = TableIO.read(spark, s"$outDir/edges")
        // stale = Triple nodes of the re-extracted pages, by old content ids
        val affectedPids = t.nodes.filter(col("kind") === "Page")
          .select(col("pageId")).distinct()
        val staleIds = oldNodes.filter(col("kind") === "Triple")
          .join(affectedPids, Seq("pageId"), "left_semi")
          .select(col("id")).localCheckpoint(true)
        val pn = oldNodes.join(staleIds, Seq("id"), "left_anti")
          .unionByName(t.nodes.filter(col("kind") === "Triple"))
        // only SUBJ/OBJ edges have a Triple src, so one src anti-join drops
        // exactly the stale provenance edges
        val pe = oldEdges
          .join(staleIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .unionByName(t.edges.filter(col("kind").isin("SUBJ", "OBJ")))
        (pn, pe)
      }
    swapWrite(newNodes, s"$outDir/nodes", col("id"), meta, numBuckets)
    swapWrite(newEdges, s"$outDir/edges", col("src"), meta, numBuckets)
  }

  /** Snapshot-swap rewrite (the tags-table pattern): stage into `.new`
    * while the live table is still readable (the patched frame reads it
    * lazily), then move live aside and the snapshot in — a crash between
    * the renames leaves a recoverable copy rather than nothing. */
  private def swapWrite(df: org.apache.spark.sql.DataFrame, path: String,
                        key: Column, meta: Map[String, Long], numBuckets: Int): Unit = {
    import java.nio.file.{Files, Paths}
    TableIO.deleteRecursively(s"$path.new")
    TableIO.writeBucketed(df, s"$path.new", key, meta, numBuckets)
    TableIO.deleteRecursively(s"$path.old")
    if (Files.exists(Paths.get(path)))
      Files.move(Paths.get(path), Paths.get(s"$path.old"))
    Files.move(Paths.get(s"$path.new"), Paths.get(path))
    TableIO.deleteRecursively(s"$path.old")
  }

  final case class AppendStats(
      pages: Long,              // batch pages ingested (after lang filter)
      newMappingRows: Long,     // canonical-mapping rows added by the batch
      remappedIds: Long,        // old canonical ids whose root changed (merges)
      tripleBucketsRewritten: Int,
      edgeBucketsRewritten: Int,
      skippedTables: Seq[String]) // tables that already had the batch (resume)

  /** Corpus-growth ingest — the production increment for a crawl pipeline:
    * a batch of NEW pages (new urls) joins an already-materialized build at
    * `outDir`, for O(|batch|) extraction work plus an O(merge-fallout) patch.
    *
    * The interesting part is canonicalization. New pages can carry same_as
    * evidence that MERGES previously-distinct entity components, which
    * retroactively changes canonical ids in already-committed rows. The old
    * mapping (id → root) is itself a spanning forest of the old same-as
    * graph, so CC over (old mapping rows ∪ batch pairs) — an entity-sized
    * input, independent of corpus size — yields exactly the full-corpus
    * mapping (roots are min-ids on both CC paths, so they are corpus-order
    * independent). The fallout is then applied as deltas:
    *
    *   - triples: rows whose subj/obj canonical id changed are found by a
    *     broadcast semi-join (remap is merge-sized), and ONLY their buckets
    *     are rewritten via [[TableIO.rewriteBuckets]] — the Iceberg
    *     overwrite: new files commit in the manifest before stale files
    *     drop, so no caller-side materialization is needed and a crash at
    *     any point loses nothing. The triple dedup key includes `url` and
    *     `url` determines the bucket, so bucket-local dropDuplicates after
    *     remapping equals the full rebuild's global dedup.
    *   - edges: only SAME_AS rows reference roots (entity/mention/page rows
    *     carry raw ids); stale ones (dst ∈ remapped roots) get the same
    *     bucket-subset rewrite; mapping rows new in the merged mapping
    *     append as fresh SAME_AS edges.
    *   - nodes: never reference roots — page-scoped rows (Page / Mention /
    *     Triple) append blindly; corpus-global rows (Host / Domain / Entity,
    *     the dimension tables of the graph) are deduped by an anti-join
    *     against only the buckets the batch's ids hash into.
    *   - components: the merged mapping replaces the table via snapshot-swap
    *     — LAST, which makes a crashed append resumable (see below).
    *
    * Crash/retry: each table's append commits atomically (one manifest
    * swap), and a retry detects per table whether the batch is already in
    * (all-or-nothing key overlap) and skips it. Because the components swap
    * happens last, a retry recomputes the SAME merged mapping and remap set
    * from the unchanged old mapping (CC is deterministic), and the bucket
    * rewrites no-op once applied (no stale rows match). A batch that mixes
    * new and already-ingested urls is rejected — a re-crawled url is an
    * UPDATE (invalidate + rewrite its bucket), not an append.
    *
    * Scale shape: extraction, linking and canonical join are O(|batch|);
    * the CC input is O(|entities|); the dedup/overlap probes read only the
    * O(|batch|) buckets their keys hash into (driver-side file pruning);
    * merge fallout rewrites only the buckets holding affected rows. Nothing
    * scans the corpus. */
  /** `deferMergeRewrite`: the merge-on-read option. A merge into a popular
    * entity (the head-entity case) can make EVERY triples bucket stale —
    * and the hot component's SAME_AS edges scatter by src hash, staling the
    * edges table the same way — so the eager default pays near-full-table
    * rewrites at append time. With deferral, the remap lands in ONE tiny
    * side table (`<outDir>/canon_remap`, entity-id space): [[readTriples]]
    * and [[readEdges]] apply it as broadcast joins, and
    * [[compactMergeRemap]] — the monthly maintenance job, like
    * [[TableIO.compact]] — folds it into both tables' rows and drops it.
    * Appends stay O(batch) no matter how hot the merged entity is; reads
    * between merge and compaction pay one small broadcast join. Successive
    * deferred remaps COMPOSE (old chain routed through the new mapping),
    * and an eager append onto a table with a pending remap folds it first.
    * Note: direct `TableIO.read` of triples/edges sees the PHYSICAL
    * (pre-merge) rows until compaction — readers that must see current
    * canonical ids go through readTriples/readEdges (KgCli does). */
  def appendPages(spark: SparkSession, newPages: Dataset[Page], outDir: String,
                  nPersons: Int = 500, targetLang: String = "en",
                  rules: Seq[PatternRule] = PatternAutomaton.DefaultRules,
                  canonBroadcastCutover: Long = Pipeline.CanonBroadcastCutover,
                  numBuckets: Int = TableIO.NumBuckets,
                  deferMergeRewrite: Boolean = false): AppendStats = {
    import spark.implicits._
    import Schema.{EdgeKinds => EK, NodeKinds => NK}
    Seq("triples", "nodes", "edges", "components", "sameas_evidence",
        "entity_refcounts").foreach { t =>
      require(TableIO.readManifest(s"$outDir/$t").isDefined,
        s"appendPages requires a fully materialized build at $outDir (missing $t)")
    }
    // an EAGER append must see physically-canonical rows — fold any pending
    // deferred remap first so the stale-row probe can trust the bytes
    if (!deferMergeRewrite) compactMergeRemap(spark, outDir, numBuckets)
    def bucketsOf(df: DataFrame, c: String): Set[Int] =
      df.select(pmod(xxhash64(col(c)), lit(numBuckets)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet

    // ---- extract the batch (O(|batch|), the same stage-2 as a full run) ----
    // a crawl micro-batch may carry the same url twice (re-fetch inside the
    // batch window) — resolve to ONE row per url deterministically (latest
    // warc_ts, content-hash tie-break) so the batch is a set of pages and
    // the per-table resume guards agree with each other
    val dedupPages = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("url")
        .orderBy(col("warc_ts").desc, xxhash64(col("text")), xxhash64(col("html")),
          col("lang")) // lang included: rows differing ONLY in lang must
                       // still resolve identically on every retry
      newPages.toDF().withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn").as[Page]
    }
    val gaz = spark.sparkContext.broadcast(Pipeline.defaultGazetteer(nPersons))
    val auto = spark.sparkContext.broadcast(PatternAutomaton.compile(rules))
    val metrics = new ExtractMetrics(spark)
    val flatB = TripleExtractor
      .extractFlat(dedupPages.filter($"lang" === targetLang), gaz, auto, metrics)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val batchCounters = Pipeline.flatCounters(flatB)
    val nBatch = batchCounters("pagesIn")
    if (nBatch == 0L) { flatB.unpersist(false); return AppendStats(0, 0, 0, 0, 0, Nil) }

    val pageIds = flatB.filter($"rowKind" === "p")
      .select($"pageId".as("id")).localCheckpoint(true)

    // ---- the AUTHORITATIVE batch-vs-corpus check, BEFORE anything commits:
    // Page nodes cover every ingested page (triple-url overlap would miss
    // zero-triple pages and could let one table commit while another
    // rejects — a permanent split). All-or-nothing: all present = resume,
    // none = fresh append, a mix = misuse, rejected atomically.
    val nodesDir = s"$outDir/nodes"
    val pageOverlap = TableIO.read(spark, nodesDir, Some(bucketsOf(pageIds, "id")))
      .filter(col("kind") === Schema.NodeKinds.Page)
      .join(pageIds, Seq("id"), "left_semi").count()
    require(pageOverlap == 0 || pageOverlap == nBatch,
      s"batch mixes new and already-ingested urls ($pageOverlap of $nBatch " +
        s"already in $nodesDir) — a re-crawled url is an update, not an append")

    // ---- merged canonical mapping (entity-sized CC, corpus-independent) ----
    val oldComponents = TableIO.read(spark, s"$outDir/components")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newPairs = flatB.filter($"rowKind" === "t" && $"pred" === "same_as" && $"obj" >= 0)
      .select($"subj".as("a"), $"obj".as("b")).distinct()
    val havePairs = newPairs.limit(1).count() > 0
    val components2 =
      if (!havePairs) oldComponents
      else ConnectedComponents.auto(spark,
        oldComponents.select($"id".as("a"), $"component".as("b")).unionByName(newPairs)
          .localCheckpoint(true))
        .persist(StorageLevel.MEMORY_AND_DISK)
    // remap: old canonical value (root, or the raw id of a previously
    // unmapped singleton) → new root, where they differ. Merge-sized.
    val remap =
      if (!havePairs) Seq.empty[(Long, Long)].toDF("from", "to")
      else components2
        .join(oldComponents.withColumnRenamed("component", "oldC"), Seq("id"), "left")
        .select(coalesce($"oldC", $"id").as("from"), $"component".as("to"))
        .filter($"from" =!= $"to").distinct().localCheckpoint(true)
    val remapN = remap.count()
    // mapping rows the batch introduces — computed ONCE (stat + the fresh
    // SAME_AS edge source share it)
    val freshMapping =
      if (!havePairs) Seq.empty[(Long, Long)].toDF("id", "component")
      else components2.join(oldComponents.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
    val newMappingRows = if (!havePairs) 0L else freshMapping.count()

    // ---- the three data tables are INDEPENDENT — patch them as concurrent
    // jobs (the materialize precedent): the append path is dominated by
    // driver-synchronized round trips, and on a real cluster three output
    // pipelines sharing the executor pool beat a serial walk just the same
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // ---- triples: rewrite merge-stale buckets, then append the batch ----
    val triplesDir = s"$outDir/triples"
    val triplesF = Future {
    val triplesB = Pipeline.canonicalizeTriples(flatB, components2, canonBroadcastCutover)
    val batchUrls = triplesB.select($"url").distinct().localCheckpoint(true)
    val nUrls = batchUrls.count()
    val urlBuckets = bucketsOf(batchUrls, "url")
    // per-table resume detection (mixed batches were already rejected by the
    // authoritative page-node check; a partial overlap here can only mean a
    // corrupted table — appendBucketed commits are all-or-nothing)
    val tripOverlap =
      if (nUrls == 0) 0L
      else TableIO.read(spark, triplesDir, Some(urlBuckets))
        .join(batchUrls, Seq("url"), "left_semi").select("url").distinct().count()
    assert(tripOverlap == 0 || tripOverlap == nUrls,
      s"triples table at $triplesDir holds a partial batch ($tripOverlap of $nUrls urls)")
    // a batch extracting ZERO triples has no url to probe — fall back to the
    // authoritative page check, or a redelivery would append (and re-count)
    // its empty frame's counters a second time
    val tripApplied =
      if (nUrls == 0) pageOverlap == nBatch else tripOverlap == nUrls

    val tripleBucketsRewritten: Set[Int] =
      if (remapN == 0) Set.empty
      else if (deferMergeRewrite) {
        // merge-on-read: record the remap in the side table, touch no data
        // file. A pending chain is ROUTED through the new mapping first so
        // one read-time lookup always reaches the current root.
        val rd = remapDir(outDir)
        val pending = TableIO.readManifest(rd)
          .map(_ => TableIO.read(spark, rd))
          .getOrElse(Seq.empty[(Long, Long)].toDF("from", "to"))
        val hop = remap.withColumnRenamed("from", "t0").withColumnRenamed("to", "t1")
        val routed = pending.join(broadcast(hop), pending("to") === hop("t0"), "left")
          .select(pending("from"), coalesce($"t1", pending("to")).as("to"))
        swapWrite(routed.unionByName(remap).dropDuplicates("from", "to"),
          rd, col("from"), Map.empty, 1)
        Set.empty
      } else
        rewriteStaleTriples(spark, triplesDir, remap, remapN, numBuckets)
    if (!tripApplied)
      TableIO.appendBucketed(triplesB, triplesDir, col("url"), batchCounters, numBuckets)
    (tripApplied, tripleBucketsRewritten)
    }

    // ---- graph tables: batch subgraph + SAME_AS delta ----
    // empty mapping here: graphTables derives only its SAME_AS rows from the
    // mapping, and those are handled as an explicit delta below
    val emptyComp = Seq.empty[(Long, Long)].toDF("id", "component")
    val (nodesB, edgesB) = Pipeline.graphTables(spark, flatB, emptyComp)

    val edgesDir = s"$outDir/edges"
    val edgesF = Future {
    val hostBuckets = bucketsOf(
      flatB.filter($"rowKind" === "p").select($"hostId".as("h")).distinct(), "h")
    val edgeOverlap = TableIO.read(spark, edgesDir, Some(hostBuckets))
      .filter(col("kind") === EK.IsPageOf)
      .join(pageIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("dst").distinct().count()
    assert(edgeOverlap == 0 || edgeOverlap == nBatch,
      s"edges table at $edgesDir holds a partial batch ($edgeOverlap of $nBatch pages)")
    val edgesApplied = edgeOverlap == nBatch

    // SAME_AS rows are the only edges referencing canonical roots; their
    // merge fallout scatters by src hash, so a hot merge makes this a
    // near-full-table rewrite too — the SAME deferral applies (the node-id
    // remap derives from the entity-id side table, so one table serves both)
    val edgeBucketsRewritten: Set[Int] =
      if (remapN == 0 || deferMergeRewrite) Set.empty
      else rewriteStaleSameAs(spark, edgesDir, remap, numBuckets)
    if (!edgesApplied) {
      val freshSameAs =
        freshMapping
          .as[(Long, Long)]
          .map { case (id, comp) =>
            GraphEdge(Ids.entityNodeId(id), Ids.entityNodeId(comp), EK.SameAs, null) }
          .toDF().select(col("src"), col("dst"), col("kind"), col("variable"), col("label"))
      // IS_PARENT_HOST rows are dimension edges (one per distinct host) —
      // like the dimension nodes, dedup against the buckets they hash into;
      // every other batch edge is page-scoped and cannot pre-exist
      val ph = edgesB.filter(col("kind") === EK.IsParentHost).localCheckpoint(true)
      val phExisting = TableIO.read(spark, edgesDir,
        Some(bucketsOf(ph.select(col("src").as("s")), "s")))
        .filter(col("kind") === EK.IsParentHost).select("src", "dst")
      val novelPh = ph.join(phExisting, Seq("src", "dst"), "left_anti")
      TableIO.appendBucketed(
        edgesB.filter(col("kind") =!= EK.IsParentHost)
          .unionByName(novelPh).unionByName(freshSameAs),
        edgesDir, col("src"), batchCounters, numBuckets)
    }
    (edgesApplied, edgeBucketsRewritten)
    }

    val nodesF = Future {
    // the authoritative pre-check already counted this table's Page rows
    val nodesApplied = pageOverlap == nBatch
    if (!nodesApplied) {
      val pageScoped = nodesB.filter(col("kind").isin(NK.Page, NK.Mention, NK.TripleN))
      // dimension rows (host/domain/entity universe ≪ corpus): dedup against
      // only the buckets the batch's ids hash into
      val globals = nodesB.filter(col("kind").isin(NK.Host, NK.Domain, NK.Entity))
        .localCheckpoint(true)
      val gBuckets = bucketsOf(globals, "id")
      val existing = TableIO.read(spark, nodesDir, Some(gBuckets))
        .filter(col("kind").isin(NK.Host, NK.Domain, NK.Entity)).select("id")
      val novel = globals.join(existing, Seq("id"), "left_anti")
      TableIO.appendBucketed(pageScoped.unionByName(novel), nodesDir, col("id"),
        batchCounters, numBuckets)
    }
    nodesApplied
    }

    val evidenceF = Future {
    // same-as evidence rides with every batch: the takedown path
    // (removePages) recomputes the canonical mapping from this table, so an
    // append must keep it exactly what a full rebuild would extract. Rows
    // are keyed (a, b, url), bucketed by a — the resume probe reads only the
    // batch pairs' buckets.
    val evDir = s"$outDir/sameas_evidence"
    val evB = Pipeline.sameAsEvidence(flatB).localCheckpoint(true)
    val nEv = evB.count()
    val evApplied =
      if (nEv == 0L) true
      else {
        val evOverlap = TableIO.read(spark, evDir, Some(bucketsOf(evB.select($"a"), "a")))
          .join(evB, Seq("a", "b", "url"), "left_semi").count()
        assert(evOverlap == 0 || evOverlap == nEv,
          s"evidence table at $evDir holds a partial batch ($evOverlap of $nEv pairs)")
        evOverlap == nEv
      }
    if (!evApplied) TableIO.appendBucketed(evB, evDir, col("a"), batchCounters, numBuckets)
    evApplied && nEv > 0 // "skipped" = a genuine resume, not an empty batch
    }

    val refcountF = Future {
    // entity refcount delta log: the batch's per-entity mention counts
    // append as positive deltas. Deltas are NOT idempotent by key (existing
    // entities already have rows), so exactly-once rests on a per-batch
    // MARKER in the manifest counters: addCounters sum-merges by key, a
    // fresh key is an insert, and the manifest commit is atomic with the
    // data files — a redelivered batch sees its marker and skips.
    appendRefDeltas(spark, outDir, Pipeline.entityRefDeltas(flatB),
      "batch_" + batchTag(flatB.toDF()), numBuckets)
    }

    val (tripApplied, tripleBucketsRewritten) = Await.result(triplesF, Duration.Inf)
    val (edgesApplied, edgeBucketsRewritten) = Await.result(edgesF, Duration.Inf)
    val nodesApplied = Await.result(nodesF, Duration.Inf)
    val evApplied = Await.result(evidenceF, Duration.Inf)
    Await.result(refcountF, Duration.Inf)

    // ---- components: snapshot-swap LAST (the retry-convergence anchor).
    // Swap only when the batch actually CHANGED the mapping (merges or new
    // rows): a redelivered batch computes components2 from the already-
    // swapped table, both deltas are zero, and re-swapping would both pay a
    // pointless O(|mapping|) rewrite and double-add the batch counters. A
    // retry after a crash-before-swap still sees nonzero deltas (the old
    // table is unchanged) and completes the swap — with the counters added
    // exactly once, since the crashed run never got here.
    // Counter semantics (deliberate): the components manifest's counters
    // advance only with mapping-CHANGING batches — it is a derived
    // dimension table, not an ingest log; the three data tables carry the
    // per-batch lineage.
    if (havePairs && (remapN > 0 || newMappingRows > 0)) {
      val priorC = TableIO.readManifest(s"$outDir/components").get.counters
      val mergedC = (priorC.keySet ++ batchCounters.keySet).map { k =>
        k -> (priorC.getOrElse(k, 0L) + batchCounters.getOrElse(k, 0L)) }.toMap
      swapWrite(components2.toDF(), s"$outDir/components", col("id"), mergedC, numBuckets)
    }

    val skipped = Seq(
      if (tripApplied) Some("triples") else None,
      if (edgesApplied) Some("edges") else None,
      if (nodesApplied) Some("nodes") else None,
      if (evApplied) Some("sameas_evidence") else None).flatten
    flatB.unpersist(false)
    oldComponents.unpersist(false)
    if (havePairs) components2.unpersist(false)
    AppendStats(nBatch, newMappingRows, remapN,
      tripleBucketsRewritten.size, edgeBucketsRewritten.size, skipped)
  }

  final case class RemoveStats(
      pages: Long,        // batch pages actually removed (present ∩ lang)
      deadPairs: Long,    // same-as pairs whose LAST evidence left the corpus
      remappedIds: Long,  // entity ids whose canonical root changed/vanished
      deadHosts: Long, deadDomains: Long, deadEntities: Long,
      tripleBucketsRewritten: Int, // incl. the split-fallout rewrites
      edgeBucketsRewritten: Int,
      nodeBucketsRewritten: Int,
      affectedUrls: Long) // surviving pages re-derived by the split fallout

  /** Takedown propagation — the retraction increment (GDPR/DMCA removal at
    * corpus scale): delete a batch of pages from a materialized build so
    * every table equals a FULL REBUILD over the remaining corpus. The
    * inverse of [[appendPages]], and the hard direction of canonicalization:
    * a removed page can carry the LAST same-as evidence for an entity
    * merge, which retroactively SPLITS a canonical component — and a split
    * is not a function of the stored canonical value (two raw ids sharing a
    * root diverge), so unlike the merge case it cannot be patched by a
    * value remap or deferred to read time.
    *
    * Shape, fast path (no dead evidence — the common takedown):
    *   - the batch's exact build-time rows are re-DERIVED by re-running the
    *     deterministic extraction on the removed pages (O(batch)) — that IS
    *     the delete manifest: every page-scoped key, candidate dimension id
    *     and candidate same-as pair, with no tombstone bookkeeping to keep
    *     in sync;
    *   - triples/evidence: drop by url in the O(batch) buckets those urls
    *     hash into ([[TableIO.rewriteBuckets]] — atomic manifest swap per
    *     table, crash loses nothing);
    *   - nodes/edges: drop page-scoped rows by their exact ids (page-scoped
    *     id spaces are kind-prefixed hashes — an anti-join on id cannot
    *     touch dimension rows); dimension rows (Host/Domain/Entity) die
    *     only when their last referencing page leaves — host/domain
    *     liveness probes read ONLY the candidates' buckets (IS_PAGE_OF /
    *     IS_PARENT_HOST_OF are bucketed by the dimension id), and entity
    *     liveness reads the candidates' buckets of the `entity_refcounts`
    *     delta log (post-batch sum == 0 ⇒ dead) — every step O(batch), no
    *     corpus-wide scan anywhere on this path.
    *
    * Slow path (some candidate pair lost its last evidence): recompute CC
    * over the SURVIVING pair set from the `sameas_evidence` side table —
    * O(evidence), corpus-independent, exactly the full rebuild's input — and
    * diff against the old mapping. Rows referencing a changed old root are
    * found by one column-pruned triples scan, their pages re-extracted
    * (from the caller-supplied remaining corpus) and their url buckets
    * rewritten wholesale with the new mapping; SAME_AS edges and the
    * components table follow as deltas/snapshot-swap.
    *
    * Crash/retry: idempotent. The page NODES are the presence anchor
    * (deleted LAST): a retry first probes them — all gone means the removal
    * completed (early no-op; negative manifest counters cannot double-
    * subtract); still present means every step re-runs, and each step
    * either detects it already applied (key probes find nothing) or
    * converges (rewrites are replace-by-content; the components snapshot
    * swaps only when the recomputed diff is nonempty, and the SAME_AS edge
    * delta lands BEFORE the swap so a crash between them re-derives the
    * same diff from the unchanged old mapping). A takedown list may carry
    * never-crawled or already-removed urls — they restrict away against the
    * presence probe and no-op. */
  def removePages(spark: SparkSession, removedPages: Dataset[Page],
                  remaining: Dataset[Page], outDir: String,
                  nPersons: Int = 500, targetLang: String = "en",
                  rules: Seq[PatternRule] = PatternAutomaton.DefaultRules,
                  canonBroadcastCutover: Long = Pipeline.CanonBroadcastCutover,
                  numBuckets: Int = TableIO.NumBuckets): RemoveStats = {
    import spark.implicits._
    import Schema.{EdgeKinds => EK}
    Seq("triples", "nodes", "edges", "components", "sameas_evidence",
        "entity_refcounts").foreach { tb =>
      require(TableIO.readManifest(s"$outDir/$tb").isDefined,
        s"removePages requires a fully materialized build at $outDir (missing $tb)")
    }
    // eager semantics: fold any pending deferred merge remap first (the
    // eager-append rule) so the probes below can trust the physical bytes
    compactMergeRemap(spark, outDir, numBuckets)
    def bucketsOf(df: DataFrame, c: String): Set[Int] =
      df.select(pmod(xxhash64(col(c)), lit(numBuckets)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
    // a using-columns join MOVES the join keys to the front — the rewritten
    // buckets must keep the table's committed column order or readers of a
    // patched table would see a different physical schema than a rebuild's
    def keepOrder(df: DataFrame, like: Seq[String]): DataFrame =
      df.select(like.map(col): _*)

    val gaz = spark.sparkContext.broadcast(Pipeline.defaultGazetteer(nPersons))
    val auto = spark.sparkContext.broadcast(PatternAutomaton.compile(rules))
    val metrics = new ExtractMetrics(spark)
    val flatR0 = TripleExtractor
      .extractFlat(removedPages.filter($"lang" === targetLang), gaz, auto, metrics)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // presence anchor: restrict to pages actually IN the build
    val nodesDir = s"$outDir/nodes"
    val batchPageIds = flatR0.filter($"rowKind" === "p").select($"pageId".as("id"))
    val presentPages = TableIO.read(spark, nodesDir, Some(bucketsOf(batchPageIds, "id")))
      .filter(col("kind") === Schema.NodeKinds.Page)
      .join(batchPageIds, Seq("id"), "left_semi")
      .select(col("id").as("presentPid")).localCheckpoint(true)
    val nPresent = presentPages.count()
    if (nPresent == 0L) {
      flatR0.unpersist(false); presentPages.unpersist(false)
      return RemoveStats(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    }
    val flatR = flatR0.toDF()
      .join(presentPages, flatR0("pageId") === col("presentPid"), "left_semi")
      .as[graft.extract.FlatRow].persist(StorageLevel.MEMORY_AND_DISK)
    val negCounters = Pipeline.flatCounters(flatR).map { case (k, v) => k -> -v }

    // refcount deltas FIRST (exactly-once via the batch marker): dimension
    // liveness below is defined on POST-batch sums, so retries on either
    // side of this append read the same answer
    appendRefDeltas(spark, outDir,
      Pipeline.entityRefDeltas(flatR).select(col("id"), (-col("n")).as("n")),
      "takedown_" + batchTag(flatR.toDF()), numBuckets)

    val pRows = flatR.filter($"rowKind" === "p")
      .select($"pageId", $"url", $"host", $"hostId").localCheckpoint(true)
    val urls = pRows.select("url").localCheckpoint(true)
    val pageIds = pRows.select($"pageId".as("id"))
    val mentionIds = flatR.filter($"rowKind" === "m").select($"mentionId".as("id"))
    val tripleNodeIds = flatR.filter($"rowKind" === "t" && $"tripleNodeId" =!= 0L)
      .select($"tripleNodeId".as("id")).distinct()

    // ---- triples: drop the batch urls' rows in their O(batch) buckets ----
    val triplesDir = s"$outDir/triples"
    val urlBuckets = bucketsOf(urls, "url")
    val tripPresent = TableIO.read(spark, triplesDir, Some(urlBuckets))
      .join(urls, Seq("url"), "left_semi").limit(1).count() > 0
    val tripleBuckets1: Set[Int] =
      if (!tripPresent) Set.empty
      else {
        val cur = TableIO.read(spark, triplesDir, Some(urlBuckets))
        TableIO.rewriteBuckets(
          keepOrder(cur.join(urls, Seq("url"), "left_anti"), cur.columns),
          triplesDir, col("url"), urlBuckets, negCounters, numBuckets)
        urlBuckets
      }

    // ---- evidence: drop batch rows, detect pairs whose LAST evidence left ----
    val evDir = s"$outDir/sameas_evidence"
    val candPairs = flatR.filter($"rowKind" === "t" && $"pred" === "same_as" && $"obj" >= 0)
      .select($"subj".as("a"), $"obj".as("b")).distinct().localCheckpoint(true)
    val deadPairsN =
      if (candPairs.isEmpty) 0L
      else {
        val evBuckets = bucketsOf(candPairs.select("a"), "a")
        val hasBatchRows = TableIO.read(spark, evDir, Some(evBuckets))
          .join(urls, Seq("url"), "left_semi").limit(1).count() > 0
        if (hasBatchRows) {
          val cur = TableIO.read(spark, evDir, Some(evBuckets))
          TableIO.rewriteBuckets(
            keepOrder(cur.join(urls, Seq("url"), "left_anti"), cur.columns),
            evDir, col("a"), evBuckets, negCounters, numBuckets)
        }
        val survivors = TableIO.read(spark, evDir, Some(evBuckets))
          .select("a", "b").distinct()
        candPairs.join(survivors, Seq("a", "b"), "left_anti").count()
      }

    // ---- canonical mapping refresh (slow path only) ----
    val compDir = s"$outDir/components"
    val oldC = TableIO.read(spark, compDir).persist(StorageLevel.MEMORY_AND_DISK)
    val (changed, newC) =
      if (deadPairsN == 0) (null: DataFrame, null: DataFrame)
      else {
        val pairs = TableIO.read(spark, evDir).select($"a", $"b").distinct()
          .localCheckpoint(true)
        val n = ConnectedComponents.auto(spark, pairs).persist(StorageLevel.MEMORY_AND_DISK)
        // removal only shrinks the pair set, so every id in the new mapping
        // exists in the old one: changed = old rows whose root moved or left
        val ch = oldC
          .join(n.withColumnRenamed("component", "newComp"), Seq("id"), "left")
          .filter(!($"component" <=> $"newComp"))
          .select($"id", $"component".as("oldComp"), $"newComp")
          .localCheckpoint(true)
        (ch, n)
      }
    val remappedN = if (changed == null) 0L else changed.count()

    // ---- split fallout: re-derive affected surviving pages from source ----
    val (falloutBuckets, nAffected) =
      if (remappedN == 0) (Set.empty[Int], 0L)
      else {
        val changedVals = broadcast(changed.select($"oldComp".as("v")).distinct())
        val t = TableIO.read(spark, triplesDir)
        val affectedUrls = t
          .join(changedVals, t("subj") === col("v") || t("obj") === col("v"), "left_semi")
          .select("url").distinct()
          .join(urls, Seq("url"), "left_anti")
          .localCheckpoint(true)
        val nAff = affectedUrls.count()
        if (nAff == 0) (Set.empty[Int], 0L)
        else {
          val affPages = remaining.join(affectedUrls, Seq("url"), "left_semi").as[Page]
          val flatA = TripleExtractor.extractFlat(affPages, gaz, auto, metrics)
          val regenerated = Pipeline.canonicalizeTriples(flatA, newC, canonBroadcastCutover)
          val affBuckets = bucketsOf(affectedUrls, "url")
          val cur = TableIO.read(spark, triplesDir, Some(affBuckets))
          val keep = keepOrder(cur.join(affectedUrls, Seq("url"), "left_anti"), cur.columns)
          TableIO.rewriteBuckets(keep.unionByName(regenerated), triplesDir, col("url"),
            affBuckets, Map.empty, numBuckets)
          (affBuckets, nAff)
        }
      }

    // ---- dimension liveness probes (candidate buckets only; batch rows
    // excluded explicitly so a retry reads the same answer either side of
    // the edges rewrite) ----
    val edgesDir = s"$outDir/edges"
    val hostCand = pRows.select($"hostId".as("h")).distinct().localCheckpoint(true)
    val hostBuckets = bucketsOf(hostCand, "h")
    val liveHosts = TableIO.read(spark, edgesDir, Some(hostBuckets))
      .filter(col("kind") === EK.IsPageOf)
      .join(hostCand.withColumnRenamed("h", "src"), Seq("src"), "left_semi")
      .join(pageIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .select($"src".as("h")).distinct()
    val deadHosts = hostCand.join(liveHosts, Seq("h"), "left_anti").localCheckpoint(true)
    val nDeadHosts = deadHosts.count()

    val domCand = Pipeline.hostDomainOf(pRows.toDF())
      .join(deadHosts.withColumnRenamed("h", "hostId"), Seq("hostId"), "left_semi")
      .select($"domainId".as("d")).distinct().localCheckpoint(true)
    val domBuckets = if (nDeadHosts == 0) Set.empty[Int] else bucketsOf(domCand, "d")
    val deadDoms =
      if (nDeadHosts == 0) domCand.limit(0)
      else {
        val liveDoms = TableIO.read(spark, edgesDir, Some(domBuckets))
          .filter(col("kind") === EK.IsParentHost)
          .join(domCand.withColumnRenamed("d", "src"), Seq("src"), "left_semi")
          .join(deadHosts.withColumnRenamed("h", "dst"), Seq("dst"), "left_anti")
          .select($"src".as("d")).distinct()
        domCand.join(liveDoms, Seq("d"), "left_anti").localCheckpoint(true)
      }
    val nDeadDoms = if (nDeadHosts == 0) 0L else deadDoms.count()

    // entity liveness via the refcount delta log: the batch's negative
    // deltas landed above, so an entity is dead iff its post-batch mention
    // count sums to ZERO. Reads only the candidates' buckets — this
    // replaced a corpus-wide LINKS_TO scan, the last corpus-linear step on
    // the takedown fast path.
    val entCand = flatR.filter($"rowKind" === "m" && $"entityId" >= 0)
      .select($"entityId".as("id"), $"entityNodeId".as("e")).distinct()
      .localCheckpoint(true)
    val liveIds = TableIO.read(spark, s"$outDir/entity_refcounts",
        Some(bucketsOf(entCand, "id")))
      .join(entCand.select("id"), Seq("id"), "left_semi")
      .groupBy("id").agg(sum($"n").as("n")).filter($"n" > 0)
      .select("id")
    val deadEnts = entCand.join(liveIds, Seq("id"), "left_anti")
      .select($"e").localCheckpoint(true)
    val nDeadEnts = deadEnts.count()

    // ---- edges: one combined rewrite over every touched bucket ----
    val srcIds = pageIds.unionByName(mentionIds).unionByName(tripleNodeIds)
      .distinct().localCheckpoint(true)
    val changedEntNodes =
      if (remappedN == 0) null
      else changed.select($"id").as[Long].map(Ids.entityNodeId).toDF("en")
        .localCheckpoint(true)
    val edgeBuckets = bucketsOf(srcIds, "id") ++ hostBuckets ++ domBuckets ++
      (if (changedEntNodes == null) Set.empty[Int] else bucketsOf(changedEntNodes, "en"))
    val eContent = TableIO.read(spark, edgesDir, Some(edgeBuckets))
    val edgesNeedWork = changedEntNodes != null ||
      eContent.join(srcIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .limit(1).count() > 0 ||
      eContent.filter(col("kind") === EK.IsPageOf)
        .join(pageIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .limit(1).count() > 0
    if (edgesNeedWork) {
      var keepE = eContent
        .join(srcIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(pageIds.select($"id".as("dst")).withColumn("kind", lit(EK.IsPageOf)),
          Seq("dst", "kind"), "left_anti")
        .join(deadHosts.select($"h".as("dst")).withColumn("kind", lit(EK.IsParentHost)),
          Seq("dst", "kind"), "left_anti")
      if (changedEntNodes != null) {
        keepE = keepE.join(
          changedEntNodes.select($"en".as("src")).withColumn("kind", lit(EK.SameAs)),
          Seq("src", "kind"), "left_anti")
        val freshSameAs = changed.filter($"newComp".isNotNull)
          .select($"id", $"newComp").as[(Long, Long)]
          .map { case (id, c) =>
            GraphEdge(Ids.entityNodeId(id), Ids.entityNodeId(c), EK.SameAs, null) }
          .toDF().select(col("src"), col("dst"), col("kind"), col("variable"), col("label"))
        keepE = keepE.unionByName(freshSameAs)
      }
      TableIO.rewriteBuckets(keepOrder(keepE, eContent.columns), edgesDir, col("src"),
        edgeBuckets, negCounters, numBuckets)
    }

    // ---- components: snapshot-swap BEFORE the nodes anchor drops ----
    if (remappedN > 0) {
      val priorC = TableIO.readManifest(compDir).get.counters
      val mergedC = (priorC.keySet ++ negCounters.keySet).map { k =>
        k -> (priorC.getOrElse(k, 0L) + negCounters.getOrElse(k, 0L)) }.toMap
      swapWrite(newC.toDF(), compDir, col("id"), mergedC, numBuckets)
    }

    // ---- nodes LAST: the presence anchor falls only when all else is done ----
    val delNodeIds = pageIds.unionByName(mentionIds).unionByName(tripleNodeIds)
      .unionByName(deadHosts.select($"h".as("id")))
      .unionByName(deadDoms.select($"d".as("id")))
      .unionByName(deadEnts.select($"e".as("id")))
      .distinct().localCheckpoint(true)
    val nodeBuckets = bucketsOf(delNodeIds, "id")
    val curN = TableIO.read(spark, nodesDir, Some(nodeBuckets))
    TableIO.rewriteBuckets(
      keepOrder(curN.join(delNodeIds, Seq("id"), "left_anti"), curN.columns),
      nodesDir, col("id"), nodeBuckets, negCounters, numBuckets)

    flatR0.unpersist(false); flatR.unpersist(false); oldC.unpersist(false)
    presentPages.unpersist(false); delNodeIds.unpersist(false)
    if (newC != null) newC.unpersist(false)
    RemoveStats(nPresent, deadPairsN, remappedN, nDeadHosts, nDeadDoms, nDeadEnts,
      (tripleBuckets1 ++ falloutBuckets).size, edgeBuckets.size, nodeBuckets.size,
      nAffected)
  }
}
