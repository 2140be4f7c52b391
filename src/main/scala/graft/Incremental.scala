package graft

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{Lit, PatternRule}
import graft.model.Page
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
    }
    patchGraphTables(spark, t, outDir, sameAsChanged, touched.size.toLong, numBuckets)
    t.flat.unpersist(false)
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
}
