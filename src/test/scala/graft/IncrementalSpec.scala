package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.extract.{EntSlot, Lit, NumSlot, PatternAutomaton, PatternRule}
import graft.model.PageGen
import graft.store.TableIO

class IncrementalSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private val cfg = PageGen.Config(nPages = 60)
  // rule 7 ("age") re-predicated: the diff is {old 7, new 7}; its literals
  // ("is", "years", "old") hit only the pages carrying an age sentence
  private val newRules: Vector[PatternRule] = PatternAutomaton.DefaultRules.map {
    case r if r.ruleId == 7 =>
      PatternRule(7, "age_years", Vector(EntSlot, Lit("is"), NumSlot, Lit("years"), Lit("old")), 0, 1)
    case r => r
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The refcount DELTA LOG is aggregate-equivalent, not byte-equivalent:
    * compare the folded view (sum per entity, zeros dropped). */
  private def refAgg(dir: String): Seq[String] = sortedRows(
    TableIO.read(spark, s"$dir/entity_refcounts")
      .groupBy("id").agg(sum("n").as("n")).filter(col("n") =!= 0L))

  test("changedRules is the structural symmetric difference") {
    Incremental.changedRules(PatternAutomaton.DefaultRules, PatternAutomaton.DefaultRules) shouldBe empty
    val ch = Incremental.changedRules(PatternAutomaton.DefaultRules, newRules)
    ch.map(_.pred).sorted shouldBe Seq("age", "age_years")
  }

  test("rule diff recomputes only touched buckets, result == full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val pages = PageGen.pages(spark, cfg)

    // full build under the OLD rules
    val t0 = Pipeline.run(spark, pages, cfg.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    // incremental: apply the diff
    val touched = Incremental.applyRuleDiff(spark, pages,
      PatternAutomaton.DefaultRules, newRules, dir, cfg.nPersons)
    touched should not be empty
    touched.size should be < TableIO.NumBuckets // partial recompute, by construction

    // ground truth: a from-scratch rebuild under the NEW rules
    val t1 = Pipeline.run(spark, pages, cfg.nPersons, rules = newRules)
    val incr = TableIO.read(spark, s"$dir/triples")
    sortedRows(incr) shouldBe sortedRows(t1.triples)
    incr.filter(col("pred") === "age_years").count() should be > 0L
    incr.filter(col("pred") === "age").count() shouldBe 0L
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)

    // affected-page detection is the necessary-condition superset: every
    // page whose triples differ between the two rule sets is in a touched
    // bucket (here: every page with an age triple)
    val agePages = t1.triples.filter(col("pred") === "age_years")
      .select(pmod(xxhash64(col("url")), lit(TableIO.NumBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    agePages.subsetOf(touched) shouldBe true

    // the graph tables were delta-patched in lockstep: Triple nodes and
    // SUBJ/OBJ edges match a full rebuild's (no stale provenance subgraph)
    sortedRows(TableIO.read(spark, s"$dir/nodes")) shouldBe sortedRows(t1.nodes)
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe sortedRows(t1.edges)

    // a no-op diff touches nothing
    Incremental.applyRuleDiff(spark, pages, newRules, newRules, dir, cfg.nPersons) shouldBe empty
    TableIO.deleteRecursively(dir)
  }

  test("affected-page detection reads the EXTRACTED text (html-backed pages)") {
    import spark.implicits._
    val changed = Incremental.changedRules(PatternAutomaton.DefaultRules, newRules)
    val ts = new java.sql.Timestamp(0L)
    // the literals live ONLY in the html column; `text` is null
    val html = "<html><body><p>Alice Zorn is 41 years old.</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val pages = Seq(
      graft.model.Page("http://h/x", ts, html, null, "en"),
      graft.model.Page("http://h/y", ts, null, "nothing relevant here", "en")).toDS()
    val hit = Incremental.affectedPages(pages, changed).collect().map(_.url)
    hit shouldBe Array("http://h/x")
  }

  test("appendPages: corpus growth equals a full rebuild, including entity merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-append").toString
    val c = PageGen.Config(nPages = 90)
    def range(lo: Long, hi: Long) = spark.range(lo, hi).map(i => PageGen.page(c, i))

    // initial build over pages [0, 60)
    val t0 = Pipeline.run(spark, range(0, 60), c.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    // the monthly crawl batch: pages [60, 90) — with a slice re-fetched
    // INSIDE the batch window (duplicate urls must collapse to one row
    // deterministically, not wedge the guards)
    val stats = Incremental.appendPages(spark,
      range(60, 90).union(range(75, 90)), dir, c.nPersons)
    stats.pages should be > 0L
    stats.skippedTables shouldBe empty
    // the batch's same_as evidence merges previously-distinct components —
    // the retroactive-canonicalization path is actually exercised
    stats.remappedIds should be > 0L
    stats.tripleBucketsRewritten should be > 0

    // ground truth: a from-scratch rebuild over all 90 pages
    val t1 = Pipeline.run(spark, range(0, 90), c.nPersons)
    val wantTriples = sortedRows(t1.triples)
    val wantNodes = sortedRows(t1.nodes)
    val wantEdges = sortedRows(t1.edges)
    val wantComponents = sortedRows(t1.components.toDF())
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe wantTriples
    sortedRows(TableIO.read(spark, s"$dir/nodes")) shouldBe wantNodes
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe wantEdges
    sortedRows(TableIO.read(spark, s"$dir/components")) shouldBe wantComponents
    val wantRef = refAgg(dir) // folded counts after the append…

    // crash/retry convergence: re-sending the SAME batch is detected per
    // table (all-or-nothing key overlap) and skipped; nothing changes
    val again = Incremental.appendPages(spark, range(60, 90), dir, c.nPersons)
    again.skippedTables.toSet shouldBe Set("triples", "edges", "nodes", "sameas_evidence")
    again.remappedIds shouldBe 0L
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe wantTriples
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe wantEdges
    // …survive redelivery unchanged: the batch marker makes the refcount
    // delta append exactly-once (a double-add would inflate every count)
    refAgg(dir) shouldBe wantRef

    // a batch mixing new and already-ingested urls is a misuse, not an append
    // (and not a resume — that is an ALL-ingested batch, tested above)
    intercept[IllegalArgumentException] {
      Incremental.appendPages(spark, range(85, 95), dir, c.nPersons)
    }
    TableIO.deleteRecursively(dir)
  }

  test("removePages: takedown equals a full rebuild on the remaining corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rm").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-rm-want").toString
    val c = PageGen.Config(nPages = 90)
    def range(lo: Long, hi: Long) = spark.range(lo, hi).map(i => PageGen.page(c, i))

    val t0 = Pipeline.run(spark, range(0, 90), c.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    // take down pages [60, 90) — the appendPages spec proves this exact
    // slice carries same-as evidence that MERGED components, so its removal
    // must SPLIT them back: the hard (non-functional-remap) direction
    val stats = Incremental.removePages(spark, range(60, 90), range(0, 60), dir, c.nPersons)
    stats.pages should be > 0L
    stats.deadPairs should be > 0L     // the slice's evidence actually left
    stats.remappedIds should be > 0L   // and the mapping actually split
    stats.tripleBucketsRewritten should be > 0

    // ground truth: a from-scratch build over the remaining 60 pages —
    // every table, including the evidence sidecar, must match bit-exactly
    val t1 = Pipeline.run(spark, range(0, 60), c.nPersons)
    Pipeline.materialize(spark, t1, dir2)
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    Seq("triples", "nodes", "edges", "components", "sameas_evidence").foreach { tb =>
      withClue(tb) {
        sortedRows(TableIO.read(spark, s"$dir/$tb")) shouldBe
          sortedRows(TableIO.read(spark, s"$dir2/$tb"))
      }
    }
    refAgg(dir) shouldBe refAgg(dir2) // delta log folds to the rebuild's counts

    // idempotent retry: the presence anchor (page nodes) is gone, so a
    // redelivered takedown no-ops — no table changes, no double-subtracted
    // manifest counters
    val again = Incremental.removePages(spark, range(60, 90), range(0, 60), dir, c.nPersons)
    again.pages shouldBe 0L
    again.remappedIds shouldBe 0L
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe
      sortedRows(TableIO.read(spark, s"$dir2/triples"))

    // a takedown list of never-crawled urls is a clean no-op, not an error
    val unknown = Incremental.removePages(spark, range(200, 210), range(0, 60), dir, c.nPersons)
    unknown.pages shouldBe 0L

    TableIO.deleteRecursively(dir); TableIO.deleteRecursively(dir2)
  }

  test("removePages fast path: no dead evidence means no mapping churn") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rm-fast").toString
    val c = PageGen.Config(nPages = 90)
    def range(lo: Long, hi: Long) = spark.range(lo, hi).map(i => PageGen.page(c, i))
    val t0 = Pipeline.run(spark, range(0, 90), c.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)
    val before = sortedRows(TableIO.read(spark, s"$dir/components"))

    // a batch with no same-as evidence at all cannot touch the mapping:
    // pick pages that extracted zero same_as pairs (query the evidence
    // table's urls and remove pages OUTSIDE it)
    val evUrls = TableIO.read(spark, s"$dir/sameas_evidence")
      .select("url").distinct().collect().map(_.getString(0)).toSet
    val allPages = (0L until 90L).map(i => PageGen.page(c, i))
    val quiet = allPages.filter(p => p.lang == "en" && !evUrls.contains(p.url)).take(5)
    assume(quiet.nonEmpty) // PageGen at 90 pages always has evidence-free pages
    val quietIdx = quiet.map(p => allPages.indexWhere(_.url == p.url).toLong)
    val batch = spark.createDataset(quiet)
    val rest = spark.range(0, 90).filter(i => !quietIdx.contains(i))
      .map(i => PageGen.page(c, i))

    val stats = Incremental.removePages(spark, batch, rest, dir, c.nPersons)
    stats.pages shouldBe quiet.size.toLong
    stats.deadPairs shouldBe 0L
    stats.remappedIds shouldBe 0L
    stats.affectedUrls shouldBe 0L // no surviving page was re-derived
    sortedRows(TableIO.read(spark, s"$dir/components")) shouldBe before

    // equivalence with the rebuild on what remains
    val t1 = Pipeline.run(spark, rest, c.nPersons)
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe sortedRows(t1.triples)
    sortedRows(TableIO.read(spark, s"$dir/nodes")) shouldBe sortedRows(t1.nodes)
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe sortedRows(t1.edges)
    refAgg(dir) shouldBe sortedRows(Pipeline.entityRefDeltas(t1.flat))
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    TableIO.deleteRecursively(dir)
  }

  test("deferred merge rewrite (merge-on-read): readTriples is current, compaction folds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mor").toString
    val c = PageGen.Config(nPages = 90)
    def range(lo: Long, hi: Long) = spark.range(lo, hi).map(i => PageGen.page(c, i))
    val t0 = Pipeline.run(spark, range(0, 60), c.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    val stats = Incremental.appendPages(spark, range(60, 90), dir, c.nPersons,
      deferMergeRewrite = true)
    stats.remappedIds should be > 0L
    stats.tripleBucketsRewritten shouldBe 0 // no data file was touched
    stats.edgeBucketsRewritten shouldBe 0   // SAME_AS fallout deferred too

    val t1 = Pipeline.run(spark, range(0, 90), c.nPersons)
    val want = sortedRows(t1.triples)
    val wantE = sortedRows(t1.edges)
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    // the PHYSICAL rows still carry pre-merge canonical ids…
    sortedRows(TableIO.read(spark, s"$dir/triples")) should not equal want
    // …but the merge-on-read paths serve the current truth
    sortedRows(Incremental.readTriples(spark, dir)) shouldBe want
    sortedRows(Incremental.readEdges(spark, dir)) shouldBe wantE

    // maintenance folds the remap into the rows and drops the side table
    val (ft, fe) = Incremental.compactMergeRemap(spark, dir)
    ft should not be empty
    fe should not be empty
    TableIO.readManifest(s"$dir/canon_remap") shouldBe None
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe want
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe wantE
    sortedRows(Incremental.readTriples(spark, dir)) shouldBe want // a plain read now
    // idempotent: nothing left to fold
    Incremental.compactMergeRemap(spark, dir) shouldBe ((Set.empty, Set.empty))
    TableIO.deleteRecursively(dir)
  }

  test("deferred remaps across epochs compose; an eager append folds the pending chain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mor2").toString
    val c = PageGen.Config(nPages = 150)
    def range(lo: Long, hi: Long) = spark.range(lo, hi).map(i => PageGen.page(c, i))
    val t0 = Pipeline.run(spark, range(0, 60), c.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    // two deferred crawl epochs back to back: the second composes its remap
    // onto the pending chain (one read-time hop must reach the final root)
    Incremental.appendPages(spark, range(60, 90), dir, c.nPersons, deferMergeRewrite = true)
    Incremental.appendPages(spark, range(90, 120), dir, c.nPersons, deferMergeRewrite = true)
    val t1 = Pipeline.run(spark, range(0, 120), c.nPersons)
    val want120 = sortedRows(t1.triples)
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    sortedRows(Incremental.readTriples(spark, dir)) shouldBe want120

    // a plain EAGER append folds the pending chain before trusting bytes
    Incremental.appendPages(spark, range(120, 150), dir, c.nPersons)
    TableIO.readManifest(s"$dir/canon_remap") shouldBe None
    val t2 = Pipeline.run(spark, range(0, 150), c.nPersons)
    val want150 = sortedRows(t2.triples)
    val want150E = sortedRows(t2.edges)
    t2.flatEnc.unpersist(false); t2.components.unpersist(false)
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe want150
    sortedRows(TableIO.read(spark, s"$dir/edges")) shouldBe want150E
    TableIO.deleteRecursively(dir)
  }

  test("same_as rule diff falls back to a full rebuild (stale canonical map)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-sa").toString
    val pages = PageGen.pages(spark, cfg)
    val t0 = Pipeline.run(spark, pages, cfg.nPersons)
    Pipeline.materialize(spark, t0, dir)
    t0.flatEnc.unpersist(false); t0.components.unpersist(false)

    // drop the same_as rule entirely: no links -> no canonicalization
    val noSameAs = PatternAutomaton.DefaultRules.filterNot(_.pred == "same_as")
    val touched = Incremental.applyRuleDiff(spark, pages,
      PatternAutomaton.DefaultRules, noSameAs, dir, cfg.nPersons)
    touched.size shouldBe TableIO.NumBuckets // full invalidation, detected

    val t1 = Pipeline.run(spark, pages, cfg.nPersons, rules = noSameAs)
    sortedRows(TableIO.read(spark, s"$dir/triples")) shouldBe sortedRows(t1.triples)
    sortedRows(TableIO.read(spark, s"$dir/components")) shouldBe sortedRows(t1.components.toDF())
    // the evidence sidecar was refreshed in lockstep (no same_as rule ->
    // empty), so a later removePages cannot recompute a stale mapping
    sortedRows(TableIO.read(spark, s"$dir/sameas_evidence")) shouldBe
      sortedRows(Pipeline.sameAsEvidence(t1.flat))
    t1.flatEnc.unpersist(false); t1.components.unpersist(false)
    TableIO.deleteRecursively(dir)
  }
}
