package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.CorpusOps

class CorpusOpsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tok(prefix: String, n: Int): Seq[String] = (1 to n).map(p => s"$prefix$p")
  private val shared = tok("S", 12)

  test("duplicatedSpans: one maximal span per doc over a shared 12-token run (k=8)") {
    val corpus = docs(
      1L -> (tok("u", 5) ++ shared ++ tok("x", 5)).mkString(" "),
      2L -> (tok("v", 3) ++ shared ++ tok("y", 5)).mkString(" "))
    val r = CorpusOps.duplicatedSpans(corpus, k = 8, minDocs = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // doc 1: shared run occupies tokens [5,17); grams fully inside start at
    // 5..9 and chain into ONE span [5, 9+8) = [5, 17)
    r shouldBe Set((1L, 5L, 17L), (2L, 3L, 15L))
  }

  test("duplicatedSpans: a gram repeated WITHIN one doc is not cross-doc duplication") {
    val rep = tok("T", 8)
    val corpus = docs(
      1L -> (rep ++ Seq("w1") ++ rep).mkString(" "), // same 8-gram twice, one doc
      2L -> tok("z", 20).mkString(" "))
    CorpusOps.duplicatedSpans(corpus, k = 8, minDocs = 2).count() shouldBe 0L
  }

  test("duplicatedSpans: runs separated by more than k unique tokens split into two spans") {
    val a = tok("A", 8); val b = tok("B", 8)
    val corpus = docs(
      1L -> (a ++ tok("p", 9) ++ b).mkString(" "),
      2L -> (a ++ tok("q", 9) ++ b).mkString(" "))
    val r = CorpusOps.duplicatedSpans(corpus, k = 8, minDocs = 2)
      .filter(col("doc_id") === 1L)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    r shouldBe Set((0L, 8L), (17L, 25L))
  }

  test("contamination: only train docs sharing a k-gram with the bench set are flagged") {
    val g = tok("G", 8)
    val train = docs(
      10L -> (tok("a", 4) ++ g ++ tok("b", 4)).mkString(" "),
      11L -> tok("c", 20).mkString(" "))
    val bench = docs(99L -> (tok("e", 2) ++ g).mkString(" "))
    val r = CorpusOps.contamination(train, bench, k = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    r shouldBe Map(10L -> 1L)
  }

  test("shardPack matches a local cumulative sum and is chunk-size invariant") {
    val corpus = docs((0L until 37L).map(i =>
      i -> tok("w", (i % 7 + 1).toInt).mkString(" ")): _*)
    def run(chunk: Long) = CorpusOps.shardPack(corpus, budget = 10L, chunk = chunk)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    val r = run(5L)
    // local reference: running start offset // budget in doc_id order
    var acc = 0L
    val expected = (0L until 37L).map { i =>
      val n = i % 7 + 1
      val s = (i, n, acc / 10L); acc += n; s
    }
    r.toSeq shouldBe expected
    run(1000L).toSeq shouldBe expected // one chunk ≡ many chunks
    // the auto-derived width (default chunk = 0) — the bounded-driver path —
    // is output-invariant too, and bounds the width by the id span
    CorpusOps.shardPack(corpus, budget = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq shouldBe expected
    CorpusOps.autoChunk(corpus) shouldBe 1L // span 36 « MaxChunks
  }

  test("packSequences: shard streams cut into seqLen rows, short tail kept") {
    // 3 docs x 5 tokens, budget 10 -> shard 0 = docs 0,1 (10 toks),
    // shard 1 = doc 2 (5 toks); seqLen 4 -> shard 0: [4,4,2], shard 1: [4,1]
    val corpus = docs(
      0L -> "a0 a1 a2 a3 a4", 1L -> "b0 b1 b2 b3 b4", 2L -> "c0 c1 c2 c3 c4")
    val r = CorpusOps.packSequences(corpus, budget = 10L, seqLen = 4, chunk = 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .sortBy(t => (t._1, t._2))
    r.map(t => (t._1, t._2, t._3)).toSeq shouldBe Seq(
      (0L, 0L, 4L), (0L, 1L, 4L), (0L, 2L, 2L), (1L, 0L, 4L), (1L, 1L, 1L))
    // the packed stream is doc-ordered: shard 0 seq 0 = first 4 tokens of doc 0
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    r(0)._4 shouldBe m("a0 a1 a2 a3")
    r(2)._4 shouldBe m("b3 b4")
    r(4)._4 shouldBe m("c4")
  }

  test("repetitionMetrics: exact bigram stats") {
    val r = CorpusOps.repetitionMetrics(docs(1L -> "a b a b c"))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    // bigrams: "a b" x2, "b a" x1, "b c" x1
    r.toSeq shouldBe Seq((4L, 2L, 2L))
  }

  test("dup clustering: near-dup pairs close into min-id clusters (the d17 composition)") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "the quick brown fox jumps over the lazy dog near the river bend",
      3L -> "completely different content about spark query engines and shuffles",
      4L -> "the quick brown fox jumps over the lazy dog near the river bank")
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashLSH(corpus, shingleN = 3, threshold = 0.5)
      .select("a", "b")
    val cc = graft.canon.ConnectedComponents.auto(spark, pairs)
    val m = corpus.select("doc_id")
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    m(1L) shouldBe 1L; m(2L) shouldBe 1L; m(4L) shouldBe 1L // one cluster, min id
    m(3L) shouldBe 3L // untouched singleton keeps its own id
  }

  test("stratifiedSample: full quota keeps everything, zero default drops the rest; monotone") {
    import spark.implicits._
    val corpus = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr", "s")).toDF("doc_id", "lang", "source")
    val all = CorpusOps.stratifiedSample(corpus, Map("en" -> 10000), defaultBp = 0)
      .collect().map(_.getLong(0)).toSet
    all shouldBe (0L until 200L).filter(_ % 2 == 0).toSet
    val half = CorpusOps.stratifiedSample(corpus, Map("en" -> 5000), defaultBp = 0)
      .collect().map(_.getLong(0)).toSet
    val quarter = CorpusOps.stratifiedSample(corpus, Map("en" -> 2500), defaultBp = 0)
      .collect().map(_.getLong(0)).toSet
    quarter.subsetOf(half) shouldBe true // selector is monotone in the quota
    half.subsetOf(all) shouldBe true
    // deterministic: same call, same rows
    CorpusOps.stratifiedSample(corpus, Map("en" -> 5000), defaultBp = 0)
      .collect().map(_.getLong(0)).toSet shouldBe half
  }

  test("leakageSafeSplit: split is a pure function of the group; all splits non-degenerate") {
    import spark.implicits._
    // 400 docs over 40 sources — enough groups that train/val/test all hit
    val corpus = (0L until 400L).map(i =>
      (i, "en", s"src${i % 40}")).toDF("doc_id", "lang", "source")
    val rows = CorpusOps.leakageSafeSplit(corpus).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    rows.length shouldBe 400
    // LEAKAGE property: every group maps to exactly one split
    rows.groupBy(_._2).foreach { case (_, g) =>
      g.map(_._3).toSet.size shouldBe 1
    }
    val bySplit = rows.groupBy(_._3).map { case (k, v) => k -> v.size }
    bySplit.keySet shouldBe Set("train", "val", "test")
    bySplit("train") should be > bySplit("test") // 80/10/10 shape
    // deterministic + monotone thresholds: train ⊆ train∪val under a wider val
    val wider = CorpusOps.leakageSafeSplit(corpus, trainBp = 8000, valBp = 2000)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    rows.filter(_._3 == "train").foreach { case (id, _, _) =>
      wider(id) shouldBe "train"
    }
    rows.filter(_._3 == "val").foreach { case (id, _, _) =>
      wider(id) shouldBe "val"
    }
  }
}
