package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.extract._
import graft.model._

/** The dictionary-encoded flat cache (FlatRowEnc + decodeFlat) must be a
  * BIT-EXACT round trip of the historical string frame: every downstream
  * consumer — the driver's 99 oracled entries included — reads through the
  * decode view, so any divergence here is a silent corpus-wide corruption. */
class EncodedFlatSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = {
    val cfg = PageGen.Config(nPages = n)
    PageGen.pages(spark, cfg).filter($"lang" === "en")
  }

  test("decodeFlat(extractFlatEnc) == extractFlat, row for row, null for null") {
    val pages = corpus(400)
    val g = Pipeline.defaultGazetteer(500)
    val a = PatternAutomaton.compile(PatternAutomaton.DefaultRules)
    val gaz = spark.sparkContext.broadcast(g)
    val auto = spark.sparkContext.broadcast(a)
    val m1 = new ExtractMetrics(spark)
    val m2 = new ExtractMetrics(spark)

    val want = TripleExtractor.extractFlat(pages, gaz, auto, m1)
      .collect().sortBy(r => (r.pageId, r.rowKind, r.mentionId, r.subj, r.obj, String.valueOf(r.pred)))
    val enc = TripleExtractor.extractFlatEnc(pages, gaz, auto, m2)
    val got = TripleExtractor.decodeFlat(enc,
        spark.sparkContext.broadcast(a.preds),
        spark.sparkContext.broadcast(g.aliasArr),
        spark.sparkContext.broadcast(FlatDict.RowKinds),
        spark.sparkContext.broadcast(FlatDict.Labels))
      .collect().sortBy(r => (r.pageId, r.rowKind, r.mentionId, r.subj, r.obj, String.valueOf(r.pred)))

    got.length shouldBe want.length
    got.zip(want).foreach { case (g0, w0) => g0 shouldBe w0 }
    m2.dictMisses.value shouldBe 0L
    // the kind-determined overlay defaults (conf; p-dim fields on non-"p"
    // rows) never deviated — the encode was lossless for this corpus
    m2.overlayLost.value shouldBe 0L
  }

  test("the persisted pipeline cache is the ENCODED shape (ints, not strings)") {
    val t = Pipeline.run(spark, PageGen.pages(spark, PageGen.Config(nPages = 120)), 200)
    try {
      // the persisted frame carries int codes for the four vocab columns
      val encSchema = t.flatEnc.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      encSchema("rowKind") shouldBe "tinyint"
      encSchema("pred") shouldBe "int"
      encSchema("norm") shouldBe "int"
      encSchema("label") shouldBe "tinyint"
      // the overlaid/derived columns store NO physical bytes in the cache:
      // host/hostId/nSentences ride the p-row slots of strA/idA/mentionIdx,
      // conf is rowKind-determined and re-derived at decode
      Seq("host", "hostId", "nSentences", "conf", "mentionId", "surface",
        "tripleNodeId", "objValue").foreach(c => encSchema should not contain key(c))
      encSchema.size shouldBe 15
      // the view restores the historical schema exactly
      val viewSchema = t.flat.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      viewSchema("rowKind") shouldBe "string"
      viewSchema("pred") shouldBe "string"
      viewSchema("norm") shouldBe "string"
      viewSchema("label") shouldBe "string"
      // decoded values are the historical vocabularies
      val kinds = t.flat.select("rowKind").distinct().as[String].collect().sorted
      kinds shouldBe Array("e", "m", "p", "t")
      val labels = t.flat.filter($"label".isNotNull).select("label")
        .distinct().as[String].collect().sorted
      labels shouldBe Array("False", "True", "except")
      t.flat.filter($"rowKind" === "t" && $"pred".isNull).count() shouldBe 0L
      // and the view is what the graph tables were built from: a mention's
      // norm decodes to a gazetteer alias verbatim
      val norms = t.flat.filter($"rowKind" === "m").select("norm").distinct()
        .as[String].collect()
      val aliasSet = Pipeline.defaultGazetteer(200).candidates.keySet
      norms.foreach(n => aliasSet should contain(n))
    } finally {
      t.flatEnc.unpersist(false); t.components.unpersist(false)
    }
  }

  test("DictDecode: interpreted and codegen agree; out-of-range → null") {
    import graft.functions.DictDecode
    val dict = spark.sparkContext.broadcast(Array("a", "b", "c"))
    val df = Seq(-1, 0, 1, 2, 3, 99).toDF("c").withColumn("c", $"c".cast("int"))
    val got = df.select(DictDecode.decode($"c", dict).as("s")).as[String].collect()
    got shouldBe Array(null, "a", "b", "c", null, null)
    // byte-typed child too (the rowKind/label shape)
    val dfb = Seq(-1, 0, 2).toDF("c").withColumn("c", $"c".cast("byte"))
    dfb.select(DictDecode.decode($"c", dict).as("s")).as[String].collect() shouldBe
      Array(null, "a", "c")
  }
}
