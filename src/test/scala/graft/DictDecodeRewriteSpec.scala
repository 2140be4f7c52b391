package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._

import graft.functions.{DictDecode, GraftOptimizations}

/** DictDecodeFilterRewrite: filter predicates over dictionary-decoded
  * columns must fold back onto the int codes — same rows out (incl. the
  * null/-1 discipline), no dict_decode left in the optimized Filter
  * condition, and the folded predicate must reach the in-memory scan in
  * stat-prunable form. */
class DictDecodeRewriteSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dict = spark.sparkContext.broadcast(Array("p", "m", "e", "t"))

  /** codes incl. -1 (encoder null) and an out-of-range 9 (decodes null).
    * RDD-backed on purpose: a LocalRelation would be folded away eagerly
    * (ConvertToLocalRelation) before the rewrite could be observed. */
  private def frame(): DataFrame = {
    GraftOptimizations.install(spark)
    spark.createDataFrame(spark.sparkContext.parallelize(
        Seq((0, 10L), (1, 11L), (2, 12L), (3, 13L), (-1, 14L), (9, 15L), (1, 16L)), 2))
      .toDF("code", "v")
      .withColumn("kind", DictDecode.decode(col("code"), dict))
  }

  private def filterConds(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case f: LFilter => f.condition }

  private def assertNoDecodeInFilters(df: DataFrame): Unit = {
    val conds = filterConds(df)
    conds should not be empty
    conds.foreach(c => assert(c.find(_.isInstanceOf[DictDecode]).isEmpty,
      s"dict_decode survived in filter: $c"))
  }

  test("=== folds to a code comparison with identical rows") {
    val df = frame().filter($"kind" === "m").select("v")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(11L, 16L)
    assertNoDecodeInFilters(df)
  }

  test("=== an absent string folds to false (zero rows, not an error)") {
    val df = frame().filter($"kind" === "zz")
    df.count() shouldBe 0L
  }

  test("=!= keeps only DECODABLE non-matching rows (null drops, like the view)") {
    // unrewritten semantics: decode(-1)/decode(9) = null, null =!= 'm' = null → dropped
    val df = frame().filter($"kind" =!= "m").select("v")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 12L, 13L)
    assertNoDecodeInFilters(df)
  }

  test("isin folds to an int IN over the codes present in the vocabulary") {
    val df = frame().filter($"kind".isin("p", "t", "zz")).select("v")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 13L)
    assertNoDecodeInFilters(df)
  }

  test("isNull / isNotNull fold to vocabulary-bounds tests") {
    frame().filter($"kind".isNull).select("v")
      .collect().map(_.getLong(0)).sorted shouldBe Array(14L, 15L)
    val nn = frame().filter($"kind".isNotNull).select("v")
    nn.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 11L, 12L, 13L, 16L)
    assertNoDecodeInFilters(nn)
  }

  test("non-conjunct sites are left alone (null semantics differ under OR/NOT)") {
    // !(kind === 'm') under an OR is NOT a top-level conjunct equality:
    // null (code -1/9) must DROP the row. The rule leaves the decode alone.
    val df = frame().filter(!($"kind" === "m") || $"v" === 999L).select("v")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 12L, 13L)
    val conds = filterConds(df)
    conds should not be empty
    assert(conds.exists(_.find(_.isInstanceOf[DictDecode]).nonEmpty),
      s"the OR-guarded decode should have survived: $conds")
  }

  test("decode stays intact in projections (only filters are rewritten)") {
    val df = frame().select("kind")
    df.collect().map(_.getString(0)) shouldBe Array("p", "m", "e", "t", null, null, "m")
  }

  // ---- FilterImpliedConstantFold: the projection-side companion ----

  test("filter-implied equality folds the projection's kind cascades away") {
    import org.apache.spark.sql.catalyst.expressions.CaseWhen
    GraftOptimizations.install(spark)
    val base = spark.createDataFrame(spark.sparkContext.parallelize(
        Seq((1, 10L, 7L), (2, 11L, 8L), (1, 12L, 9L)), 2))
      .toDF("k", "x", "y")
    val view = base.select(col("k"),
      when(col("k") === 1, col("x")).otherwise(lit(-1L)).as("mx"),
      when(col("k") === 2 || col("k") === 3, col("y")).otherwise(lit(0L)).as("ey"))
    // k = 1 decides both cascades: mx → x verbatim, ey → 0
    val df = view.filter(col("k") === 1).select("mx", "ey")
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe
      Array((10L, 0L), (12L, 0L))
    val cascades = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case c: CaseWhen => c })
    cascades shouldBe empty
    // and an equality the fact REFUTES folds to false, never null
    val neg = view.filter(col("k") === 2)
      .select((col("k") === 1).as("isOne"))
    neg.collect().map(_.getBoolean(0)) shouldBe Array(false)
  }

  test("without a deciding filter the cascades stay (no fold, no corruption)") {
    import org.apache.spark.sql.catalyst.expressions.CaseWhen
    GraftOptimizations.install(spark)
    val base = spark.createDataFrame(spark.sparkContext.parallelize(
        Seq((1, 10L), (2, 11L)), 2)).toDF("k", "x")
    val df = base.select(when(col("k") === 1, col("x")).otherwise(lit(-1L)).as("mx"))
    df.collect().map(_.getLong(0)).sorted shouldBe Array(-1L, 10L)
    val cascades = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case c: CaseWhen => c })
    cascades should not be empty
  }

  test("a kind-restricted decode-view projection optimizes to bare column " +
       "refs over the cache (no conditionals survive)") {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, If => CIf}
    val t = Queries.kg(spark, "/tmp/graft-ddr-spec-sf0.001")
    // the canonicalize projection: t-row filter decides subj/obj/conf/objValue
    val df = t.flat.filter(col("rowKind") === "t" && col("pred") =!= "same_as")
      .select("subj", "pred", "obj", "objValue", "url", "conf")
    val conds = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case c: CaseWhen => c
      case i: CIf => i
    })
    assert(conds.isEmpty, s"kind conditionals survived the fold: $conds")
  }

  test("a kind filter over the pipeline's sorted cache reaches the in-memory " +
       "scan as a plain byte predicate") {
    val t = Queries.kg(spark, "/tmp/graft-ddr-spec-sf0.001")
    val df = t.flat.filter(col("rowKind") === "t").toDF()
    assertNoDecodeInFilters(df)
    // the folded predicate must sit ON the cache scan (the stat-prunable
    // position), not above the decode projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
    assert("InMemoryTableScan[^\\n]*\\(rowKind#\\d+ = 3\\)".r
      .findFirstIn(plan).nonEmpty, plan.take(2000))
  }
}
