package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions._
import graft.ops.Similarity

class FunctionsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def vecs() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native vec_dot/vec_norm/vec_cosine match the interpreted HOF forms") {
    val df = vecs()
      .withColumn("dn", vec_dot(col("a"), col("b")))
      .withColumn("dh", Similarity.dotHof(col("a"), col("b")))
      .withColumn("cn", vec_cosine(col("a"), col("b")))
      .withColumn("ch", Similarity.dotHof(col("a"), col("b")) /
        (sqrt(Similarity.dotHof(col("a"), col("a"))) * sqrt(Similarity.dotHof(col("b"), col("b")))))
      .withColumn("nn", vec_norm(col("a")))
      .withColumn("nh", sqrt(Similarity.dotHof(col("a"), col("a"))))
    df.collect().foreach { r =>
      r.getDouble(3) shouldBe r.getDouble(4) +- 1e-9
      r.getDouble(5) shouldBe r.getDouble(6) +- 1e-9
      r.getDouble(7) shouldBe r.getDouble(8) +- 1e-9
    }
  }

  test("null elements and length mismatch are handled") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](2.0f, 5.0f, 4.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f))
    ).toDF("a", "b")
      .select(vec_dot(col("a").cast("array<float>"), col("b").cast("array<float>")).as("d"))
    val rows = df.collect().map(_.getDouble(0))
    rows(0) shouldBe 14.0 // null position skipped: 1*2 + 3*4
    rows(1) shouldBe 3.0  // min-length traversal
    // whole-column null → null out
    val n = vecs().select(vec_dot(lit(null).cast("array<float>"), col("b")).as("d"))
      .collect()
    n.forall(_.isNullAt(0)) shouldBe true
  }

  test("SQL registration: vec_cosine callable from spark.sql") {
    register(spark)
    vecs().createOrReplaceTempView("fx_vecs")
    val r = spark.sql(
      "SELECT id, vec_cosine(a, b) AS c, vec_dot(a, b) AS d, vec_norm(a) AS n FROM fx_vecs")
      .collect()
    r.length shouldBe 200
    all(r.map(_.getDouble(1))) should (be >= -1.0 and be <= 1.0)
  }

  test("expression participates in WholeStageCodegen (no interpreted HOF)") {
    // materialized parquet source: a LocalRelation is folded eagerly, and
    // building vectors with transform() (an interpreted HOF) would itself
    // break the codegen span we're asserting on
    val dir = java.nio.file.Files.createTempDirectory("fx_codegen").toString
    vecs().write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val df = src.select(vec_cosine(col("a"), col("b")).as("c")).filter(col("c") > -2)
    // `*(n)` prefixes mark operators fused into WholeStageCodegen stage n
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(1) Project [vec_cosine")
    plan should include("*(1) Filter (vec_cosine")
    // and the codegen path actually compiles (would fall back silently otherwise):
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    codegen should include("Found 1 WholeStageCodegen subtrees")
    codegen should include("java.lang.Math.sqrt") // our generated loop, compiled
  }
}
