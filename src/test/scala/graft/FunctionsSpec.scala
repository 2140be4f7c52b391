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

  test("vec_agree matches the zip_with HOF form on random long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map { i =>
      // ~half the slots agree
      val a = Array.fill(32)(rnd.nextLong() % 4)
      val b = a.map(v => if (rnd.nextBoolean()) v else v + 1)
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
      .withColumn("n", vec_agree(col("a"), col("b")))
      .withColumn("h", expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))"))
    df.collect().foreach(r => r.getInt(3) shouldBe r.getInt(4))
    // length mismatch: min-length traversal, same as the padded-null HOF
    val mm = Seq((Array(1L, 2L, 3L), Array(1L, 9L))).toDF("a", "b")
      .select(vec_agree(col("a"), col("b"))).head().getInt(0)
    mm shouldBe 1
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

  test("TopKAgg equals sort-based top-k on random data, any partitioning") {
    import spark.implicits._
    import graft.functions.TopKAgg
    val rnd = new scala.util.Random(13)
    // scores with deliberate ties to exercise the (score desc, id asc) break
    val rows = (0 until 3000).map { i =>
      (i % 7L, math.floor(rnd.nextDouble() * 20) / 20.0, i.toLong)
    }
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy(t => (-t._1, t._2)).take(5)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => TopKAgg.Scored(t._2, t._3))
        .agg(TopKAgg.topK(5))
        .collect()
        .map { case (g, hits) => g -> hits.map(h => (h.score, h.id)).toSeq }
        .toMap
      withClue(s"parts=$parts: ") { got shouldBe expect }
    }
    // k larger than the group: whole group, best first
    val tiny = Seq((1L, 0.5, 10L), (1L, 0.9, 11L)).toDF("g", "score", "id")
      .as[(Long, Double, Long)].groupByKey(_._1)
      .mapValues(t => TopKAgg.Scored(t._2, t._3)).agg(TopKAgg.topK(99)).collect()
    tiny.head._2.map(_.id) shouldBe Seq(11L, 10L)
  }

  test("expression participates in WholeStageCodegen (no interpreted HOF)") {
    // materialized parquet source: a LocalRelation is folded eagerly, and
    // building vectors with transform() (an interpreted HOF) would itself
    // break the codegen span we're asserting on
    val dir = java.nio.file.Files.createTempDirectory("fx_codegen").toString
    val sdir = java.nio.file.Files.createTempDirectory("fx_codegen_sig").toString
    try {
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
      // the signature-agreement kernel fuses the same way
      import spark.implicits._
      (0 until 50).map(i => (i.toLong, Array.fill(32)(i.toLong), Array.fill(32)(1L)))
        .toDF("id", "a", "b").write.mode("overwrite").parquet(sdir)
      val sdf = spark.read.parquet(sdir)
        .select(vec_agree(col("a"), col("b")).as("n")).filter(col("n") >= 0)
      val splan = sdf.queryExecution.executedPlan.toString
      splan should include("*(1) Project [vec_agree")
      val scg = org.apache.spark.sql.execution.debug.codegenString(sdf.queryExecution.executedPlan)
      scg should include("Found 1 WholeStageCodegen subtrees")
    } finally {
      graft.store.TableIO.deleteRecursively(dir)
      graft.store.TableIO.deleteRecursively(sdir)
    }
  }
}
