package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ExtensionsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  test("GraftExtensions injects vec_* functions into a session registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    org.apache.spark.sql.graft.Bridge.applyFunctionInjections(ext, spark)
    import spark.implicits._
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("ext_vecs")
    val row = spark.sql(
      "SELECT vec_dot(a, b) d, vec_norm(a) n, vec_cosine(a, a) c FROM ext_vecs").head()
    row.getDouble(0) shouldBe 11.0
    row.getDouble(1) shouldBe math.sqrt(5.0) +- 1e-12
    row.getDouble(2) shouldBe 1.0 +- 1e-12
    // DESCRIBE FUNCTION works (ExpressionInfo wired)
    val desc = spark.sql("DESCRIBE FUNCTION vec_cosine").collect().map(_.getString(0)).mkString("\n")
    desc should include("cosine similarity")
  }
}
