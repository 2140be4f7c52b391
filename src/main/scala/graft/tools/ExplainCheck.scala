package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    println("===== q1_agg plan =====")
    graft.Queries.all("q1_agg")(spark, d).explain("formatted")
    println("===== filter pushdown check =====")
    spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_shipdate") < "1995-01-01").select("l_orderkey", "l_quantity")
      .explain("formatted")
    println("===== kg triples plan =====")
    val cfg = graft.model.PageGen.Config(nPages = 100)
    val t = graft.Pipeline.run(spark, graft.model.PageGen.pages(spark, cfg), cfg.nPersons)
    t.triples.explain("formatted")
    spark.stop()
  }
}
