package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing of registered queries:
  * `runMain graft.tools.TimeQuery <sfDir> <reps> <name> [name...]`.
  * Prints per-rep wall seconds; first rep includes JIT/plan warmup.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt; val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = all(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        (n, s)
      }
      println(f"[time] $name rows=${times.head._1} " +
        times.map(t => f"${t._2}%.2f").mkString("secs=[", ",", "]"))
    }
    spark.stop()
  }
}
