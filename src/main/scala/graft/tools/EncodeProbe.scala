package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.PageGen
import graft.store.TableIO

/** Dev probe: split the big-table write cost into (compute+shuffle) vs
  * parquet encode — same repartition as writeBucketed, sink swapped between
  * `noop` and parquet. Interleaved reps so host bursts hit both variants. */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toInt else 40000
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pagesDir = "/dev/shm/graft-encodeprobe-pages"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pagesDir)))
      PageGen.pages(spark, PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80))
        .write.mode("overwrite").parquet(pagesDir)
    val t = graft.Pipeline.run(spark, spark.read.parquet(pagesDir).as[graft.model.Page], 500)
    t.flat.count(); t.components.count()

    // the SAME bijective bucket→task remap as writeBucketed (a plain
    // repartition(32, bucket) murmur-hashes the bucket id and skews the
    // writers — that would inflate the encode split with a straggler tail)
    val keys = TableIO.partKeys(32)
    def shaped(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column) =
      df.withColumn("bucket", pmod(xxhash64(key), lit(32)).cast("int"))
        .repartition(32, element_at(typedLit(keys.toSeq), col("bucket") + 1))
    val out = "/dev/shm/graft-encodeprobe-out"
    (1 to reps).foreach { rep =>
      Seq(("edges", t.edges, col("src")), ("nodes", t.nodes, col("id"))).foreach {
        case (name, df, key) =>
          val s = shaped(df, key)
          var t0 = System.nanoTime()
          s.write.format("noop").mode("overwrite").save()
          val noopSec = (System.nanoTime() - t0) / 1e9
          TableIO.deleteRecursively(out)
          t0 = System.nanoTime()
          s.write.mode("overwrite").partitionBy("bucket").parquet(out)
          val pqSec = (System.nanoTime() - t0) / 1e9
          println(f"ENCODE rep=$rep table=$name%-6s noop=$noopSec%6.2f s  parquet=$pqSec%6.2f s  encode=${pqSec - noopSec}%6.2f s")
          TableIO.deleteRecursively(out)
      }
    }
    TableIO.deleteRecursively(pagesDir)
    spark.stop()
  }
}
