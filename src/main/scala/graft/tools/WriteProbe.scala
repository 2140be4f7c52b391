package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Pipeline
import graft.model.PageGen
import graft.store.TableIO

/** Dev probe: per-table bucketed-write wall time (sequential, repeated) for
  * the pipeline's four output tables, plus codec sensitivity. Not a driver
  * surface — localizes which write dominates the bench's writes phase.
  *
  * Usage: runMain graft.tools.WriteProbe [cores] [pages] [reps] [codec...]
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toInt else 40000
    val reps = if (args.length > 2) args(2).toInt else 3
    val codecs = if (args.length > 3) args.drop(3).toSeq else Seq("snappy")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // always regenerate: a stale dir from a previous run with a DIFFERENT
    // page count would silently be measured as this run's corpus
    val pagesDir = "/dev/shm/graft-writeprobe-pages"
    TableIO.deleteRecursively(pagesDir)
    PageGen.pages(spark, PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80))
      .write.mode("overwrite").parquet(pagesDir)

    val t = Pipeline.run(spark, spark.read.parquet(pagesDir).as[graft.model.Page], 500)
    t.flat.count()
    t.components.count()
    // pre-materialize the triples plan once (cache the canon-joined result?
    // no — keep it lazy like the bench; we time the full compute+write)
    val tables: Seq[(String, DataFrame, org.apache.spark.sql.Column)] = Seq(
      ("triples", t.triples, col("url")),
      ("nodes", t.nodes, col("id")),
      ("edges", t.edges, col("src")),
      ("components", t.components, col("id")))
    val out = "/dev/shm/graft-writeprobe-out"
    (1 to reps).foreach { rep =>
      codecs.foreach { codec =>
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        tables.foreach { case (name, df, key) =>
          TableIO.deleteRecursively(s"$out/$name")
          val t0 = System.nanoTime()
          TableIO.writeBucketed(df, s"$out/$name", key)
          val sec = (System.nanoTime() - t0) / 1e9
          val bytes = {
            import scala.jdk.CollectionConverters._
            val p = java.nio.file.Paths.get(s"$out/$name")
            if (!java.nio.file.Files.exists(p)) 0L
            else java.nio.file.Files.walk(p).iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size).sum
          }
          println(f"WRITEPROBE rep=$rep codec=$codec%-6s table=$name%-10s $sec%6.2f s  ${bytes / 1e6}%8.1f MB")
          TableIO.deleteRecursively(s"$out/$name")
        }
      }
    }
    TableIO.deleteRecursively(pagesDir)
    spark.stop()
  }
}
