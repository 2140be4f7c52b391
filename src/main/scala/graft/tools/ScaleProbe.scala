package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel
import graft.model.PageGen

/** Dev probe: bucketed-write wall at a core count for a given codec. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val codec = if (args.length > 1) args(1) else "snappy"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/dev/shm/graft-scaleprobe"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
      val cfg = PageGen.Config(nPages = 40000, sentMin = 40, sentMax = 80)
      PageGen.pages(spark, cfg).write.mode("overwrite").parquet(dir)
    }
    val gaz = spark.sparkContext.broadcast(graft.Pipeline.defaultGazetteer(500))
    val auto = spark.sparkContext.broadcast(
      graft.extract.PatternAutomaton.compile(graft.extract.PatternAutomaton.DefaultRules))
    val metrics = new graft.extract.ExtractMetrics(spark)
    val pages = spark.read.parquet(dir).as[graft.model.Page].filter($"lang" === "en")
    val flat = graft.extract.TripleExtractor.extractFlat(pages, gaz, auto, metrics)
      .persist(StorageLevel.MEMORY_AND_DISK)
    flat.count()
    val t = graft.Pipeline.graphTables(spark, flat,
      spark.emptyDataset[(Long, Long)].toDF("id", "component"))
    (1 to 2).foreach { rep =>
      val out = "/dev/shm/graft-scaleprobe-out"
      graft.store.TableIO.deleteRecursively(out)
      val t0 = System.nanoTime()
      graft.store.TableIO.writeBucketed(t._2, s"$out/edges", col("src"))
      println(f"SCALE cores=$cores codec=$codec rep=$rep edgesWrite=${(System.nanoTime()-t0)/1e9}%.2f")
      graft.store.TableIO.deleteRecursively(out)
    }
    spark.stop()
  }
}
