package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.PageGen
import graft.store.TableIO

/** Dev probe: A/B the full benched pipeline with shuffle/spill files on
  * /tmp (disk) vs /dev/shm (tmpfs), interleaved reps. Not a driver surface. */
object LocalDirProbe {
  private def newSession(cores: Int, localDir: Option[String],
                         shuffleCompress: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-localdir-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", shuffleCompress.toString)
      .config("spark.driver.host", "localhost")
    val s = localDir.fold(b)(d => b.config("spark.local.dir", d)).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def run(cores: Int, pagesDir: String, localDir: Option[String],
                  shuffleCompress: Boolean): Double = {
    val spark = newSession(cores, localDir, shuffleCompress)
    try {
      import spark.implicits._
      val out = "/dev/shm/graft-localdir-out"
      TableIO.deleteRecursively(out)
      val t0 = System.nanoTime()
      val t = graft.Pipeline.run(spark, spark.read.parquet(pagesDir).as[graft.model.Page], 500)
      graft.Pipeline.materialize(spark, t, out)
      val sec = (System.nanoTime() - t0) / 1e9
      t.flatEnc.unpersist(false)
      t.components.unpersist(false)
      TableIO.deleteRecursively(out)
      sec
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toInt else 40000
    val reps = if (args.length > 2) args(2).toInt else 3
    val pagesDir = "/dev/shm/graft-localdir-pages"
    locally {
      val s = newSession(32, None, shuffleCompress = true)
      try {
        TableIO.deleteRecursively(pagesDir)
        PageGen.pages(s, PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80))
          .write.mode("overwrite").parquet(pagesDir)
      } finally s.stop()
    }
    val shm = Some("/dev/shm/graft-spark-local")
    // warm (untimed)
    run(cores, pagesDir, None, shuffleCompress = true)
    val variants = Seq(
      ("tmp+lz4", None, true),
      ("shm+lz4", shm, true),
      ("shm+raw", shm, false))
    (1 to reps).foreach { rep =>
      variants.foreach { case (name, dir, comp) =>
        val sec = run(cores, pagesDir, dir, comp)
        println(f"LOCALDIR rep=$rep variant=$name%-8s cores=$cores $sec%6.2f s")
      }
    }
    TableIO.deleteRecursively(pagesDir)
    TableIO.deleteRecursively("/dev/shm/graft-spark-local")
  }
}
