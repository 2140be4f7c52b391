package graft.tools
import org.apache.spark.sql.SparkSession
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val nPages = args(1).toInt; val persist = args(2).toBoolean
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.inMemoryColumnarStorage.batchSize",
        sys.env.getOrElse("GRAFT_PROBE_BATCH", "10000"))
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cfg = graft.model.PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80)
    val pages = graft.model.PageGen.pages(spark, cfg)
    val gaz = spark.sparkContext.broadcast(graft.Pipeline.defaultGazetteer(cfg.nPersons))
    val auto = spark.sparkContext.broadcast(
      graft.extract.PatternAutomaton.compile(graft.extract.PatternAutomaton.DefaultRules))
    val metrics = new graft.extract.ExtractMetrics(spark)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val flat = graft.extract.TripleExtractor.extractFlat(
        pages.filter($"lang" === "en"), gaz, auto, metrics)
      val f2 = if (persist) flat.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else flat
      val n = f2.count()
      println(f"[probe] rep=$rep pages=$nPages persist=$persist rows=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
      if (persist) f2.unpersist(true)
    }
    spark.stop()
  }
}
