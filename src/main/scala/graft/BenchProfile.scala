package graft

import org.apache.spark.sql.SparkSession
import graft.model.PageGen

/** Phase-level profiler for the KG pipeline (dev tool, not a driver surface). */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val nPages = if (args.length > 1) args(1).toInt else 40000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cfg = PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80)
    val pages = PageGen.pages(spark, cfg)
    time("gen_count")(pages.count())

    val gaz = spark.sparkContext.broadcast(Pipeline.defaultGazetteer(cfg.nPersons))
    val auto = spark.sparkContext.broadcast(
      graft.extract.PatternAutomaton.compile(graft.extract.PatternAutomaton.DefaultRules))
    val metrics = new graft.extract.ExtractMetrics(spark)
    val extracted = graft.extract.TripleExtractor
      .extractFlat(pages.filter($"lang" === "en"), gaz, auto, metrics)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("extract_count")(extracted.count())

    val sameAs = extracted.filter($"rowKind" === "t" && $"pred" === "same_as" && $"obj" >= 0)
      .select($"subj".as("a"), $"obj".as("b"))
    val components = time("cc")(
      graft.canon.ConnectedComponents.auto(spark, sameAs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    time("cc_count")(components.count())

    val full = Pipeline.run(spark, pages, cfg.nPersons)
    time("triples_count")(full.triples.count())
    import org.apache.spark.sql.functions.col
    val out = "/dev/shm/graft-profile"
    graft.store.TableIO.deleteRecursively(out)
    time("write_triples")(graft.store.TableIO.writeBucketed(full.triples, s"$out/triples", col("url")))
    time("write_nodes")(graft.store.TableIO.writeBucketed(full.nodes, s"$out/nodes", col("id")))
    time("write_edges")(graft.store.TableIO.writeBucketed(full.edges, s"$out/edges", col("src")))
    graft.store.TableIO.deleteRecursively("/dev/shm/graft-profile")
    spark.stop()
  }
}
