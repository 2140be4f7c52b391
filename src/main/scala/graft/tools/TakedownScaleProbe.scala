package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Incremental, Pipeline}
import graft.extract.{PatternAutomaton, TripleExtractor}
import graft.model.PageGen
import graft.store.TableIO

/** Corpus-size independence of the takedown fast path, measured.
  *
  * The claim under test: `Incremental.removePages` costs O(batch ·
  * bucket-size), NOT O(corpus) — every read it issues (presence anchor,
  * url-bucket rewrites, evidence probe, host/domain liveness, refcount
  * liveness) is pruned to the batch's buckets, and bucket size is a BUILD
  * parameter (`numBuckets` grows with the corpus: the local default 32 ≙
  * thousands at cluster scale). So removing the SAME batch from a corpus
  * twice as large, built with twice the buckets, should cost ~the same
  * wall — a corpus-linear step anywhere would read ~2×.
  *
  * The batch is the same page set for every corpus size (page content is a
  * pure function of the index), restricted to pages with NO same-as
  * extraction so both runs stay on the FAST path (the slow path's cost
  * scales with merge fallout by design, exercised by the removal specs).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.TakedownScaleProbe"
  *   (or spark-submit; args: [sizesCsv] [batchN])
  */
object TakedownScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.length > 0) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(50000, 100000)
    val batchN = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-takedown-scale")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val minSize = sizes.min
    val cfg0 = PageGen.Config(nPages = minSize)
    val gaz = Pipeline.defaultGazetteer(cfg0.nPersons)
    val auto = PatternAutomaton.compile(PatternAutomaton.DefaultRules)
    val batchIdx = Iterator.range(minSize - 20000, minSize)
      .map(_.toLong)
      .filter { i =>
        val p = PageGen.page(cfg0, i)
        p.lang == "en" &&
          !TripleExtractor.extractPage(p, gaz, auto).triples.exists(_.pred == "same_as")
      }
      .take(batchN).toVector
    require(batchIdx.size == batchN,
      s"only ${batchIdx.size} same-as-free pages in the probe range")
    println(s"[tds] batch=${batchIdx.size} same-as-free pages, sizes=$sizes")

    val walls = sizes.map { n =>
      val nb = math.max(64 * (n / sizes.min), 64) // buckets scale with corpus
      val cfg = PageGen.Config(nPages = n)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-tds-$n").toString
      val t = Pipeline.run(spark,
        spark.range(0L, n.toLong).map(i => PageGen.page(cfg, i)), cfg.nPersons)
      Pipeline.materialize(spark, t, dir, numBuckets = nb)
      t.flatEnc.unpersist(false); t.components.unpersist(false)
      val bSet = batchIdx.toSet
      val batch = spark.createDataset(batchIdx).map(i => PageGen.page(cfg, i))
      val remaining = spark.range(0L, n.toLong).filter(i => !bSet.contains(i))
        .map(i => PageGen.page(cfg, i))
      val t0 = System.nanoTime()
      val st = Incremental.removePages(spark, batch, remaining, dir, cfg.nPersons,
        numBuckets = nb)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[tds] corpus=$n buckets=$nb takedownWall=$wall%.1fs $st")
      require(st.deadPairs == 0L, "batch was not same-as-free — probe invalid")
      require(st.pages == batchN.toLong, s"expected $batchN removed, got ${st.pages}")
      TableIO.deleteRecursively(dir)
      (n, wall)
    }
    val ratioCorpus = sizes.max.toDouble / sizes.min
    val ratioWall = walls.last._2 / walls.head._2
    println(f"[tds] corpus ratio=$ratioCorpus%.1fx, takedown wall ratio=$ratioWall%.2fx " +
      f"(O(batch) predicts ~1.0; a corpus-linear step predicts ~$ratioCorpus%.1f)")
    spark.stop()
  }
}
