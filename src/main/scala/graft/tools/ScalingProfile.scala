package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Pipeline
import graft.model.PageGen
import graft.store.TableIO

/** Dev probe: per-phase wall time of the benched pipeline at several core
  * counts in ONE warmed JVM (the Bench protocol), to localize the phase that
  * drags the N→4N scaling efficiency. Not a driver surface.
  *
  * Usage: runMain graft.tools.ScalingProfile [pages] [cores...]
  */
object ScalingProfile {
  private def newSession(cores: Int, compressed: Boolean = false): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", compressed.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 40000
    // "P<cores>" = parquet-spill flat cache variant at that level;
    // "S<cores>" = legacy STRING flat cache (pre-dictionary-encoding) —
    // the A/B counterpart of the default, which mirrors the shipping
    // pipeline (encoded cache + decode view)
    val rawLevels = if (args.length > 1) args.drop(1).toSeq else Seq("8", "2", "8")
    // "C<cores>" = encoded cache WITH columnar compression (RLE/dictionary
    // over the int-coded frame — the string frame's 2x build-CPU compression
    // tax does not apply to ints, re-measured round 4)
    // "U<cores>" = encoded cache UNSORTED (pre-kind-sort A/B counterpart:
    // interleaved batches, so per-batch stats cannot prune kind filters)
    val levels = rawLevels.map { s =>
      if (s.startsWith("P")) (s.drop(1).toInt, "parquet")
      else if (s.startsWith("S")) (s.drop(1).toInt, "string")
      else if (s.startsWith("C")) (s.drop(1).toInt, "encC")
      else if (s.startsWith("U")) (s.drop(1).toInt, "encU")
      else (s.toInt, "enc")
    }
    val pagesDir = "/dev/shm/graft-scaling-pages"
    val outDir = "/dev/shm/graft-scaling-out"

    locally {
      val s = newSession(32)
      try {
        TableIO.deleteRecursively(pagesDir)
        PageGen.pages(s, PageGen.Config(nPages = nPages, sentMin = 40, sentMax = 80))
          .write.mode("overwrite").parquet(pagesDir)
      } finally s.stop()
    }

    levels.foreach { case (cores, variant) =>
      val spark = newSession(cores, compressed = variant == "encC")
      try {
        import spark.implicits._
        TableIO.deleteRecursively(outDir)
        val tAll = System.nanoTime()
        var last = tAll
        def lap(name: String): Unit = {
          val now = System.nanoTime()
          println(f"SCALING cores=$cores v=$variant%-7s phase=$name%-16s ${(now - last) / 1e9}%7.2f s")
          last = now
        }
        val pages = spark.read.parquet(pagesDir).as[graft.model.Page]
        val g = Pipeline.defaultGazetteer(500)
        val a = graft.extract.PatternAutomaton.compile(graft.extract.PatternAutomaton.DefaultRules)
        val gaz = spark.sparkContext.broadcast(g)
        val auto = spark.sparkContext.broadcast(a)
        val metrics = new graft.extract.ExtractMetrics(spark)
        val flat =
          if (variant == "parquet") {
            val d = "/dev/shm/graft-scaling-flat"
            TableIO.deleteRecursively(d)
            graft.extract.TripleExtractor
              .extractFlat(pages.filter($"lang" === "en"), gaz, auto, metrics)
              .write.parquet(d)
            spark.read.parquet(d).as[graft.extract.FlatRow]
          } else if (variant == "string") {
            val f = graft.extract.TripleExtractor
              .extractFlat(pages.filter($"lang" === "en"), gaz, auto, metrics)
              .persist(StorageLevel.MEMORY_AND_DISK)
            f.count()
            f
          } else { // enc/encC/encU — the shipping shape: encoded cache + decode view
            val raw = graft.extract.TripleExtractor
              .extractFlatEnc(pages.filter($"lang" === "en"), gaz, auto, metrics)
            // shipping pipeline sorts (rowKind, pred) for kind-homogeneous
            // cached batches (stat pruning); "U" measures the unsorted shape
            val enc = (if (variant == "encU") raw
                       else raw.sortWithinPartitions($"rowKind", $"pred"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            enc.count()
            graft.extract.TripleExtractor.decodeFlat(enc,
              spark.sparkContext.broadcast(a.preds),
              spark.sparkContext.broadcast(g.aliasArr),
              spark.sparkContext.broadcast(graft.extract.FlatDict.RowKinds),
              spark.sparkContext.broadcast(graft.extract.FlatDict.Labels))
          }
        lap("extract_cache")
        if (variant != "parquet") {
          val st = spark.sparkContext.getRDDStorageInfo
            .map(i => i.memSize + i.diskSize).sum
          println(f"SCALING cores=$cores v=$variant%-7s cache_bytes=$st%d (${st / 1048576.0}%.1f MiB)")
        }
        // mirrors Pipeline.run: the pair set is checkpointed once so the CC
        // probe + chosen path do not re-run the flat scan + distinct
        val sameAs = flat.filter($"rowKind" === "t" && $"pred" === "same_as" && $"obj" >= 0)
          .select($"subj".as("a"), $"obj".as("b")).distinct().localCheckpoint(true)
        val components = graft.canon.ConnectedComponents.auto(spark, sameAs)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nComp = components.count()
        lap("cc")
        val rawTriples = flat.filter($"rowKind" === "t" && $"pred" =!= "same_as")
          .select($"subj", $"pred", $"obj", $"objValue", $"url", $"conf")
        val canonMap =
          if (nComp <= Pipeline.CanonBroadcastCutover) broadcast(components) else components
        val triples = rawTriples
          .join(canonMap.withColumnRenamed("id", "subj").withColumnRenamed("component", "subjCanon"),
            Seq("subj"), "left")
          .join(canonMap.withColumnRenamed("id", "obj").withColumnRenamed("component", "objCanon"),
            Seq("obj"), "left")
          .select(coalesce($"subjCanon", $"subj").as("subj"), $"pred",
            coalesce($"objCanon", $"obj").as("obj"), $"objValue", $"url", $"conf")
          .dropDuplicates("subj", "pred", "obj", "objValue", "url")
        val (nodes, edges) = Pipeline.graphTables(spark, flat, components)
        lap("plan_build")
        // mirrors Pipeline.materialize: the counter scan runs as a FIFTH
        // concurrent job overlapped with the writes (measuring it serially
        // here would profile a pipeline shape that no longer ships)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val countersF = Future {
          flat.groupBy("rowKind").agg(
            count(lit(1)).as("n"),
            sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("nErr"),
            sum(coalesce(col("nSentences"), lit(0))).as("nSent")).collect()
        }
        val writes = Seq(
          "triples" -> Future(TableIO.writeBucketed(triples, s"$outDir/triples", col("url"))),
          "nodes" -> Future(TableIO.writeBucketed(nodes, s"$outDir/nodes", col("id"))),
          "edges" -> Future(TableIO.writeBucketed(edges, s"$outDir/edges", col("src"))),
          "components" -> Future(TableIO.writeBucketed(components, s"$outDir/components", col("id"))))
        writes.foreach { case (_, f) => Await.result(f, Duration.Inf) }
        val c = Await.result(countersF, Duration.Inf)
        lap("writes+counters")
        println(f"SCALING cores=$cores v=$variant%-7s phase=TOTAL            ${(System.nanoTime() - tAll) / 1e9}%7.2f s  (c=${c.length}%d)")
        // the session dies with the level, but unpersist anyway (symmetry
        // with the shipping pipeline's eviction discipline); for the enc
        // variant the persisted frame is the one under the decode view —
        // sweep all session caches rather than thread the handle through
        spark.sharedState.cacheManager.clearCache()
        components.unpersist(false)
        TableIO.deleteRecursively(outDir)
        TableIO.deleteRecursively("/dev/shm/graft-scaling-flat")
      } finally spark.stop()
    }
    TableIO.deleteRecursively(pagesDir)
  }
}
