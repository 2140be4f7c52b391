package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style table IO emulated over Parquet + a JSON snapshot manifest
  * (SURVEY.md §7.4 — no Iceberg jars on the image, so the required semantics
  * — atomic snapshot commit, per-partition checkpoint resume, lineage and
  * counter metrics — live behind this small interface; a real catalog drops
  * in by reimplementing it).
  *
  * Layout:
  *   dir/data/bucket=K/part-*.parquet   (host-hash bucketed data files)
  *   dir/_manifest.json                 (atomic: committed buckets + counters)
  *
  * Commit protocol: data for a bucket is written by Spark's normal task
  * commit; the bucket becomes VISIBLE only when listed in the manifest, and
  * the manifest is replaced atomically (tmp + ATOMIC_MOVE) — the analog of
  * the reference's transaction batches (`CSVImporter.java:91-98`).
  * Resume = read manifest, write only missing buckets
  * (≙ joern's ArgumentTainter delta patching, SURVEY.md G3).
  */
object TableIO {
  val NumBuckets = 32 // at cluster scale this is O(thousands); local[32] keeps 32

  final case class Manifest(
      snapshotId: Long,
      buckets: Map[Int, Long], // bucket -> row count (lineage counters)
      counters: Map[String, Long],
      numBuckets: Int = NumBuckets) // the hash modulus — resume MUST match

  private def manifestPath(dir: String): Path = Paths.get(dir, "_manifest.json")

  def readManifest(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      Some(parseManifest(txt))
    }
  }

  // Hand-rolled JSON for the tiny manifest shape (no extra deps allowed).
  private def renderManifest(m: Manifest): String = {
    val b = m.buckets.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val c = m.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"snapshotId":${m.snapshotId},"numBuckets":${m.numBuckets},"buckets":$b,"counters":$c}"""
  }

  private def parseManifest(s: String): Manifest = {
    def section(name: String): Map[String, Long] = {
      val i = s.indexOf("\"" + name + "\":{")
      if (i < 0) Map.empty
      else {
        val start = s.indexOf('{', i)
        val end = s.indexOf('}', start)
        val body = s.substring(start + 1, end).trim
        if (body.isEmpty) Map.empty
        else body.split(',').map { kv =>
          val Array(k, v) = kv.split(':')
          k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
        }.toMap
      }
    }
    val sid = {
      val i = s.indexOf("\"snapshotId\":")
      val rest = s.substring(i + 13).takeWhile(c => c.isDigit || c == '-')
      rest.toLong
    }
    val nb = {
      val i = s.indexOf("\"numBuckets\":")
      if (i < 0) NumBuckets
      else s.substring(i + 13).takeWhile(_.isDigit).toInt
    }
    Manifest(sid, section("buckets").map { case (k, v) => k.toInt -> v },
      section("counters"), nb)
  }

  private def writeManifestAtomic(dir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s"_manifest.json.tmp${m.snapshotId}")
    Files.write(tmp, renderManifest(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write `df` bucketed by hash of `bucketKeyCol` into `dir`, resuming from
    * an existing manifest (committed buckets are skipped — their input rows
    * are not even read upstream if the caller pushes `bucketFilter` down).
    * Returns the final manifest.
    *
    * `onlyBuckets`: test hook to simulate a mid-job crash (write a subset,
    * commit a partial manifest, die).
    */
  def writeBucketed(
      df: DataFrame,
      dir: String,
      bucketKey: org.apache.spark.sql.Column,
      // by-name: evaluated only at manifest-commit time, so a caller may pass
      // an Await on a concurrently-computing counter job (Pipeline.materialize)
      // and the counter scan overlaps the data write instead of preceding it
      counters: => Map[String, Long] = Map.empty,
      numBuckets: Int = NumBuckets,
      onlyBuckets: Option[Set[Int]] = None): Manifest = {
    val prior = readManifest(dir)
    prior.foreach { m =>
      require(m.numBuckets == numBuckets,
        s"bucket-count mismatch: table at $dir was written with ${m.numBuckets} buckets, " +
          s"resume requested $numBuckets — mixing moduli would duplicate rows")
    }
    val committed: Map[Int, Long] = prior.map(_.buckets).getOrElse(Map.empty)

    val withBucket = df.withColumn("bucket",
      pmod(xxhash64(bucketKey), lit(numBuckets)).cast("int"))

    // schema stamp on first write: an empty table produces no data files at
    // all, so the reader needs somewhere to get the schema from. Written
    // driver-side as schema JSON — the old limit(0) parquet write was a full
    // Spark job + committer round per table, pure fixed overhead that the
    // high-core bench legs (and a real cluster's driver) pay 4× per snapshot
    if (prior.isEmpty) {
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "_schema.json"),
        withBucket.schema.json.getBytes(StandardCharsets.UTF_8))
    }

    val wanted: Set[Int] = {
      val all = (0 until numBuckets).toSet -- committed.keySet
      onlyBuckets.map(all.intersect).getOrElse(all)
    }
    if (wanted.isEmpty) {
      val m = Manifest(System.currentTimeMillis(), committed, counters, numBuckets)
      writeManifestAtomic(dir, m)
      return m
    }

    // clear orphaned partial output of uncommitted buckets (a crash may have
    // left task files that never made it into a manifest)
    wanted.foreach(b => deleteRecursively(s"$dir/data/bucket=$b"))

    // repartition on the bucket key so each bucket is written by one task:
    // without this, every input partition writes a file into every bucket
    // directory (P × B small files — the write anti-scales with cores).
    // The partition key is REMAPPED (see partKeys) so the mapping is exactly
    // 1 bucket : 1 reduce task — a plain repartition(n, bucket) murmur-
    // hashes the bucket id, leaving ~1/3 of the write slots empty and
    // loading others with 2-3 buckets, a skewed write tail that wastes the
    // mid/high-core levels' parallelism
    val keys = partKeys(numBuckets)
    val pending = withBucket.filter(col("bucket").isin(wanted.toSeq: _*))
      .repartition(numBuckets, element_at(typedLit(keys.toSeq), col("bucket") + 1))
    pending.write.mode("append").partitionBy("bucket").parquet(s"$dir/data")
    // lineage counters from parquet footers — metadata-only, no recompute.
    // Read driver-side (java.nio walk + footer row counts): this module's
    // whole snapshot protocol already assumes a POSIX-visible table dir (the
    // manifest moves are java.nio), and a footer read is a few KB per file —
    // the previous empty-schema Spark scan was a whole extra job (+32
    // scheduled tasks) per table, fixed overhead the high-core legs can't
    // amortize. At catalog scale (thousands of buckets on object storage)
    // this becomes the catalog's snapshot statistics, not a driver loop.
    val countsByBucket: Map[Int, Long] = wanted.toSeq.flatMap { b =>
      val bd = Paths.get(dir, "data", s"bucket=$b")
      if (!Files.exists(bd)) None
      else {
        val ls = Files.list(bd)
        val n =
          try ls.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(parquetRowCount).sum
          finally ls.close()
        Some(b -> n)
      }
    }.toMap

    val newBuckets = committed ++ wanted.map(b => b -> countsByBucket.getOrElse(b, 0L))
    val m = Manifest(System.currentTimeMillis(), newBuckets, counters, numBuckets)
    writeManifestAtomic(dir, m)
    m
  }

  /** For each bucket b in [0, n): an int whose Spark murmur3 (seed 42, the
    * HashPartitioning hash) lands in partition b of n — computed with
    * Spark's own Murmur3_x86_32 so repartition(n, key) places bucket b's
    * rows in exactly reduce task b (bijective, no empty/doubled writers). */
  private val partKeyCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
  private[graft] def partKeys(n: Int): Array[Int] =
    partKeyCache.computeIfAbsent(n, { n =>
      val keys = new Array[Int](n)
      val found = new Array[Boolean](n)
      var i = 0
      var remaining = n
      while (remaining > 0) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, 42)
        val b = ((h % n) + n) % n
        if (!found(b)) { found(b) = true; keys(b) = i; remaining -= 1 }
        i += 1
      }
      keys
    })

  private def hasDataFiles(dir: String): Boolean = {
    val d = Paths.get(dir, "data")
    if (!Files.exists(d)) false
    else {
      val ls = Files.list(d)
      try ls.iterator().asScala.exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.startsWith("bucket="))
      finally ls.close()
    }
  }

  /** Read a committed table: only buckets listed in the manifest are visible.
    * An empty snapshot reads back as an empty frame with the stamped schema
    * (`_schema.json`; pre-round-3 tables stamped a parquet `_schema` dir —
    * still honored). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $dir"))
    val df =
      if (hasDataFiles(dir)) spark.read.parquet(s"$dir/data")
      else {
        val js = Paths.get(dir, "_schema.json")
        if (Files.exists(js)) {
          val schema = org.apache.spark.sql.types.DataType
            .fromJson(new String(Files.readAllBytes(js), StandardCharsets.UTF_8))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        } else spark.read.parquet(s"$dir/_schema")
      }
    df.filter(col("bucket").isin(m.buckets.keySet.toSeq: _*)).drop("bucket")
  }

  // one Configuration for all footer reads — construction parses the
  // hadoop config XMLs (tens of ms), which would dominate a 32-file loop
  private lazy val footerConf = new org.apache.hadoop.conf.Configuration()

  /** Row count from a parquet footer (driver-side, metadata-only). */
  private def parquetRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), footerConf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Buckets still missing from the snapshot (what a resume will compute). */
  def missingBuckets(dir: String, numBuckets: Int = NumBuckets): Set[Int] =
    (0 until numBuckets).toSet -- readManifest(dir).map(_.buckets.keySet).getOrElse(Set.empty)

  /** The bucket ids [[writeBucketed]] assigns for a set of keys (xxhash64
    * pmod) — ONE job for the whole changed-key set, used to map changed
    * urls/ids to the buckets to invalidate. */
  def bucketsOfSpark(spark: SparkSession, keys: Seq[String],
                     numBuckets: Int = NumBuckets): Map[String, Int] = {
    import spark.implicits._
    keys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(numBuckets)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  def bucketOfSpark(spark: SparkSession, key: String, numBuckets: Int = NumBuckets): Int =
    bucketsOfSpark(spark, Seq(key), numBuckets)(key)

  /** Incremental invalidation (≙ joern's ArgumentTainter delta patching,
    * SURVEY.md G3): drop the given buckets from the snapshot — atomically,
    * manifest first — so the next [[writeBucketed]] recomputes exactly them.
    * This is the "overwrite partitions by predicate" primitive: when a
    * rule-set or page subset changes, invalidate the buckets its keys hash
    * to and re-run materialize; everything else is untouched. */
  def invalidateBuckets(dir: String, buckets: Set[Int]): Unit = {
    readManifest(dir).foreach { m =>
      // manifest shrinks FIRST (rows in dropped buckets become invisible
      // immediately); orphaned data dirs are cleared lazily by the next
      // writeBucketed, which always wipes uncommitted bucket dirs
      writeManifestAtomic(dir,
        m.copy(snapshotId = m.snapshotId + 1, buckets = m.buckets -- buckets))
      buckets.foreach(b => deleteRecursively(s"$dir/data/bucket=$b"))
    }
  }

  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close() // the stream holds directory handles
    }
  }
}
