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
      counters: Map[String, Long])

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
    s"""{"snapshotId":${m.snapshotId},"buckets":$b,"counters":$c}"""
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
    Manifest(sid, section("buckets").map { case (k, v) => k.toInt -> v }, section("counters"))
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
      counters: Map[String, Long] = Map.empty,
      numBuckets: Int = NumBuckets,
      onlyBuckets: Option[Set[Int]] = None): Manifest = {
    val committed: Map[Int, Long] = readManifest(dir).map(_.buckets).getOrElse(Map.empty)

    val withBucket = df.withColumn("bucket",
      pmod(xxhash64(bucketKey), lit(numBuckets)).cast("int"))

    val wanted: Set[Int] = {
      val all = (0 until numBuckets).toSet -- committed.keySet
      onlyBuckets.map(all.intersect).getOrElse(all)
    }
    if (wanted.isEmpty) {
      val m = Manifest(System.currentTimeMillis(), committed, counters)
      writeManifestAtomic(dir, m)
      return m
    }

    // clear orphaned partial output of uncommitted buckets (a crash may have
    // left task files that never made it into a manifest)
    wanted.foreach(b => deleteRecursively(s"$dir/data/bucket=$b"))

    // repartition on the bucket key so each bucket is written by one task:
    // without this, every input partition writes a file into every bucket
    // directory (P × B small files — the write anti-scales with cores)
    val pending = withBucket.filter(col("bucket").isin(wanted.toSeq: _*))
      .repartition(numBuckets, col("bucket"))
    pending.write.mode("append").partitionBy("bucket").parquet(s"$dir/data")
    // lineage counters from parquet footers — metadata-only, no recompute
    // (persist + pre-count here used to double the whole write's work)
    val spark = df.sparkSession
    val countsByBucket = spark.read.parquet(s"$dir/data")
      .filter(col("bucket").isin(wanted.toSeq: _*))
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val newBuckets = committed ++ wanted.map(b => b -> countsByBucket.getOrElse(b, 0L))
    val m = Manifest(System.currentTimeMillis(), newBuckets, counters)
    writeManifestAtomic(dir, m)
    m
  }

  /** Read a committed table: only buckets listed in the manifest are visible. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $dir"))
    val df = spark.read.parquet(s"$dir/data")
    df.filter(col("bucket").isin(m.buckets.keySet.toSeq: _*)).drop("bucket")
  }

  /** Buckets still missing from the snapshot (what a resume will compute). */
  def missingBuckets(dir: String, numBuckets: Int = NumBuckets): Set[Int] =
    (0 until numBuckets).toSet -- readManifest(dir).map(_.buckets.keySet).getOrElse(Set.empty)

  /** The bucket id [[writeBucketed]] assigns for a key (xxhash64 pmod) —
    * callers use this to map changed keys (urls, ids) to the buckets they
    * live in before invalidating. */
  def bucketOfSpark(spark: SparkSession, key: String, numBuckets: Int = NumBuckets): Int = {
    import spark.implicits._
    Seq(key).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(numBuckets)).cast("int")).head().getInt(0)
  }

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
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
