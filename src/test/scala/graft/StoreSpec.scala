package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.store.TableIO

class StoreSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft-store").toString + "/tbl"

  private def sample() = {
    import spark.implicits._
    (0 until 1000).map(i => (s"k$i", i.toLong)).toDF("key", "value")
  }

  test("write + read round-trip with manifest") {
    val dir = freshDir()
    val m = TableIO.writeBucketed(sample(), dir, col("key"), Map("rows" -> 1000L), numBuckets = 8)
    m.buckets.keySet shouldBe (0 until 8).toSet
    m.buckets.values.sum shouldBe 1000L
    val back = TableIO.read(spark, dir)
    back.count() shouldBe 1000L
    back.agg(sum("value")).collect()(0).getLong(0) shouldBe (0 until 1000).map(_.toLong).sum
  }

  test("manifest lineage counts: per-bucket footer sums equal actual rows") {
    // the counts are read driver-side from parquet footers — this pins them
    // to the ground truth a full scan computes, per bucket, so a footer-path
    // regression (or a parquet library change) fails loudly
    val dir = freshDir()
    val m = TableIO.writeBucketed(sample(), dir, col("key"), numBuckets = 8)
    val actual = spark.read.parquet(s"$dir/data")
      .groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    m.buckets shouldBe actual
  }

  test("resume after simulated crash: only missing buckets recomputed, no dupes") {
    val dir = freshDir()
    val df = sample()
    // crash after committing buckets {0,1,2}
    TableIO.writeBucketed(df, dir, col("key"), numBuckets = 8, onlyBuckets = Some(Set(0, 1, 2)))
    TableIO.readManifest(dir).get.buckets.keySet shouldBe Set(0, 1, 2)
    TableIO.missingBuckets(dir, 8) shouldBe Set(3, 4, 5, 6, 7)
    // resume: full write call skips committed buckets
    val m2 = TableIO.writeBucketed(df, dir, col("key"), numBuckets = 8)
    m2.buckets.keySet shouldBe (0 until 8).toSet
    val back = TableIO.read(spark, dir)
    back.count() shouldBe 1000L // identical final table, no duplicate work output
    back.select("key").distinct().count() shouldBe 1000L
  }

  test("uncommitted partial files are cleared on resume") {
    val dir = freshDir()
    val df = sample()
    // commit 0..2, then write orphan files into bucket 3 without manifest entry
    TableIO.writeBucketed(df, dir, col("key"), numBuckets = 8, onlyBuckets = Some(Set(0, 1, 2)))
    val orphan = new java.io.File(s"$dir/data/bucket=3")
    orphan.mkdirs()
    Files.write(orphan.toPath.resolve("part-orphan.parquet"), Array[Byte](1, 2, 3))
    val m2 = TableIO.writeBucketed(df, dir, col("key"), numBuckets = 8)
    TableIO.read(spark, dir).count() shouldBe 1000L
  }

  test("invalidateBuckets: G3 delta patching — re-derive only changed buckets") {
    import spark.implicits._
    val dir = freshDir()
    TableIO.writeBucketed(sample(), dir, col("key"), numBuckets = 8)
    // "the rules changed for key k7": find its bucket, invalidate it
    val b = TableIO.bucketOfSpark(spark, "k7", 8)
    TableIO.invalidateBuckets(dir, Set(b))
    TableIO.missingBuckets(dir, 8) shouldBe Set(b)
    // invisible immediately (manifest shrank first)
    TableIO.read(spark, dir).filter(col("key") === "k7").count() shouldBe 0L
    // re-derivation with UPDATED content for the affected rows only
    val updated = sample().withColumn("value",
      when(col("key") === "k7", lit(9999L)).otherwise(col("value")))
    TableIO.writeBucketed(updated, dir, col("key"), numBuckets = 8)
    val back = TableIO.read(spark, dir)
    back.count() shouldBe 1000L
    back.filter(col("key") === "k7").head().getLong(1) shouldBe 9999L
    // untouched buckets kept their original rows (no duplicate work / rows)
    back.dropDuplicates("key").count() shouldBe 1000L
  }

  test("empty table: commit succeeds, read returns schema'd empty frame") {
    import spark.implicits._
    val dir = freshDir()
    val empty = Seq.empty[(String, Long)].toDF("key", "value")
    val m = TableIO.writeBucketed(empty, dir, col("key"), numBuckets = 8)
    m.buckets.values.sum shouldBe 0L
    val back = TableIO.read(spark, dir)
    back.count() shouldBe 0L
    back.columns.toSeq shouldBe Seq("key", "value")
  }

  test("bucket-count mismatch on resume is rejected, not silently mixed") {
    val dir = freshDir()
    TableIO.writeBucketed(sample(), dir, col("key"), numBuckets = 8,
      onlyBuckets = Some(Set(0, 1)))
    val e = intercept[IllegalArgumentException] {
      TableIO.writeBucketed(sample(), dir, col("key")) // default 32 != 8
    }
    e.getMessage should include("bucket-count mismatch")
    // resuming with the RIGHT count works
    TableIO.writeBucketed(sample(), dir, col("key"), numBuckets = 8)
    TableIO.read(spark, dir).count() shouldBe 1000L
  }

  test("manifest json round-trips") {
    val m = TableIO.Manifest(123L, Map(0 -> 10L, 5 -> 2L), Map("pagesIn" -> 7L))
    val dir = freshDir()
    TableIO.writeBucketed(spark.range(1).toDF(), dir, col("id"), Map("pagesIn" -> 7L), numBuckets = 1)
    val back = TableIO.readManifest(dir).get
    back.counters("pagesIn") shouldBe 7L
  }
}
