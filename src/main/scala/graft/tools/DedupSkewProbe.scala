package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket battery for the near-dup cap rework (the CcBench
  * twin for Dedup): N IDENTICAL documents — every band of every doc lands in
  * the SAME (band, bandHash) bucket, the exact degenerate shape that killed
  * the row_number-over-Window cap (one reducer sorting N rows per band).
  * With the MinKAgg bounded-heap cap the bucket shrinks to maxBucket ids
  * inside every map task, so wall time stays ~linear in the SCAN, not in
  * any single bucket. Expected pairs = C(maxBucket, 2) (identical docs: all
  * bands keep the same capped id set).
  *
  *   runMain graft.tools.DedupSkewProbe [nDocs] [cores]
  */
object DedupSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("graft-dedup-skew-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashLSH(docs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(String.format(java.util.Locale.ROOT,
        "[skewprobe] nDocs=%d pairs=%d sec=%.2f", n, pairs, sec))
    } finally spark.stop()
  }
}
