package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.streaming.StreamEntries

/** Streaming ≡ batch over the real events parquet (sf0.001): each oracled
  * streaming entry's output must equal the same computation done as a plain
  * batch DataFrame on the same input. The DuckDB side of the contract is the
  * driver's CORRECTNESS gate; this spec catches divergence locally first. */
class StreamEntriesSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def batchEvents = spark.read.parquet(s"$dir/events.parquet")
    .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("user_id"), col("event_type"), col("value"))

  test("st1 windowed counts: streaming complete-mode result == batch groupBy") {
    val stream = StreamEntries.streamWindow(spark, dir).collect()
    val batch = batchEvents
      .groupBy(unix_seconds(date_trunc("hour", col("ts"))).as("win_start_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("win_start_s", "event_type")
      .collect()
    stream should contain theSameElementsInOrderAs batch
  }

  test("st2 sessionize: streaming sessions == batch lag/cumsum sessions") {
    val stream = StreamEntries.streamSessionize(spark, dir).collect()
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = batchEvents
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
          1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(unix_micros(min(col("ts"))).as("start_us"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / 1000000L)
          .cast("long").as("duration_sec"))
      .select("user_id", "start_us", "n_events", "duration_sec")
      .orderBy("user_id", "start_us")
      .collect()
    stream should contain theSameElementsInOrderAs batch
  }

  test("st3 dedup under double delivery: output == distinct events") {
    val stream = StreamEntries.streamDedup(spark, dir).collect()
    val batch = batchEvents
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect()
    stream should contain theSameElementsInOrderAs batch
  }

  test("windowedCounts over a spark.readStream FILE source equals batch " +
      "(the operators are source-agnostic; MemoryStream is verify plumbing)") {
    // FileStreamSource wants a DIRECTORY (the production shape: a landing
    // dir files arrive into) — stage the parquet file into one
    val src = java.nio.file.Files.createTempDirectory("graft-filesrc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(src.toString)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val q = graft.streaming.EventStream.windowedCounts(raw, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("file_src_win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val stream = spark.table("file_src_win")
      .select(unix_seconds(col("window_start")).as("s"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("s", "event_type").collect()
    val batch = batchEvents
      .groupBy(unix_seconds(date_trunc("hour", col("ts"))).as("s"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("s", "event_type").collect()
    stream should contain theSameElementsInOrderAs batch
  }

  test("st4 attribution join: streaming matches == batch interval join") {
    val stream = StreamEntries.streamJoin(spark, dir).collect()
    val p = batchEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
    val c = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val batch = p.join(c,
        col("user_id") === col("click_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1800 seconds"))
      .select("purchase_id", "click_id", "user_id", "value")
      .orderBy("purchase_id", "click_id").collect()
    stream should contain theSameElementsInOrderAs batch
  }

  test("st5 continuous ingest with redelivered micro-batches == full rebuild") {
    val stream = StreamEntries.streamIngest(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val cfg = graft.model.PageGen.Config(nPages = graft.Queries.kgPages(dir))
    val t = Pipeline.run(spark, graft.model.PageGen.pages(spark, cfg), cfg.nPersons)
    val batch = t.triples.collect().map(_.toString).sorted.toSeq
    t.flatEnc.unpersist(false); t.components.unpersist(false)
    stream shouldBe batch
  }

  test("st6 continuous takedown with redelivered micro-batches == remaining rebuild") {
    import spark.implicits._
    val stream = StreamEntries.streamTakedown(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val cfg = graft.model.PageGen.Config(nPages = graft.Queries.kgPages(dir))
    val split = graft.Queries.appendSplit(dir)
    val t = Pipeline.run(spark,
      spark.range(0L, split).map(i => graft.model.PageGen.page(cfg, i)), cfg.nPersons)
    val batch = t.triples.collect().map(_.toString).sorted.toSeq
    t.flatEnc.unpersist(false); t.components.unpersist(false)
    stream shouldBe batch
  }
}
