package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.Temporal

class TemporalSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  test("asofJoin picks the latest right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 10L, 103L)
    ).toDF("k", "ts", "ev")
    val right = Seq(
      (1L, 10L, "a"), (1L, 15L, "b"),
      (2L, 99L, "z")
    ).toDF("k", "ts", "attr")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("attr"))
      .orderBy("ev").collect()
      .map(r => (r.getLong(2), Option(r.getString(3)).orNull))
    out shouldBe Array(
      (100L, "a"),  // ts=10 matches right ts=10 (inclusive)
      (101L, "b"),  // ts=20 -> latest is 15
      (102L, null), // ts=5 precedes all right rows
      (103L, null)) // key 2: right row is later
  }

  test("asofJoin keeps every left column and row count") {
    import spark.implicits._
    val left = (0L until 100L).map(i => (i % 5, i, s"p$i")).toDF("k", "ts", "payload")
    val right = (0L until 20L).map(i => (i % 5, i * 3, i.toDouble)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("v"))
    out.count() shouldBe 100L
    out.columns.toSeq shouldBe Seq("k", "ts", "payload", "v")
  }

  test("asofJoin: NULL keys match nothing; NULL attr values carry through") {
    import spark.implicits._
    val left = Seq((Some(1L), 10L, 100L), (None: Option[Long], 10L, 101L))
      .toDF("k", "ts", "ev")
    val right = Seq((Some(1L), 5L, Some(7.0)), (Some(1L), 8L, None: Option[Double]),
      (None: Option[Long], 5L, Some(99.0))).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // ev 100: latest right at ts<=10 is (1, 8, NULL) — the NULL must carry,
    // not resurrect the older 7.0
    out(100L) shouldBe None
    // ev 101: NULL key matches nothing (SQL semantics), even though a
    // NULL-key right row exists
    out(101L) shouldBe None
  }

  test("rangeJoinBinned equals a naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0 until 500).map(_ => rnd.nextInt(10000).toLong).toDF("pt")
    val ivs = (0 until 50).map { i =>
      val s = rnd.nextInt(9000).toLong; (i.toLong, s, s + rnd.nextInt(800).toLong)
    }.toDF("iv", "s", "e")
    val binned = Temporal.rangeJoinBinned(points, ivs, "pt", "s", "e", 256L)
      .groupBy("iv").count()
    val naive = points.crossJoin(ivs)
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .groupBy("iv").count()
    binned.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(binned).count() shouldBe 0L
  }
}
