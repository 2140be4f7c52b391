package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins for event/dimension processing at scale.
  *
  * Spark has no native as-of or range join; both are composed from
  * built-ins so Catalyst keeps optimizing them (SURVEY.md §7.3 preference
  * order: compose first, custom plans only when composition can't express
  * the semantics — it can here):
  *
  *  - as-of join = union + keyed window `last(ignoreNulls)` — ONE shuffle on
  *    the key, no per-row subqueries, no nested-loop join. This is the
  *    standard "state lookup at event time" of a training-data pipeline
  *    (latest model snapshot / price / label as of each event).
  *  - range join = bin-bucketed equi-join + exact refine — turns an
  *    inequality join (nested-loop in Spark) into a bounded equi shuffle;
  *    each interval lands in ceil(len/width)+1 bins, each point in one.
  */
object Temporal {

  /** For every left row, attach `attrs` from the latest right row with
    * `right.ts <= left.ts` within the same `key` (nulls when none).
    *
    * Right rows must be unique per (key, ts) — pre-dedup if not, or the
    * "latest" attribute is ambiguous (same contract as DuckDB ASOF JOIN).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               attrs: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val reserved = Seq("_side", "_payload", "_attrs", "_asof")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"asofJoin reserves columns ${reserved.mkString(", ")}")
    // SQL join semantics: a NULL key matches nothing — drop NULL-key right
    // rows so NULL-key left rows get NULL attrs instead of matching each
    // other inside the shared window partition
    val rightNonNull = right.filter(col(key).isNotNull)
    // tag and union: right rows sort BEFORE left rows at equal ts so that
    // `<=` (inclusive) semantics hold; left payload columns ride as a
    // struct. The right attrs ride as ONE never-null struct — carrying them
    // individually with last(ignoreNulls) would skip a right row whose
    // attribute is legitimately NULL and resurrect a stale older value.
    val l = left.select(
      col(key), col(ts), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_payload"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        attrs.map(a => org.apache.spark.sql.types.StructField(a, right.schema(a).dataType))
      )).as("_attrs"))
    val r = rightNonNull.select(
      col(key), col(ts), lit(0).as("_side"),
      lit(null).cast(l.schema("_payload").dataType).as("_payload"),
      struct(attrs.map(col): _*).as("_attrs"))
    val w = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_asof", last(col("_attrs"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(c => col("_payload").getField(c).as(c)) ++
        attrs.map(a => col("_asof").getField(a).as(a)): _*)
  }

  /** All (point, interval) pairs with `start <= pt <= end`, via bin
    * bucketing: equi-join on the bin key, exact refine after. `binWidth` in
    * the unit of the columns (e.g. seconds for epoch columns). */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pt: String, start: String, end: String,
                      binWidth: Long): DataFrame = {
    require(!(points.columns ++ intervals.columns).contains("_bin"),
      "rangeJoinBinned reserves the column name _bin")
    val p = points.withColumn("_bin", floor(col(pt) / binWidth))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(start) / binWidth), floor(col(end) / binWidth))))
    p.join(iv, "_bin")
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("_bin")
  }
}
