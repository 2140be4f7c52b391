package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded "k smallest ids" aggregation — the partial-agg-safe replacement
  * for `row_number().over(Window.partitionBy(bucket).orderBy(id)) <= k`
  * hot-bucket capping in the near-dup operators.
  *
  * Why the window form is a scale-killer: `Window.partitionBy(hotKey)` has
  * no partial aggregation — every row of a hot bucket (and on a web corpus
  * the hot bucket is the NORM: empty/boilerplate text shares identical
  * signatures) is shuffled into ONE task and fully sorted before the cap
  * filter runs, so the task the cap exists to protect is created by the
  * cap's own implementation. This aggregator reduces each bucket to ≤ k ids
  * inside every map task (ObjectHashAggregate partial mode), so the shuffle
  * carries at most k ids per bucket per map task no matter how hot the
  * bucket is.
  *
  * Semantics are identical to the window form it replaces: the k smallest
  * ids per group, ascending.
  */
object MinKAgg {

  /** Buffer is worst-first (largest id at head) so the common reduce case —
    * new id larger than the current worst of a full buffer — is a head
    * comparison. Output ascending. */
  class MinK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] =
      if (b.length < k) (a :: b).sortWith(_ > _)
      else if (a >= b.head) b
      else (a :: b).sortWith(_ > _).tail
    override def merge(x: List[Long], y: List[Long]): List[Long] = {
      val m = (x ++ y).sortWith(_ > _)
      m.drop(math.max(m.length - k, 0))
    }
    override def finish(r: List[Long]): Seq[Long] = r.reverse
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped column form for use after `groupBy(bucketCols)`. */
  def minK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinK(k))

  /** All ordered pairs (ids(i), ids(j)), i < j, from an ASCENDING id array —
    * per-bucket candidate-pair expansion over the ≤ k capped ids. The nested
    * higher-order functions are interpreted, which is fine here: they run
    * over ≤ k elements per bucket, never over the raw bucket. Guarantees
    * a < b because the input is ascending. */
  def pairCombos(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)), y =>
        struct(x.as("a"), y.as("b")))))
}
