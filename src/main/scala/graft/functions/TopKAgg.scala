package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation as a typed Aggregator (the UDAF surface,
  * SURVEY.md §2.8): keeps the k best (score, id) pairs per group in a
  * bounded buffer with map-side partial aggregation.
  *
  * Why not `row_number().over(Window.partitionBy(key).orderBy(score))`:
  * the window sorts EVERY row of every group (full shuffle of the scored
  * rows, O(n log n) per group) before the filter throws away all but k.
  * The aggregator ships only k candidates per group out of each map task —
  * at 100 TB the shuffle shrinks from |candidates| to |groups|·k.
  *
  * Ordering: score DESC, then id ASC as the deterministic tie-break
  * (identical to the window form it replaces).
  */
object TopKAgg {

  final case class Scored(score: Double, id: Long)

  /** Better-than: higher score first, lower id on ties. */
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Merge two ascending-sorted ("worst first") buffers into one of size ≤ k. */
  private def mergeK(k: Int, x: List[Scored], y: List[Scored]): List[Scored] = {
    // both lists are worst-first; result keeps the k BEST = last k of the merge
    val merged = (x ++ y).sortWith((a, b) => better(b, a)) // worst first
    merged.drop(math.max(merged.length - k, 0))
  }

  /** Aggregator over pre-projected Scored rows. Buffer is worst-first so the
    * common reduce case (new row worse than current worst of a full buffer)
    * is a head comparison. */
  class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil
    override def reduce(b: List[Scored], a: Scored): List[Scored] =
      if (b.length < k) (a :: b).sortWith((p, q) => better(q, p))
      else if (!better(a, b.head)) b
      else mergeK(k, b, a :: Nil)
    override def merge(x: List[Scored], y: List[Scored]): List[Scored] = mergeK(k, x, y)
    override def finish(r: List[Scored]): Seq[Scored] = r.reverse // best first
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] = new TopK(k).toColumn
}
