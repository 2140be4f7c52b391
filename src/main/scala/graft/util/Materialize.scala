package graft.util

import org.apache.spark.sql.DataFrame

/** Iteration-materialization policy shared by the fixpoint operators
  * (ConnectedComponents, Steps.reachable / selfReaching,
  * neighborhoodHashFeatures).
  *
  * Default: eager `localCheckpoint` — cheapest way to truncate lineage
  * (without it every iteration doubles the plan), but the blocks are
  * executor-local and unreplicated. On a real cluster, losing one executor
  * mid-fixpoint is then unrecoverable: the truncated lineage cannot
  * recompute the lost blocks, and at 100-TB job lengths executor loss is
  * the common case, not the corner case.
  *
  * Cluster mode: set `spark.graft.reliableCheckpointInterval=N` (plus a
  * `SparkContext.setCheckpointDir` on durable storage) and every Nth
  * iteration is written as a RELIABLE checkpoint instead — replay after an
  * executor loss is bounded to < N iterations of executor-local work
  * re-derived from the last reliable snapshot. The interval amortizes the
  * DFS write: reliable checkpoints cost a full write+read round trip, so
  * N trades fault-recovery time against steady-state throughput (N≈5 keeps
  * the overhead to one DFS write per 5 shuffle rounds).
  *
  * Local default unchanged (0 = never reliable), matching the reference's
  * single-process execution model where process loss kills the job anyway.
  */
object Materialize {
  val IntervalKey = "spark.graft.reliableCheckpointInterval"

  /** Materialize iteration `iter`'s frame eagerly, truncating lineage;
    * reliable on every Nth iteration when the interval is configured. */
  def iterate(df: DataFrame, iter: Int): DataFrame = {
    val n = df.sparkSession.conf.get(IntervalKey, "0").toInt
    if (n > 0 && iter % n == n - 1) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }
}
