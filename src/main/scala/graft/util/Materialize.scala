package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Iteration-materialization policy shared by the fixpoint operators
  * (ConnectedComponents, Steps.reachable / selfReaching,
  * neighborhoodHashFeatures, the GraphAnalytics kernels).
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
  * iteration is written as a RELIABLE checkpoint; the iterations BETWEEN
  * reliable checkpoints are materialized with a plain eager `persist` —
  * lineage kept, NOT truncated. That distinction is what makes executor
  * loss survivable: a lost persisted block is recomputed by Spark's own
  * stage retry, walking the (≤ N-round) lineage back to the last reliable
  * snapshot, whereas a lost `localCheckpoint` block has no lineage at all
  * and fails the job (verified by `tools/ClusterFaultProbe`, which kills an
  * executor JVM mid-fixpoint under local-cluster and asserts bit-identical
  * completion with the interval set, and job failure without it). The
  * interval amortizes the DFS write: reliable checkpoints cost a full
  * write+read round trip, so N trades fault-recovery/replay time against
  * steady-state throughput (N≈5 keeps the overhead to one DFS write per 5
  * shuffle rounds, and bounds both the replay depth and the logical-plan
  * growth between truncations).
  *
  * Local default unchanged (0 = never reliable), matching the reference's
  * single-process execution model where process loss kills the job anyway.
  */
object Materialize {
  val IntervalKey = "spark.graft.reliableCheckpointInterval"

  /** Pin a fixpoint INPUT frame that every round re-reads: reliable
    * checkpoint under the interval — executor loss must not take the only
    * copy of a frame the whole fixpoint depends on — eager localCheckpoint
    * otherwise. Both preserve outputPartitioning, so pre-partitioned edge
    * frames keep satisfying EnsureRequirements from the pin. */
  def pin(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get(IntervalKey, "0").toInt
    if (n > 0) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
  }

  /** Materialize iteration `iter`'s frame eagerly; reliable checkpoint on
    * every Nth iteration when the interval is configured, recomputable
    * persist on the iterations in between, lineage-severing localCheckpoint
    * only when no interval is set. */
  def iterate(df: DataFrame, iter: Int): DataFrame = {
    val n = df.sparkSession.conf.get(IntervalKey, "0").toInt
    if (n <= 0) df.localCheckpoint(eager = true)
    else if (iter % n == n - 1) df.checkpoint(eager = true)
    else {
      // eager persist WITHOUT lineage truncation: the plan grows for at most
      // n-1 rounds (bounded), and a block lost with its executor is
      // re-derived from the last reliable checkpoint by normal task retry
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
  }
}
