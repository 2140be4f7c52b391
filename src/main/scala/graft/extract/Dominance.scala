package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schema.{EdgeKinds => EK, NodeKinds => NK}

/** Computed per-page dominance and control dependence — the executable
  * analog of the reference's densest per-unit algorithms: the CHK iterative
  * idom fixpoint (`dom/DominatorTree.java:162-226`, Cooper-Harvey-Kennedy
  * "A Simple, Fast Dominance Algorithm") and the CDG postdom-chain walk
  * (`cdg/CDGCreator.java:41-88`, Ferrante-Ottenstein-Warren).
  *
  * The page-local discourse graph is NEXT_MENTION ∪ SAME_SENTENCE over the
  * page's mentions: a DAG whose topological order IS the mention index, with
  * the first mention as the unique entry and the last as the unique exit
  * (the NEXT_MENTION chain guarantees both). Dominance runs forward from the
  * entry; postdominance runs on the reversed graph from the exit; CONTROLS
  * edges come from the classic walk: for each edge (a,b), every node on b's
  * postdom chain strictly below ipdom(a) is control-dependent on a.
  *
  * Scale shape: ONE shuffle keyed by pageId into a cogroup; all computation
  * is page-local Scala over groups bounded by the extractor's per-page caps
  * (MaxSentencesPerPage × mentions-per-sentence) — the same proven shape as
  * the graphlet battery, no iteration over the global edge set, no driver
  * collection. At 10^12 pages this partitions embarrassingly.
  */
object Dominance {

  /** One derived dominance-relation edge (kind = DOM | CONTROLS). */
  final case class DomEdge(pageId: Long, src: Long, dst: Long, kind: String)

  val Dom = "DOM"
  val Controls = "CONTROLS"

  /** Both derived relations per page: DOM edges idom(b) → b for every
    * non-entry mention, and CONTROLS edges a → b for control dependences.
    * Filter on `kind` for one of them. */
  def compute(spark: SparkSession, nodes: DataFrame, edges: DataFrame): Dataset[DomEdge] = {
    import spark.implicits._
    val mentions = nodes.filter(col("kind") === NK.Mention)
      .select(col("pageId"), col("id"), col("childNum").as("idx"))
      .as[(Long, Long, Int)]
    // both edge kinds are mention→mention and page-local, so the page key
    // comes from a single equi-join on the src mention
    val pageEdges = edges.filter(col("kind").isin(EK.NextMention, EK.SameSentence))
      .join(nodes.filter(col("kind") === NK.Mention)
        .select(col("id").as("src"), col("pageId")), "src")
      .select(col("pageId"), col("src"), col("dst"))
      .as[(Long, Long, Long)]
    mentions.groupByKey(_._1).cogroup(pageEdges.groupByKey(_._1)) {
      case (pid, ms, es) => computePage(pid, ms.toArray, es.toArray)
    }
  }

  /** Pure per-page computation — also the unit-test surface. Inputs:
    * (pageId, mentionId, idx) and (pageId, src, dst). */
  def computePage(pid: Long, ms: Array[(Long, Long, Int)],
                  es: Array[(Long, Long, Long)]): Iterator[DomEdge] = {
    if (ms.length < 2) return Iterator.empty
    val sorted = ms.sortBy(_._3) // topological order = mention index
    val n = sorted.length
    val pos = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) { pos.put(sorted(i)._2, i); i += 1 }
    // predecessor lists in position space (dedup NEXT_MENTION/SAME_SENTENCE
    // doubles between adjacent same-sentence mentions)
    val preds = Array.fill(n)(List.empty[Int])
    val succs = Array.fill(n)(List.empty[Int])
    es.foreach { case (_, s, d) =>
      if (pos.containsKey(s) && pos.containsKey(d)) {
        val sp = pos.get(s); val dp = pos.get(d)
        if (sp != dp && !preds(dp).contains(sp)) {
          preds(dp) = sp :: preds(dp)
          succs(sp) = dp :: succs(sp)
        }
      }
    }
    val idom = chk(n, preds, entry = 0, topo = 0 until n)
    // postdominance = dominance on the reversed DAG from the exit, with the
    // reversed topological order (descending index)
    val ipdomRev = chk(n, succs, entry = n - 1, topo = (0 until n).reverse)
    val out = Vector.newBuilder[DomEdge]
    i = 1
    while (i < n) {
      // idom stays -1 for nodes unreachable from the entry — possible when
      // the caller passes a pruned edge set (a slice's edges, a single
      // kind). Unreachable nodes have no dominator; skip, don't crash.
      if (idom(i) != -1) out += DomEdge(pid, sorted(idom(i))._2, sorted(i)._2, Dom)
      i += 1
    }
    // CONTROLS: for each edge (a,b), walk b's postdom chain down to (but
    // excluding) ipdom(a) — every node passed is control-dependent on a.
    // ipdom(a) postdominates b for any edge (a,b) (every a→exit path through
    // b passes it), so the walk terminates; the n-step guard is belt-and-
    // braces against a malformed input graph, not a semantic cap.
    val seen = scala.collection.mutable.HashSet.empty[(Int, Int)]
    var k = 0
    while (k < n) {
      val a = k
      succs(a).foreach { b =>
        val stop = ipdomRev(a)
        var runner = b
        var steps = 0
        // runner == -1: b (or an ancestor in its postdom chain) is
        // unreachable from the exit under a pruned edge set — stop the
        // walk instead of indexing sorted(-1)
        while (runner != stop && runner != -1 && steps <= n) {
          if (seen.add((a, runner)))
            out += DomEdge(pid, sorted(a)._2, sorted(runner)._2, Controls)
          runner = ipdomRev(runner)
          steps += 1
        }
      }
      k += 1
    }
    out.result().iterator
  }

  /** CHK iterative idom over nodes 0..n-1 with the given predecessor lists,
    * processing `topo` (a topological order starting at `entry`). On a DAG
    * one pass suffices, but the loop runs to fixpoint exactly like the
    * reference's `DominatorTree.java:162-226` (and like CHK on cyclic CFGs).
    * Returns idom in position space; idom(entry) = entry. */
  private def chk(n: Int, preds: Array[List[Int]], entry: Int,
                  topo: Seq[Int]): Array[Int] = {
    // "processed" rank: position in the chosen topological order — the CHK
    // intersect climbs toward the entry in rank space
    val rank = new Array[Int](n)
    topo.zipWithIndex.foreach { case (node, r) => rank(node) = r }
    val idom = Array.fill(n)(-1)
    idom(entry) = entry
    def intersect(x0: Int, y0: Int): Int = {
      var x = x0; var y = y0
      while (x != y) {
        while (rank(x) > rank(y)) x = idom(x)
        while (rank(y) > rank(x)) y = idom(y)
      }
      x
    }
    var changed = true
    while (changed) {
      changed = false
      topo.foreach { b =>
        if (b != entry) {
          var newIdom = -1
          preds(b).foreach { p =>
            if (idom(p) != -1)
              newIdom = if (newIdom == -1) p else intersect(p, newIdom)
          }
          if (newIdom != -1 && idom(b) != newIdom) { idom(b) = newIdom; changed = true }
        }
      }
    }
    idom
  }
}
