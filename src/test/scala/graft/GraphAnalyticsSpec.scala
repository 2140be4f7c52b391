package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.query.GraphAnalytics

class GraphAnalyticsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  /** Driver-side twin of pageRankInt's exact integer recurrence. */
  private def pageRankLocal(es: Seq[(Long, Long)], iters: Int, totalMass: Long,
                            seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val e = es.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val inSeed: Long => Boolean = seeds match {
      case Some(s) => s.contains
      case None => _ => true
    }
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val perSeed = totalMass / nodes.count(inSeed)
    val base = perSeed * 15L / 100L
    var r = nodes.map(n => n -> (if (inSeed(n)) perSeed else 0L)).toMap
    for (_ <- 0 until iters) {
      val cx = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(n => n ->
        ((if (inSeed(n)) base else 0L) + 85L * cx.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  // a little directed graph with a cycle, a dangling node and a hub
  val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
    1L -> 7L, 7L -> 7L /* self loop, dropped */, 2L -> 3L /* dup, dropped */)

  test("pageRankInt matches the driver-side integer recurrence exactly") {
    val got = GraphAnalytics.pageRankInt(edges(g: _*), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe pageRankLocal(g, 10, 1000000000000000L)
  }

  test("pageRankInt: the link hub outranks its pointers; result is invariant under partitioning") {
    val r = GraphAnalytics.pageRankInt(edges(g: _*), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(1L) should be > r(4L)
    r(7L) should be > r(4L) // fed by the hub
    val repart = GraphAnalytics.pageRankInt(
      edges(g: _*).repartition(7), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    repart shouldBe r
  }

  test("personalized PageRank matches the twin; mass localizes at the seed side") {
    import spark.implicits._
    val seedDf = Seq(4L, 5L).toDF("id")
    val got = GraphAnalytics.pageRankInt(edges(g: _*), iters = 10,
      seeds = Some(seedDf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe pageRankLocal(g, 10, 1000000000000000L, Some(Set(4L, 5L)))
    // nodes unreachable from the seeds hold zero mass; the seeds' target does
    got(6L) shouldBe 0L // 6 -> 1 only; nothing flows INTO 6
    got(1L) should be > 0L // fed by seeds 4 and 5
  }

  /** Brute-force triangle census: all 3-subsets of the undirected edge set. */
  private def trianglesLocal(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = es.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct.toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val cnt = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if und((a, b)) && und((b, c)) && und((a, c))
    } { cnt(a) += 1; cnt(b) += 1; cnt(c) += 1 }
    cnt.toMap
  }

  val tg = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, // triangle 1-2-3
    3L -> 4L, 4L -> 5L, 5L -> 3L, // triangle 3-4-5
    2L -> 4L, // closes 2-3-4
    6L -> 1L, // pendant
    4L -> 3L /* reverse dup, dropped */)

  test("triangleCounts matches the brute-force census; wedges = C(deg,2)") {
    val rows = GraphAnalytics.triangleCounts(edges(tg: _*)).collect()
    val want = trianglesLocal(tg)
    rows.map(r => r.getLong(0) -> r.getLong(3)).toMap shouldBe
      rows.map(r => r.getLong(0) -> want.getOrElse(r.getLong(0), 0L)).toMap
    rows.foreach { r =>
      val deg = r.getLong(1)
      r.getLong(2) shouldBe deg * (deg - 1) / 2
    }
    // node 3 touches triangles 1-2-3, 3-4-5, 2-3-4
    rows.find(_.getLong(0) == 3L).get.getLong(3) shouldBe 3L
    rows.find(_.getLong(0) == 6L).get.getLong(3) shouldBe 0L
  }

  test("kCore peels pendant trees; survivors match the sequential peel") {
    import GraphTestOracles.kCoreLocal
    // triangle 1-2-3 with a pendant path 3-6-7 and an isolated edge 8-9
    val g2 = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 6L, 6L -> 7L, 8L -> 9L)
    val got = GraphAnalytics.kCore(edges(g2: _*), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    got shouldBe kCoreLocal(g2, 2)
    // k=3 peels the triangle too — empty core
    GraphAnalytics.kCore(edges(g2: _*), k = 3).count() shouldBe 0L
  }

  test("triangleCounts on a hub star has zero triangles but hub wedges") {
    val star = (1L to 40L).map(i => 0L -> i)
    val rows = GraphAnalytics.triangleCounts(edges(star: _*)).collect()
    rows.map(_.getLong(3)).sum shouldBe 0L
    rows.find(_.getLong(0) == 0L).get.getLong(2) shouldBe 40L * 39L / 2L
  }

  /** Driver-side twin of hitsInt's exact integer recurrence. */
  private def hitsLocal(es: Seq[(Long, Long)], iters: Int,
                        scale: Long): Map[Long, (Long, Long)] =
    GraphTestOracles.hitsLocal(es, iters, scale)

  test("hitsInt matches the driver-side integer recurrence exactly; partition-invariant") {
    val got = GraphAnalytics.hitsInt(edges(g: _*), iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got shouldBe hitsLocal(g, 8, 1000000000000L)
    val repart = GraphAnalytics.hitsInt(edges(g: _*).repartition(7), iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    repart shouldBe got
  }

  test("hitsInt: pointed-at nodes are authorities, pointers are hubs") {
    // 1,2,3 -> 4 ; 1,2 -> 5 : node 4 is the top authority, 1/2 the top hubs
    val bg = Seq(1L -> 4L, 2L -> 4L, 3L -> 4L, 1L -> 5L, 2L -> 5L)
    val r = GraphAnalytics.hitsInt(edges(bg: _*), iters = 8)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    r(4L)._2 should be > r(5L)._2 // auth: in-degree 3 beats 2
    r(5L)._2 should be > r(1L)._2 // any authority beats a pure hub
    r(1L)._1 shouldBe r(2L)._1 // symmetric hubs tie exactly
    r(1L)._1 should be > r(3L)._1 // 1 points at both authorities, 3 at one
    r(4L)._1 shouldBe 0L // sink: no out-edges, zero hub
  }

  /** Driver-side twin of labelPropagation: sync rounds, most-frequent
    * neighbor label, min-label ties. */
  private def lpLocal(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphTestOracles.lpLocal(es, iters)

  test("labelPropagation matches the driver-side twin exactly; partition-invariant") {
    val got = GraphAnalytics.labelPropagation(edges(tg: _*), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe lpLocal(tg, 5)
    val repart = GraphAnalytics.labelPropagation(edges(tg: _*).repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    repart shouldBe got
  }

  /** Driver-side twin of sameAsCandidates: witness counting with hub
    * witnesses dropped, full-degree denominators, integer Jaccard test. */
  private def sameAsLocal(es: Seq[(Long, Long)], minInter: Int, jacNum: Int,
                          jacDen: Int, hubCap: Long): Map[(Long, Long), (Long, Long, Long)] =
    GraphTestOracles.sameAsLocal(es, minInter, jacNum, jacDen, hubCap)

  test("sameAsCandidates matches the driver-side twin exactly; partition-invariant") {
    val got = GraphAnalytics.sameAsCandidates(edges(tg: _*), minInter = 1,
      jacNum = 0, jacDen = 1, hubCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got shouldBe sameAsLocal(tg, 1, 0, 1, 1000L)
    got should not be empty
    val repart = GraphAnalytics.sameAsCandidates(edges(tg: _*).repartition(7),
      minInter = 1, jacNum = 0, jacDen = 1, hubCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    repart shouldBe got
  }

  test("sameAsCandidates: hub witnesses are dropped, Jaccard threshold filters") {
    // 1 and 2 share witnesses {3 (hub, deg 5), 4, 5}; 6,7,8 hang off 3
    val hg = Seq(1L -> 3L, 2L -> 3L, 1L -> 4L, 2L -> 4L, 1L -> 5L, 2L -> 5L,
      6L -> 3L, 7L -> 3L, 8L -> 3L)
    // hubCap 4: node 3 (deg 5) is not a witness — inter(1,2) = 2, not 3
    val capped = GraphAnalytics.sameAsCandidates(edges(hg: _*), minInter = 2,
      jacNum = 0, jacDen = 1, hubCap = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    capped shouldBe sameAsLocal(hg, 2, 0, 1, 4L).map { case (k, v) => k -> v._1 }
    capped((1L, 2L)) shouldBe 2L
    // degrees in the output stay FULL degrees (3 counts toward deg, not inter)
    val full = GraphAnalytics.sameAsCandidates(edges(hg: _*), minInter = 2,
      jacNum = 0, jacDen = 1, hubCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    full((1L, 2L)) shouldBe ((3L, 3L, 3L)) // perfect overlap without the cap
    // the Jaccard gate: inter·den >= num·(du+dv-inter) — 1/1 keeps only
    // perfect-overlap pairs
    val strict = GraphAnalytics.sameAsCandidates(edges(hg: _*), minInter = 1,
      jacNum = 1, jacDen = 1, hubCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    strict shouldBe sameAsLocal(hg, 1, 1, 1, 1000L).keySet
    strict should contain((1L, 2L))
  }

  /** Driver-side twin of scc: the shared sequential Tarjan (one
    * implementation — VerifyOracle.tarjanScc; its own correctness is pinned
    * by the hand-computed expectations below). */
  private def sccLocal(es: Seq[(Long, Long)]): Map[Long, Long] =
    VerifyOracle.tarjanScc(es.filter(p => p._1 != p._2).distinct)

  test("scc matches driver-side Tarjan exactly; partition-invariant") {
    val got = GraphAnalytics.scc(edges(g: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe sccLocal(g)
    got(1L) shouldBe 1L; got(2L) shouldBe 1L; got(3L) shouldBe 1L // the cycle
    got(4L) shouldBe 4L // DAG feeder is a singleton
    val repart = GraphAnalytics.scc(edges(g: _*).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    repart shouldBe got
  }

  test("scc decomposes a bow-tie: IN tail, core cycle, OUT tail, disjoint cycle") {
    // IN: 10→11→1; core: 1→2→3→1; OUT: 3→20→21; second cycle: 30↔31;
    // cross edge OUT→second cycle: 21→30
    val bt = Seq(10L -> 11L, 11L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L,
      3L -> 20L, 20L -> 21L, 21L -> 30L, 30L -> 31L, 31L -> 30L)
    val got = GraphAnalytics.scc(edges(bt: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe sccLocal(bt)
    Set(got(1L), got(2L), got(3L)) shouldBe Set(1L)
    Set(got(30L), got(31L)) shouldBe Set(30L)
    Seq(10L, 11L, 20L, 21L).foreach(v => got(v) shouldBe v)
  }

  test("bowTie classifies CORE / IN / OUT / OTHER; partition-invariant") {
    // IN: 10→11→core; CORE: 1→2→3→1 (largest SCC); OUT: 3→20→21→{30↔31};
    // OTHER: disconnected pair 40→41
    val bt = Seq(10L -> 11L, 11L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L,
      3L -> 20L, 20L -> 21L, 21L -> 30L, 30L -> 31L, 31L -> 30L,
      40L -> 41L)
    val got = GraphAnalytics.bowTie(edges(bt: _*))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(1L, 2L, 3L).foreach(v => got(v) shouldBe "CORE")
    Seq(10L, 11L).foreach(v => got(v) shouldBe "IN")
    Seq(20L, 21L, 30L, 31L).foreach(v => got(v) shouldBe "OUT")
    Seq(40L, 41L).foreach(v => got(v) shouldBe "OTHER")
    val repart = GraphAnalytics.bowTie(edges(bt: _*).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    repart shouldBe got
  }

  test("bowTie core tiebreak: equal-size SCCs pick the smaller scc label") {
    // two 2-cycles, no path between them: core = SCC labeled 1
    val tie = Seq(1L -> 2L, 2L -> 1L, 5L -> 6L, 6L -> 5L)
    val got = GraphAnalytics.bowTie(edges(tie: _*))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got(1L) shouldBe "CORE"; got(2L) shouldBe "CORE"
    got(5L) shouldBe "OTHER"; got(6L) shouldBe "OTHER"
  }

  test("shortestPath: minimal hops, min-parent determinism, unreachable, self") {
    // two equal-length 1→5 paths: 1→2→5 and 1→3→5 — min-parent picks 2
    val pg = Seq(1L -> 2L, 1L -> 3L, 2L -> 5L, 3L -> 5L,
      1L -> 4L, 4L -> 6L, 6L -> 5L, // longer detour, must lose
      7L -> 1L) // 7 unreachable FROM 1 (edge points the wrong way)
    GraphAnalytics.shortestPath(edges(pg: _*), 1L, 5L) shouldBe
      Some(Seq(1L, 2L, 5L))
    GraphAnalytics.shortestPath(edges(pg: _*).repartition(7), 1L, 5L) shouldBe
      Some(Seq(1L, 2L, 5L)) // partition-invariant
    GraphAnalytics.shortestPath(edges(pg: _*), 1L, 7L) shouldBe None
    GraphAnalytics.shortestPath(edges(pg: _*), 1L, 1L) shouldBe Some(Seq(1L))
    // maxDepth bound: 1→4→6→5 is 3 hops; cap at 2 forbids any route? no —
    // 1→2→5 is 2 hops and still found; cap at 1 finds nothing
    GraphAnalytics.shortestPath(edges(pg: _*), 1L, 5L, maxDepth = 1) shouldBe None
  }

  test("labelPropagation separates two cliques joined by one edge") {
    val cliques = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L,
      10L -> 11L, 10L -> 12L, 11L -> 12L, 3L -> 10L)
    val got = GraphAnalytics.labelPropagation(edges(cliques: _*), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe lpLocal(cliques, 5)
    // the cliques resolve to two distinct communities split at the bridge
    Set(got(1L), got(2L), got(3L)).size shouldBe 1
    Set(got(10L), got(11L), got(12L)).size shouldBe 1
    got(1L) should not be got(10L)
  }
}

/** Shared in-memory graph oracles for the spec AND property layers (one
  * copy — the main-code twin in VerifyOracle stays deliberately separate:
  * differential testing wants the oracle independent of the tests). */
object GraphTestOracles {
  /** Sequential queue peel (the VerifyOracle algorithm). */
  def kCoreLocal(es: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val und = es.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, collection.mutable.Set.empty) += a
    }
    val deg = collection.mutable.Map(adj.toSeq.map { case (n, s) => n -> s.size }: _*)
    val removed = collection.mutable.Set.empty[Long]
    val queue = collection.mutable.Queue(adj.keys.filter(deg(_) < k).toSeq: _*)
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      if (!removed.contains(v)) {
        removed += v
        adj(v).foreach { u =>
          if (!removed.contains(u)) { deg(u) -= 1; if (deg(u) < k) queue.enqueue(u) }
        }
      }
    }
    adj.keys.filterNot(removed).map(n => n -> deg(n).toLong).toMap
  }

  /** Exact integer HITS recurrence (dense form — the oracle's shape). */
  def hitsLocal(es: Seq[(Long, Long)], iters: Int,
                scale: Long): Map[Long, (Long, Long)] = {
    val e = es.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 0 until iters) {
      val aRaw = e.groupBy(_._2).map { case (d, in) => d -> in.map(x => h(x._1)).sum }
      val da = (if (aRaw.isEmpty) 0L else aRaw.values.max) / scale + 1L
      a = nodes.map(n => n -> aRaw.getOrElse(n, 0L) / da).toMap
      val hRaw = e.groupBy(_._1).map { case (s, out) => s -> out.map(x => a(x._2)).sum }
      val dh = (if (hRaw.isEmpty) 0L else hRaw.values.max) / scale + 1L
      h = nodes.map(n => n -> hRaw.getOrElse(n, 0L) / dh).toMap
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  /** Synchronous LP: most-frequent neighbor label, min-label ties. */
  def lpLocal(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = es.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var l = adj.keys.map(n => n -> n).toMap
    for (_ <- 0 until iters) {
      l = adj.map { case (n, nbs) =>
        val hist = nbs.map(l).groupBy(identity).map { case (lab, xs) => lab -> xs.size }
        val mx = hist.values.max
        n -> hist.filter(_._2 == mx).keys.min
      }
    }
    l
  }

  /** Witness-count sameAs: hub witnesses dropped, full-degree denominators,
    * cross-multiplied integer Jaccard gate. */
  def sameAsLocal(es: Seq[(Long, Long)], minInter: Int, jacNum: Int,
                  jacDen: Int, hubCap: Long): Map[(Long, Long), (Long, Long, Long)] = {
    val und = es.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val nodes = adj.keys.toSeq.sorted
    (for {
      u <- nodes; v <- nodes if u < v
      inter = (adj(u) & adj(v)).count(w => deg(w) <= hubCap).toLong
      if inter >= minInter && inter * jacDen >= jacNum * (deg(u) + deg(v) - inter)
    } yield (u, v) -> (inter, deg(u), deg(v))).toMap
  }
}
