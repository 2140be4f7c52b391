package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.extract.Dominance
import graft.extract.Dominance.{Controls, Dom, DomEdge}

class DominanceSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def ms(n: Int): Array[(Long, Long, Int)] =
    (0 until n).map(i => (1L, 100L + i, i)).toArray
  private def es(pairs: (Int, Int)*): Array[(Long, Long, Long)] =
    pairs.map { case (a, b) => (1L, 100L + a, 100L + b) }.toArray

  test("diamond: DOM collapses at the join point, CONTROLS marks the branch") {
    // 0→1, 1→2, 0→2 (diamond), 2→3 (tail)
    val out = Dominance.computePage(1L, ms(4), es(0 -> 1, 1 -> 2, 0 -> 2, 2 -> 3)).toSeq
    val dom = out.filter(_.kind == Dom).map(e => (e.src - 100, e.dst - 100)).toSet
    dom shouldBe Set((0L, 1L), (0L, 2L), (2L, 3L)) // idom(2)=0: two paths reach it
    val cdg = out.filter(_.kind == Controls).map(e => (e.src - 100, e.dst - 100)).toSet
    cdg shouldBe Set((0L, 1L)) // only 1 is branch-dependent; 2 and 3 always run
  }

  test("pure chain: idom = predecessor, no control dependence") {
    val out = Dominance.computePage(1L, ms(5), es(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 4)).toSeq
    out.filter(_.kind == Dom).map(e => (e.src, e.dst)) should contain theSameElementsAs
      (0 until 4).map(i => (100L + i, 101L + i))
    out.filter(_.kind == Controls) shouldBe empty
  }

  test("pruned edge set (unreachable mentions) degrades gracefully, no crash") {
    // mentions 3,4 have no in-edges at all — idom stays -1 for them; the
    // emit must skip them, not index sorted(-1)
    val out = Dominance.computePage(1L, ms(5), es(0 -> 1, 1 -> 2)).toSeq
    out.filter(_.kind == Dom).map(e => e.src -> e.dst) should
      contain theSameElementsAs Seq(100L -> 101L, 101L -> 102L)
    // fully disconnected except entry: nothing dominated, nothing controls
    Dominance.computePage(2L, ms(3), Array.empty[(Long, Long, Long)]).toSeq shouldBe empty
  }

  test("differential vs brute-force dominance on random discourse-shaped DAGs") {
    // brute force from the definition: d strictly dominates b iff b is not
    // reachable from the entry once d is removed — a different algorithm
    // than the CHK fixpoint (and the same formulation the DuckDB oracle uses)
    def bruteIdom(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
      val adj = edges.groupMap(_._1)(_._2)
      def reachAvoiding(d: Int): Set[Int] = {
        var seen = Set.empty[Int]
        var frontier = if (d == 0) List.empty[Int] else List(0)
        while (frontier.nonEmpty) {
          val x = frontier.head; frontier = frontier.tail
          if (!seen(x)) {
            seen += x
            adj.getOrElse(x, Nil).foreach(y => if (y != d && !seen(y)) frontier ::= y)
          }
        }
        seen
      }
      val sdom = (0 until n).map(d => d -> reachAvoiding(d)).toMap
      (1 until n).map { b =>
        val doms = (0 until n).filter(d => d != b && !sdom(d).contains(b))
        b -> doms.max // dominators are chain-ordered; on this DAG max idx = idom
      }.toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val n = 3 + rnd.nextInt(12)
      // always the NEXT_MENTION chain, plus random forward skip edges
      val chain = (0 until n - 1).map(i => i -> (i + 1))
      val skips = (0 until n).flatMap { i =>
        (i + 2 until n).filter(_ => rnd.nextDouble() < 0.25).map(j => i -> j)
      }
      val edges = (chain ++ skips).distinct
      val out = Dominance.computePage(1L, ms(n),
        es(edges: _*)).toSeq.filter(_.kind == Dom)
      val got = out.map(e => (e.dst - 100).toInt -> (e.src - 100).toInt).toMap
      withClue(s"trial $trial n=$n edges=$edges:") {
        got shouldBe bruteIdom(n, edges)
      }
    }
  }

  test("distributed cogroup equals the pure per-page function on the pipeline corpus") {
    import spark.implicits._
    val cfg = model.PageGen.Config(nPages = 80)
    val t = Pipeline.run(spark, model.PageGen.pages(spark, cfg), cfg.nPersons)
    val dist = Dominance.compute(spark, t.nodes, t.edges).collect().toSet

    val mentions = t.nodes.filter($"kind" === "Mention")
      .select($"pageId", $"id", $"childNum").as[(Long, Long, Int)].collect()
    val medges = t.edges.filter($"kind".isin("NEXT_MENTION", "SAME_SENTENCE"))
      .select($"src", $"dst").as[(Long, Long)].collect()
    val byId = mentions.map(m => m._2 -> m._1).toMap
    val local = mentions.groupBy(_._1).flatMap { case (pid, pms) =>
      val pes = medges.filter(e => byId.get(e._1).contains(pid)).map(e => (pid, e._1, e._2))
      Dominance.computePage(pid, pms, pes)
    }.toSet
    dist shouldBe local
    dist.count(_.kind == Dom) should be > 0
    dist.count(_.kind == Controls) should be > 0
    t.flatEnc.unpersist(false); t.components.unpersist(false)
  }
}
