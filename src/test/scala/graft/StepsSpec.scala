package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.model._
import graft.query.Steps

class StepsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import Schema.{EdgeKinds => EK, NodeKinds => NK}

  lazy val cfg = PageGen.Config(nPages = 200)
  lazy val t = Pipeline.run(spark, PageGen.pages(spark, cfg), cfg.nPersons)

  test("lookup + hop: pages of the mega host") {
    val megaHost = t.nodes.filter(col("kind") === NK.Host)
      .filter(col("code").startsWith("host0."))
      .collect()(0).getString(2)
    val pages = Steps.pagesOfHost(t.nodes, t.edges, megaHost)
    pages.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.Page)
    pages.count() should be > 20L // mega-host skew
  }

  test("out/in hops are inverses") {
    val pages = t.nodes.filter(col("kind") === NK.Page).limit(5)
    val mentions = Steps.out(pages, t.edges, t.nodes, EK.Mentions)
    mentions.count() should be > 0L
    val back = Steps.in(mentions, t.edges, t.nodes, EK.Mentions)
    back.select("id").distinct().count() should be <= 5L
  }

  test("anti-join step: notInPages excludes exactly the pages of excl") {
    val all = t.nodes.filter(col("kind") === NK.Mention)
    val somePages = t.nodes.filter(col("kind") === NK.Page).limit(3)
    val kept = Steps.notInPages(all, somePages.select(col("id").as("pageId")))
    val excludedIds = somePages.collect().map(_.getLong(0)).toSet
    kept.select("pageId").distinct().collect().map(_.getLong(0))
      .toSet.intersect(excludedIds) shouldBe empty
  }

  test("reachable: BFS with depth cap on a handcrafted chain") {
    import spark.implicits._
    val edges = (1L to 10L).sliding(2).map(s =>
      GraphEdge(s(0), s(1), "E", null)).toSeq.toDF()
    val seeds = Seq((1L)).toDF("id")
    Steps.reachable(seeds, edges, Seq("E"), maxDepth = 3)
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 4L)
    Steps.reachable(seeds, edges, Seq("E"), maxDepth = 20)
      .count() shouldBe 10L
  }

  test("reachable backward + first-hop variable restriction") {
    import spark.implicits._
    val edges = Seq(
      GraphEdge(1L, 2L, "R", "x"), GraphEdge(1L, 3L, "R", "y"),
      GraphEdge(2L, 4L, "R", "z")).toDF()
    val seeds = Seq(1L).toDF("id")
    // forward, first hop restricted to var x: 1 -x-> 2 -z-> 4 but not 3
    Steps.reachable(seeds, edges, Seq("R"), 5, forward = true,
      restrictFirstHopVars = Some(Seq("x")))
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 4L)
  }

  test("inducedEdges keeps only edges with both endpoints in the set") {
    import spark.implicits._
    val edges = Seq(GraphEdge(1, 2, "E", null), GraphEdge(2, 3, "E", null),
      GraphEdge(3, 4, "E", null)).toDF()
    val nodeSet = Seq(1L, 2L, 3L).toDF("id")
    Steps.inducedEdges(nodeSet, edges).count() shouldBe 2L
  }

  test("selfReaching finds cycle members only") {
    import spark.implicits._
    val edges = Seq(GraphEdge(1, 2, "E", null), GraphEdge(2, 3, "E", null),
      GraphEdge(3, 1, "E", null), GraphEdge(3, 4, "E", null)).toDF()
    val seeds = Seq(1L, 2L, 3L, 4L).toDF("id")
    Steps.selfReaching(seeds, edges, Seq("E"))
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L)
  }

  test("neighborhood-hash features: deterministic, 16-bit labels") {
    val f1 = Steps.neighborhoodHashFeatures(t.nodes, t.edges, EK.Mentions)
    val f2 = Steps.neighborhoodHashFeatures(t.nodes, t.edges, EK.Mentions)
    val a = f1.collect().map(_.toString).sorted
    a shouldBe f2.collect().map(_.toString).sorted
    f1.agg(max("label")).collect()(0).getLong(0) should be < 65536L
    f1.agg(min("label")).collect()(0).getLong(0) should be >= 0L
  }

  test("forwardSlice over LINKS_TO from mentions reaches entities") {
    val mentions = t.nodes.filter(col("kind") === NK.Mention).limit(10)
    val sliced = Steps.forwardSlice(mentions, t.edges, t.nodes,
      symbols = Nil, depth = 2, kinds = Seq(EK.LinksTo))
    sliced.filter(col("kind") === NK.Entity).count() should be > 0L
  }
}
