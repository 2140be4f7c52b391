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

  test("neighborhood-hash via cached seed frames == direct path") {
    // the session cache (Queries.nhashFrames) reuses frames across kernel
    // runs — the split path must be bit-identical to the one-shot path
    val direct = Steps.neighborhoodHashFeatures(t.nodes, t.edges, EK.Mentions,
      onKinds = Some(Seq(NK.Page, NK.Mention)))
    val (ini, e) = Steps.neighborhoodHashFrames(t.nodes, t.edges, EK.Mentions,
      Some(Seq(NK.Page, NK.Mention)))
    val fromFrames = Steps.neighborhoodHashFeaturesFrom(ini, e)
    // run the frames path TWICE — reuse must not perturb the result
    val a = fromFrames.collect().map(_.toString).sorted
    a shouldBe Steps.neighborhoodHashFeaturesFrom(ini, e)
      .collect().map(_.toString).sorted
    a shouldBe direct.collect().map(_.toString).sorted
    ini.unpersist(false); e.unpersist(false)
  }

  test("siblings: co-children of the same parent, origin excluded per path") {
    val m = t.nodes.filter(col("kind") === NK.Mention).limit(1)
    val origin = m.head().getLong(0)
    val pid = m.head().getAs[Long]("pageId")
    val sibs = Steps.siblings(m, t.edges, t.nodes, EK.Mentions).collect()
    sibs.map(_.getLong(0)) should not contain origin
    // siblings over MENTIONS = every other mention of the same page
    val expected = t.nodes.filter(col("kind") === NK.Mention &&
      col("pageId") === pid && col("id") =!= origin).count()
    sibs.length.toLong shouldBe expected
  }

  test("apiSyms: symbol codes of the input pages, kind-set filtered") {
    val p = t.nodes.filter(col("kind") === NK.Page).limit(2)
    val syms = Steps.apiSyms(p, t.nodes)
    syms.columns shouldBe Array("code")
    syms.count() should be > 0L
    // restricting the kind set shrinks (or keeps) the result
    Steps.apiSyms(p, t.nodes, Seq(NK.Mention)).count() should be <= syms.count()
  }

  test("descriptor combinators: calls/checks/codeMatches compose with filter") {
    val aMention = t.nodes.filter(col("kind") === NK.Mention).head()
    val lit0 = aMention.getString(2).take(3) // a literal that occurs
    val called = t.nodes.filter(Steps.callsDescriptor(lit0))
    called.count() should be > 0L
    called.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.Mention)
    // regex metacharacters in the literal are quoted, not interpreted
    t.nodes.filter(Steps.callsDescriptor("never(matches)+[anything]")).count() shouldBe 0L
    val checked = t.nodes.filter(Steps.checksDescriptor(""))
    checked.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.TripleN)
    // codeMatches: %s slot receives the QUOTED literal
    t.nodes.filter(Steps.codeMatchesDescriptor(".*%s.*", lit0)).count() should be >= called.count()
    t.nodes.filter(Steps.codeMatchesDescriptor("^$", "ignored")).count() shouldBe 0L
  }

  test("matchParents: containment ancestors filtered by predicate") {
    val m = t.nodes.filter(col("kind") === NK.Mention).limit(1)
    val pid = m.head().getAs[Long]("pageId")
    // a mention's ancestors: its page, the page's host, the host's domain
    val all = Steps.matchParents(m, t.edges, t.nodes, lit(true)).collect()
    all.map(_.getString(1)).toSet shouldBe Set(NK.Page, NK.Host, NK.Domain)
    all.find(_.getString(1) == NK.Page).get.getLong(0) shouldBe pid
    // predicate filters in-walk
    val onlyHosts = Steps.matchParents(m, t.edges, t.nodes, col("kind") === NK.Host)
    onlyHosts.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.Host)
  }

  test("argOfCalls: SUBJ/OBJ slot navigation by predicate name") {
    val aTriple = t.nodes.filter(col("kind") === NK.TripleN).head()
    val pred = aTriple.getString(2)
    val subj = Steps.argOfCalls(t.nodes, t.edges, pred, 0)
    subj.count() should be > 0L
    subj.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.Mention)
    an[IllegalArgumentException] should be thrownBy
      Steps.argOfCalls(t.nodes, t.edges, pred, 2)
  }

  test("param/params/noMoreChildren/isStatement helpers") {
    val params = Steps.paramDescriptor(t.nodes, ".+")
    params.select("kind").distinct().collect().map(_.getString(0)) shouldBe Array(NK.Mention)
    Steps.paramsToNames(params).columns shouldBe Array("name")
    val types = Steps.paramsToTypes(params)
    types.columns shouldBe Array("type")
    types.filter(col("type").isNotNull).count() should be > 0L
    // leaves of the MENTIONS relation = everything but Page nodes
    val leaves = Steps.noMoreChildren(t.nodes, t.edges, EK.Mentions)
    leaves.filter(col("kind") === NK.Page).count() shouldBe 0L
    leaves.filter(col("kind") === NK.Mention).count() should be > 0L
    t.nodes.filter(Steps.isStatementCol).select("kind").distinct()
      .collect().map(_.getString(0)) shouldBe Array(NK.Mention)
  }

  test("nhash onKinds: restriction drops only out-of-frame rows") {
    import spark.implicits._
    val inKinds = Seq(NK.Page, NK.Mention)
    val full = Steps.neighborhoodHashFeatures(t.nodes, t.edges, EK.Mentions)
    val restricted = Steps.neighborhoodHashFeatures(t.nodes, t.edges, EK.Mentions,
      onKinds = Some(inKinds))
    // out-of-frame nodes are never a MENTIONS dst, so running the kernel on
    // them alone (same edge set) yields their rotate-only labels; adding that
    // bag back to the restricted bag must reproduce the full result exactly
    val outFrame = Steps.neighborhoodHashFeatures(
      t.nodes.filter(!col("kind").isin(inKinds: _*)), t.edges, EK.Mentions)
    val recombined = restricted.unionByName(outFrame)
      .groupBy("pageId", "label").agg(sum("count").as("count"))
    recombined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted shouldBe
      full.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    restricted.count() should be < full.count()
  }

  test("nhash: duplicate node/edge rows are one identity, not an XOR-cancel") {
    import spark.implicits._
    // one parent (id 10) with one child (id 20) on page 1 — and the same
    // rows again (the same-url-ingested-twice shape). Without the identity
    // dedup the two self rows of id 10 cancel each other's rotation inside
    // the per-round aggregation, and the duplicated edge cancels the
    // child's contribution.
    val n1 = Seq((10L, "Page", "u", 1L, 0), (20L, "Mention", "m", 1L, 0))
      .toDF("id", "kind", "code", "pageId", "childNum")
      .withColumn("props", map())
    val nodesDup = n1.unionByName(n1)
    val e1 = Seq((10L, 20L, "MENTIONS")).toDF("src", "dst", "kind")
      .withColumn("variable", lit(null).cast("string"))
      .withColumn("label", lit(null).cast("string"))
    val edgesDup = e1.unionByName(e1)
    val clean = Steps.neighborhoodHashFeatures(n1, e1, "MENTIONS")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val duped = Steps.neighborhoodHashFeatures(nodesDup, edgesDup, "MENTIONS")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    duped shouldBe clean
  }

  test("unsanitizedPairs: kill nodes, depth cap, endpoints exempt") {
    import spark.implicits._
    // handcrafted page 1: chain 1->2->3->4->5, branch 2->6->4 (bypass)
    def nd(id: Long) = GraphNode(id, NK.Mention, s"m$id", 1L, id.toInt, Map.empty)
    val nodes = (1L to 6L).map(nd).toDF()
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(2L,6L),(6L,4L))
      .map { case (a, b) => GraphEdge(a, b, "E", null) }.toDF()
    def run(pairs: Seq[(Long, Long)], kill: Seq[Long], depth: Int = 30) =
      Steps.unsanitizedPairs(nodes, edges,
        pairs.map { case (a, b) => (1L, a, b) }.toDF("pageId", "src", "dst"),
        kill.toDF("id"), Seq("E"), maxDepth = depth)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // clean path exists
    run(Seq((1L, 5L)), Nil) shouldBe Set((1L, 5L, 4))
    // killing 3 still passes via the 2->6->4 bypass (longer path found)
    run(Seq((1L, 5L)), Seq(3L)).map(t => (t._1, t._2)) shouldBe Set((1L, 5L))
    // killing the only junction (2) blocks everything
    run(Seq((1L, 5L)), Seq(2L)) shouldBe Set.empty
    // endpoints are exempt from the kill set (sink may match the sanitizer)
    run(Seq((1L, 5L)), Seq(1L, 5L)).map(t => (t._1, t._2)) shouldBe Set((1L, 5L))
    // depth cap kills long paths (semantic cap, dataflow.groovy:157-158)
    run(Seq((1L, 5L)), Nil, depth = 3) shouldBe Set.empty
    // src == dst is a trivial path
    run(Seq((4L, 4L)), Nil) shouldBe Set((4L, 4L, 0))
  }

  test("kg NEXT_MENTION chain: one linear chain per page") {
    import spark.implicits._
    val chain = t.edges.filter(col("kind") === EK.NextMention)
    // every mention has at most one successor and one predecessor
    chain.groupBy("src").count().filter(col("count") > 1).count() shouldBe 0L
    chain.groupBy("dst").count().filter(col("count") > 1).count() shouldBe 0L
    // chain length per page = mentions - 1
    val mCnt = t.flat.filter(col("rowKind") === "m")
      .groupBy("pageId").count().withColumnRenamed("count", "nm")
    val cCnt = chain.join(t.nodes.filter(col("kind") === NK.Mention)
        .select(col("id").as("src"), col("pageId")), "src")
      .groupBy("pageId").count().withColumnRenamed("count", "nc")
    mCnt.join(cCnt, "pageId").filter(col("nc") =!= col("nm") - 1).count() shouldBe 0L
  }

  test("longestMatchPerPage: substring-contained codes dropped, page-scoped") {
    import spark.implicits._
    val nodes = Seq(
      GraphNode(1L, NK.Mention, "John Smith", 1L, 0, Map.empty),
      GraphNode(2L, NK.Mention, "Smith", 1L, 1, Map.empty),     // contained in 1
      GraphNode(3L, NK.Mention, "Johnson", 1L, 2, Map.empty),   // NOT contained
      GraphNode(4L, NK.Mention, "John Smith", 1L, 3, Map.empty),// exact dup: kept
      GraphNode(5L, NK.Mention, "Smith", 2L, 0, Map.empty)      // other page: kept
    ).toDF()
    Steps.longestMatchPerPage(nodes).select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L, 4L, 5L)
  }

  test("domain hierarchy: Domain nodes parent Host nodes") {
    val domains = t.nodes.filter(col("kind") === NK.Domain)
    domains.count() should be > 0L
    domains.select("code").collect().foreach(_.getString(0) should include("example"))
    // every host has exactly one parent domain edge
    val hosts = t.nodes.filter(col("kind") === NK.Host).count()
    t.edges.filter(col("kind") === EK.IsParentHost).count() shouldBe hosts
    // Steps navigation: domain -> hosts hop works
    val d = domains.limit(1)
    Steps.out(d, t.edges, t.nodes, EK.IsParentHost)
      .select("kind").head().getString(0) shouldBe NK.Host
  }

  test("withLocationLabel denormalizes page url into a location string") {
    val labeled = Steps.withLocationLabel(t.nodes)
    val m = labeled.filter(col("kind") === NK.Mention).limit(1).head()
    m.getAs[String]("location") should fullyMatch regex "https://.*:\\d+"
    // page-less nodes (Host/Entity) get the "?" placeholder
    Steps.withLocationLabel(t.nodes).filter(col("kind") === NK.Host)
      .head().getAs[String]("location") should startWith ("?:")
  }

  test("zipPairs zips two result sets in order") {
    import spark.implicits._
    val x = Seq((1L, "a"), (2L, "b")).toDF("id", "vx")
    val y = Seq((10L, "p"), (20L, "q")).toDF("id", "vy")
    val z = Steps.zipPairs(x, y).orderBy(col("first.id"))
      .select(col("first.vx"), col("second.vy")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    z shouldBe Array(("a", "p"), ("b", "q"))
  }

  test("forwardSlice over LINKS_TO from mentions reaches entities") {
    val mentions = t.nodes.filter(col("kind") === NK.Mention).limit(10)
    val sliced = Steps.forwardSlice(mentions, t.edges, t.nodes,
      symbols = Nil, depth = 2, kinds = Seq(EK.LinksTo))
    sliced.filter(col("kind") === NK.Entity).count() should be > 0L
  }

  test("chainSliceByInterval equals the iterative NEXT_MENTION slice") {
    val seeds = t.nodes.filter(col("kind") === NK.Mention && col("childNum") === 7)
    val interval = Steps.chainSliceByInterval(t.nodes, seeds, depth = 5)
      .select("id").collect().map(_.getLong(0)).sorted
    val iterative = Steps.forwardSlice(seeds, t.edges, t.nodes,
      symbols = Nil, depth = 5, kinds = Seq(EK.NextMention))
      .select("id").distinct().collect().map(_.getLong(0)).sorted
    interval should not be empty
    interval shouldBe iterative
  }

  test("shortestUnsanitized: DAG shortcut beats the chain, kills respected") {
    import spark.implicits._
    // page graph: 1 -> 2 -> 3 -> 4 (chain), plus 1 -> 3 (same-sentence skip);
    // node 2 is a kill — only the skip path survives: 1 -> 3 -> 4, dist 2
    val nodes = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("id", "pageId")
    val edges = Seq((1L, 2L, "N"), (2L, 3L, "N"), (3L, 4L, "N"), (1L, 3L, "S"))
      .toDF("src", "dst", "kind").withColumn("variable", lit(null).cast("string"))
    val pairs = Seq((10L, 1L, 4L)).toDF("pageId", "src", "dst")
    val kills = Seq(Tuple1(2L)).toDF("id")
    val hit = Steps.shortestUnsanitized(nodes, edges, pairs, kills, Seq("N", "S"))
      .collect()
    hit.map(r => (r.getLong(1), r.getLong(2), r.getInt(3))) shouldBe Array((1L, 4L, 2))
    // without the skip edge the kill blocks everything
    val hit2 = Steps.shortestUnsanitized(nodes, edges.filter(col("kind") === "N"),
      pairs, kills, Seq("N", "S")).collect()
    hit2 shouldBe empty
    // arriving AT a kill dst is allowed (kills block expansion, not arrival)
    val hit3 = Steps.shortestUnsanitized(nodes, edges, pairs,
      Seq(Tuple1(4L)).toDF("id"), Seq("N", "S")).collect()
    hit3.map(_.getInt(3)) shouldBe Array(2)
  }

  test("graphletReach: neighborhood size and condition flag per seed") {
    import spark.implicits._
    // star + tail: seed 1 -> {2, 3}, 3 -> 4 -> 5 -> 6; depth 3 reaches
    // {1,2,3,4,5} (6 is 4 hops); condition node 5 is inside
    val nodes = (1L to 6L).map((_, 10L)).toDF("id", "pageId")
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst").withColumn("kind", lit("N"))
      .withColumn("variable", lit(null).cast("string"))
    val seeds = Seq((10L, 1L)).toDF("pageId", "seed")
    val run = Steps.graphletReach(nodes, edges, seeds,
      Seq(Tuple1(5L)).toDF("id"), Seq("N"), depth = 3).collect()
    run.map(r => (r.getLong(1), r.getLong(2), r.getInt(3))) shouldBe Array((1L, 5L, 1))
    // condition node outside the 3-hop ball -> flag 0
    val run2 = Steps.graphletReach(nodes, edges, seeds,
      Seq(Tuple1(6L)).toDF("id"), Seq("N"), depth = 3).collect()
    run2.map(r => (r.getLong(2), r.getInt(3))) shouldBe Array((5L, 0))
  }
}
