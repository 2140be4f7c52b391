package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Materialize

/** Whole-graph analytics over the canonical entity graph — the KG-consumer
  * side the reference's degree/neighborhood steps point at, taken to the two
  * canonical web-scale kernels: PageRank (entity salience) and triangle
  * counting (local clustering). Both are beyond the reference's own step
  * library (its closest analogs are the degree lookups in
  * `joern-lang/misc.groovy` and the NH-kernel feature vectors), and both are
  * designed driver-hashable: no floating-point accumulation anywhere.
  *
  * Scale shape:
  *  - PageRank: per-iteration cost is one equi-join (ranks ⋈ edges on src)
  *    plus one map-side-combinable groupBy(dst) sum — a hub entity's huge
  *    in-degree is absorbed by partial aggregation, never by one task.
  *    Exact INTEGER fixed-point arithmetic (`div`, long sums) makes the
  *    result independent of aggregation order, so a second engine can
  *    re-derive it bit-exactly — float PageRank cannot be hash-compared.
  *  - Triangles: edges oriented low→high (degree, id) endpoint; wedges are
  *    enumerated only at each edge's ≺-smaller vertex, which bounds
  *    per-vertex pair expansion by the oriented out-degree (≤ O(√m)
  *    amortized — the arboricity argument), so the mega-hub contributes no
  *    quadratic bucket. Closure is one equi-join against the undirected
  *    edge set. No window functions anywhere in either kernel.
  */
object GraphAnalytics {

  /** The canonical directed entity graph as (src, dst): entity→entity
    * triples only (obj ≥ 0 — literal objects carry negative slots). The
    * ONE projection every analytics entry/verb runs over. */
  def entityEdges(triples: DataFrame): DataFrame =
    triples.filter(col("obj") >= 0)
      .select(col("subj").as("src"), col("obj").as("dst"))

  /** Exact integer fixed-point PageRank, optionally personalized.
    *
    * Semantics (mirrored verbatim by the DuckDB oracle, all `Long` ops;
    * S = seed set, defaulting to ALL graph nodes = classic PageRank):
    *   perSeed  = totalMass div |S|
    *   base(i)  = perSeed * 15 div 100  if i ∈ S, else 0
    *   r0(i)    = perSeed               if i ∈ S, else 0
    *   r{t+1}(i) = base(i) + (85 * Σ_{j→i} (r_t(j) div outdeg(j))) div 100
    *
    * With seeds, teleport mass returns only to S — the "entities related to
    * X" relatedness query. Dangling mass evaporates (standard
    * simplification; deterministic). Magnitudes: every rank ≤ totalMass and
    * every contribution sum ≤ totalMass, so 85 * sum ≤ 8.5e16 <
    * Long.MaxValue for the default mass — no overflow at any node count,
    * because mass only shrinks.
    *
    * Iterations materialize via [[graft.util.Materialize.iterate]] (reliable
    * checkpoint every Nth round under `spark.graft.reliableCheckpointInterval`
    * — same cluster-fault story as the CC fixpoint).
    */
  def pageRankInt(edges: DataFrame, iters: Int = 10,
                  totalMass: Long = 1000000000000000L,
                  seeds: Option[DataFrame] = None): DataFrame = {
    // the returned frame must be its OWN checkpoint (we release every input
    // frame below); with zero rounds it would still be lazy over them
    require(iters >= 1, "pageRankInt: iters must be >= 1")
    val e = Materialize.pin(edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()) // reused every round: pin it once (reliable under the fault interval)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // pre-partition the (invariant) edge side by the per-round join key ONCE:
    // `e` comes out of distinct() hashed by (src,dst), which would reshuffle
    // the full edge table under every round's ranks join. With src-hash
    // pinned here (localCheckpoint preserves outputPartitioning) and ranks
    // emerging id-hashed from the previous round's node join, each round
    // pays exactly one real shuffle — the contribution groupBy on dst.
    val withDeg = Materialize.pin(e.join(outdeg, "src").repartition(col("src")))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val flagged = (seeds match {
      case Some(s) => nodes.join(
        s.select(col("id")).distinct().withColumn("isSeed", lit(true)),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("isSeed"), lit(false)).as("isSeed"))
      case None => nodes.withColumn("isSeed", lit(true))
    })
    val flaggedP = Materialize.pin(flagged)
    // one bounded driver scalar each (like the CC probe)
    val nSeeds = flaggedP.filter(col("isSeed")).count()
    require(nSeeds > 0, "pageRankInt: empty graph or no seed is a graph node")
    val perSeed = totalMass / nSeeds
    // per-node teleport base — the frame every round's final join reuses
    val nb = Materialize.pin(flaggedP.select(col("id"),
      when(col("isSeed"), lit(perSeed * 15L / 100L)).otherwise(lit(0L)).as("base")))
    var ranks = flaggedP.select(col("id"),
      when(col("isSeed"), lit(perSeed)).otherwise(lit(0L)).as("rank"))
    for (i <- 0 until iters) {
      val old = ranks
      ranks = graft.util.Materialize.iterate(prStep(withDeg, ranks, nb), i)
      // drop the superseded round's checkpoint blocks NOW (same discipline
      // as the CC fixpoint): without this, `iters` copies of the rank table
      // pile up in storage memory and large graphs hit an eviction cliff —
      // measured 8x super-linear at 5M nodes before this line existed
      old.unpersist(false)
    }
    // the result is its own checkpoint; the invariant frames can go too
    e.unpersist(false); withDeg.unpersist(false)
    flaggedP.unpersist(false); nb.unpersist(false)
    ranks
  }

  /** One PageRank round — the exact frame each iteration materializes
    * (factored out so PlanSpec pins its physical shape: partial-agg sum on
    * dst, two equi-joins, no window, no cartesian). `nb` = (id, base). */
  private[graft] def prStep(withDeg: DataFrame, ranks: DataFrame,
                            nb: DataFrame): DataFrame = {
    val contrib = withDeg.join(ranks, col("src") === col("id"))
      .select(col("dst").as("id"), expr("`rank` div `outdeg`").as("c"))
      .groupBy("id").agg(sum("c").as("cx"))
    nb.join(contrib, Seq("id"), "left")
      .select(col("id"),
        (col("base") + expr("(85 * coalesce(cx, 0L)) div 100")).as("rank"))
  }

  /** Exact integer fixed-point HITS (hubs & authorities) over the directed,
    * deduped, self-loop-free projection of `edges`.
    *
    * Semantics (mirrored verbatim by the DuckDB oracle, all `Long` ops):
    *   h0(i)     = scale
    *   aRaw(i)   = Σ_{j→i} h(j);  a(i) = aRaw(i) div (max(aRaw) div scale + 1)
    *   hRaw(i)   = Σ_{i→j} a(j);  h(i) = hRaw(i) div (max(hRaw) div scale + 1)
    *
    * The per-half-round divisor replaces the classic L2 normalization: it
    * keeps every score < scale (the divisor strictly exceeds max/scale), is
    * a pure function of the max — one bounded driver scalar per half-round,
    * the kCore/CC probe pattern — and involves no float, so aggregation
    * order can never change a bit. Ranking converges to the same order as
    * float HITS (both are power iteration on AᵀA / AAᵀ; only the
    * normalization constant differs).
    *
    * Overflow bound: scores < scale after every half-round, so a raw sum is
    * < maxInDegree · scale; the default scale 1e12 is safe to in-degree
    * ~9.2e6 — at web scale pass a smaller scale (the bound is
    * maxDegree · scale < Long.MaxValue).
    *
    * Scale shape: the edge frame is pinned TWICE, pre-partitioned by src and
    * by dst (each half-round joins on a different side — one pinned copy per
    * key means no per-round edge reshuffle); the raw sums are map-side
    * combinable groupBys, so a hub's huge degree is absorbed by partial
    * aggregation. No window functions.
    */
  def hitsInt(edges: DataFrame, iters: Int = 8,
              scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "hitsInt: iters must be >= 1")
    require(scale >= 1L, "hitsInt: scale must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)
    require(!e.isEmpty, "hitsInt: empty graph")
    val eBySrc = e.repartition(col("src")).localCheckpoint(eager = true)
    val eByDst = e.repartition(col("dst")).localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = true)
    e.unpersist(false) // last read above — don't hold a third edge copy all rounds
    // Intermediate scores are SPARSE: a node absent from a gather has score
    // 0, and a 0 row is indistinguishable from an absent row to both the
    // next gather (inner join, contributes 0) and the max divisor — so the
    // per-half-round nodes zero-fill join is dropped entirely (≈2× less
    // per-round work on the probe wheel) and zero-filling happens once, on
    // the final output. Bit-exact equivalent of the dense recurrence the
    // oracle runs.
    var hubs = nodes.select(col("id"), lit(scale).as("score"))
    var auths: DataFrame = null
    for (i <- 0 until iters) {
      val oldH = hubs
      val oldA = auths
      // authority half-round: gather hub mass along edge direction
      val aRaw = gatherSum(eBySrc, hubs, from = "src", to = "dst")
        .localCheckpoint(eager = true) // read twice: max probe + divide
      auths = Materialize.iterate(rescale(aRaw, scale), 2 * i)
      aRaw.unpersist(false)
      // hub half-round: gather authority mass against edge direction
      val hRaw = gatherSum(eByDst, auths, from = "dst", to = "src")
        .localCheckpoint(eager = true)
      hubs = Materialize.iterate(rescale(hRaw, scale), 2 * i + 1)
      hRaw.unpersist(false)
      oldH.unpersist(false)
      if (oldA != null) oldA.unpersist(false)
    }
    val res = nodes
      .join(hubs.withColumnRenamed("score", "hub"), Seq("id"), "left")
      .join(auths.withColumnRenamed("score", "auth"), Seq("id"), "left")
      .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
      .localCheckpoint(eager = true)
    Seq(eBySrc, eByDst, nodes, hubs, auths).foreach(_.unpersist(false))
    res
  }

  /** One HITS gather: Σ of `scores` over the `from` endpoint, keyed by the
    * `to` endpoint — a plain equi-join plus a map-side-combinable sum
    * (factored out so PlanSpec pins the shape: partial agg, no window). */
  private[graft] def gatherSum(e: DataFrame, scores: DataFrame,
                               from: String, to: String): DataFrame = {
    e.join(scores, col(from) === col("id"))
      .groupBy(col(to).as("nid")).agg(sum("score").as("raw"))
  }

  /** Integer renormalization: raw div (max(raw) div scale + 1), sparse —
    * nodes absent from `raw` implicitly score 0 (see hitsInt). The max is a
    * bounded driver scalar. */
  private def rescale(raw: DataFrame, scale: Long): DataFrame = {
    val mRow = raw.agg(max("raw")).head()
    val m = if (mRow.isNullAt(0)) 0L else mRow.getLong(0)
    val d = m / scale + 1L
    // `div` (integer division), NOT `/`: Spark's `/` routes through DOUBLE,
    // which silently rounds above 2^53 and breaks bit-exactness
    raw.select(col("nid").as("id"), expr(s"raw div ${d}L").as("score"))
  }

  /** Synchronous label propagation over the undirected, deduped,
    * self-loop-free projection of `edges`: community detection, the
    * modularity-flavored sibling of the CC canonicalizer.
    *
    * l0(i) = i; each round every node adopts the most frequent label among
    * its neighbors (NOT itself — classic LP), ties broken by the SMALLEST
    * label. Exactly `iters` synchronous rounds (sync LP can 2-cycle on
    * bipartite structure, so bounded rounds ARE the semantics — both the
    * driver twin and the DuckDB oracle run the same count); the
    * (count desc, label asc) argmax makes every round a pure function of the
    * previous labeling, independent of partitioning.
    *
    * Scale shape: per round one equi-join (labels on the neighbor slot) and
    * two map-side-combinable groupBys — the (node, label) count, then a
    * single-pass struct-max argmax (`~label` turns min-label into max, a
    * bijection with no MinValue overflow). A hub's million neighbors are
    * absorbed by partial aggregation; no window functions.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, "labelPropagation: iters must be >= 1")
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // both directions, pre-partitioned ONCE by the per-round join key
    val bi = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
      .repartition(col("nb"))
      .localCheckpoint(eager = true)
    var labels = bi.select(col("node").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (i <- 0 until iters) {
      val old = labels
      labels = Materialize.iterate(lpStep(bi, labels), i)
      old.unpersist(false)
    }
    bi.unpersist(false)
    labels
  }

  /** One LP round (factored for PlanSpec): neighbor-label histogram, then
    * (count desc, label asc) argmax via a single struct-max aggregation. */
  private[graft] def lpStep(bi: DataFrame, labels: DataFrame): DataFrame = {
    val hist = bi
      .join(labels.select(col("id").as("nb"), col("label")), Seq("nb"))
      .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
    val nl = hist
      .select(col("node"),
        struct(col("c"), expr("~ label").as("invLabel")).as("p"))
      .groupBy("node").agg(max("p").as("p"))
      .select(col("node").as("id"), expr("~ p.invLabel").as("newLabel"))
    labels.join(nl, Seq("id"), "left")
      .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
  }

  /** The k-core of the undirected, deduped, self-loop-free projection of
    * `edges`: iteratively peel nodes of degree < k until none remain, and
    * return the survivors as (id, deg) with deg = degree INSIDE the core.
    * The k-core is unique, so the synchronous distributed rounds here and
    * the oracle's sequential queue peel must agree exactly.
    *
    * Round shape: degree = partial-agg count; the weak set is usually tiny
    * and eagerly materialized (exact stats → broadcast anti-joins), so one
    * round is two broadcast anti-joins plus one groupBy — no windows, and a
    * hub's degree is summed map-side. Termination = empty weak set
    * (bounded driver probe per round, the CC changed-count pattern).
    */
  def kCore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    var cur = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = true)
    var it = 0
    var done = false
    while (!done) {
      val deg = cur.select(col("u").as("id"))
        .union(cur.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val weak = deg.filter(col("deg") < k).select("id")
        .localCheckpoint(eager = true) // tiny in practice; exact stats
      if (weak.isEmpty) done = true
      else {
        val old = cur
        cur = graft.util.Materialize.iterate(
          cur.join(weak.withColumnRenamed("id", "u"), Seq("u"), "left_anti")
            .join(weak.withColumnRenamed("id", "v"), Seq("v"), "left_anti")
            .select("u", "v"), it)
        old.unpersist(false)
      }
      weak.unpersist(false)
      it += 1
    }
    val res = cur.select(col("u").as("id"))
      .union(cur.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    cur.unpersist(false)
    res
  }

  /** Per-entity triangle and wedge counts over the undirected, deduped,
    * self-loop-free projection of `edges` (src, dst).
    *
    * Output: (id, deg, wedges, triangles) — all integer columns, so the
    * local clustering coefficient 2·T/(deg·(deg−1)) is a consumer-side
    * division and the driver hash stays exact.
    *
    * `materialize = false` (tests only) returns the lazy census so PlanSpec
    * can pin the physical shape — the default path materializes and
    * releases the edge-sized invariant frames (cappedPairs pattern).
    */
  def triangleCounts(edges: DataFrame, materialize: Boolean = true): DataFrame = {
    // the lazy (plan-inspection) path checkpoints NOTHING — eager blocks it
    // could never release would leak for the session's lifetime
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(eager = true) else df
    val und = pin(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()) // feeds degree, orientation AND closure
    val deg = pin(und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg")))
    // orient toward the (deg, id)-larger endpoint: wedges form only at the
    // ≺-min vertex, so the hub (≺-max on every incident edge) expands nothing
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pin(und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(when(uFirst, col("u")).otherwise(col("v")).as("s"),
        when(uFirst, col("v")).otherwise(col("u")).as("t"))) // both sides of the wedge self-join
    val wedge = oriented.select(col("s"), col("t").as("a"))
      .join(oriented.select(col("s"), col("t").as("b")), "s")
      .filter(col("a") < col("b"))
    // close each wedge against the undirected edge set: a < b by id, und is
    // (u < v) by id, so closure is a plain two-key equi-join
    val tri = wedge.join(und,
      col("a") === col("u") && col("b") === col("v"), "inner")
      .select("s", "a", "b")
    // one pass over the (expensive) closed-wedge join: explode the three
    // corners instead of unioning three scans of `tri`
    val perNode = tri
      .select(explode(array(col("s"), col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val census = deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        expr("(deg * (deg - 1)) div 2").as("wedges"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
    if (!materialize) census
    else {
      // materialize the (node-sized) census and release the edge-sized
      // invariant frames — same block discipline as pageRankInt
      val res = census.localCheckpoint(eager = true)
      und.unpersist(false); deg.unpersist(false); oriented.unpersist(false)
      res
    }
  }

  /** Degree histogram (deg, n_nodes) of the undirected, deduped,
    * self-loop-free projection of `edges` — the power-law census every
    * web-graph paper opens with. Two map-side-combinable groupBys; the
    * mega-hub contributes one row to the tail, never a hot task. */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
  }

  /** Structural entity-resolution candidates: pairs of entities whose
    * neighborhoods in the undirected, deduped, self-loop-free projection of
    * `edges` overlap — the canonicalizer's refinement pass ("two names that
    * link to the same things are candidates for the same thing"), the graph
    * sibling of the alias-dictionary linker.
    *
    * Semantics (mirrored verbatim by the DuckDB oracle, all integer):
    * a *witness* is a shared neighbor w ∈ N(u) ∩ N(v) with deg(w) ≤ hubCap
    * (a neighbor shared by everything — the mega-hub — is uninformative,
    * the stop-word of similarity joins, and dropping it is what bounds the
    * pair blowup). Output (u, v, inter, du, dv) for pairs with
    *   inter ≥ minInter  AND  inter · jacDen ≥ jacNum · (du + dv − inter)
    * where inter = witness count and du/dv are FULL degrees — the Jaccard
    * test is the cross-multiplied integer form, so no float ever appears
    * and the driver hash is exact. Consumers divide for the real ratio.
    *
    * Scale shape: hub witnesses are found by a partial-agg degree count and
    * removed with one anti-join (NOT a window cap — the verdict's hot-bucket
    * rule); the witness self-join is equi on w with per-key width ≤ hubCap;
    * the pair count is a map-side-combinable groupBy. No windows anywhere.
    */
  def sameAsCandidates(edges: DataFrame, minInter: Int = 2, jacNum: Int = 1,
                       jacDen: Int = 4, hubCap: Long = 1000L,
                       materialize: Boolean = true): DataFrame = {
    require(minInter >= 1, "sameAsCandidates: minInter must be >= 1")
    require(jacNum >= 0 && jacDen >= 1, "sameAsCandidates: bad jaccard ratio")
    require(hubCap >= 1, "sameAsCandidates: hubCap must be >= 1")
    // lazy (plan-inspection) path checkpoints nothing — triangleCounts rule
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(eager = true) else df
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val bi = pin(und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))) // feeds degree AND the inverted index
    val deg = pin(bi.groupBy("node").agg(count(lit(1)).as("deg"))) // read 3×: hub drop + both denominators
    // inverted index witness → member, hub witnesses anti-joined away
    val inv = pin(bi.select(col("nb").as("w"), col("node"))
      .join(deg.filter(col("deg") > hubCap).select(col("node").as("w")),
        Seq("w"), "left_anti")) // read twice: both sides of the pair join
    val pairs = inv.select(col("w"), col("node").as("u"))
      .join(inv.select(col("w"), col("node").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("inter"))
    val cand = pairs
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .filter(col("inter") >= minInter &&
        col("inter") * jacDen >= (col("du") + col("dv") - col("inter")) * jacNum)
      .select("u", "v", "inter", "du", "dv")
    if (!materialize) cand
    else {
      val res = cand.localCheckpoint(eager = true)
      Seq(bi, deg, inv).foreach(_.unpersist(false))
      res
    }
  }

  /** Strongly connected components of the directed, deduped, self-loop-free
    * projection of `edges` — the web's bow-tie kernel. Output (id, scc)
    * with scc = the SCC's minimum member id (the partition is unique, so
    * this labeling is canonical and rowwise-comparable against a sequential
    * Tarjan).
    *
    * Algorithm: trim + deterministic forward-backward splitting.
    * Each outer round, over the current node partition (`part` labels):
    *   1. TRIM to fixpoint: a node with no in- or no out-edge INSIDE its
    *      part is a singleton SCC — emit and drop (kCore's peel shape:
    *      partial-agg distincts + semi/anti joins).
    *   2. Per part, pivot = min id (one partial-agg groupBy). Propagate
    *      fwd/bwd reachability flags from the pivot along within-part
    *      edges to fixpoint (wavefront = semi-join + map-side-combinable
    *      distinct; termination = flag-count unchanged, the CC
    *      changed-count pattern — one bounded driver scalar per round).
    *   3. fwd ∧ bwd = the pivot's SCC — emit with scc = pivot. The rest
    *      splits into (fwd-only, bwd-only, neither); new part label = the
    *      sub-group's min id (deterministic, collision-free — no hash).
    * Edges crossing parts can never close a cycle again and are dropped by
    * the per-round within-part filter.
    *
    * Rounds: trim depth is the DAG peeling depth, FW-BW depth is the
    * reach diameter, outer rounds the SCC nesting depth — all small on
    * web-shaped graphs (same caveat class as kCore). Every step is an
    * equi-join or partial aggregation; no windows; a mega-hub's fan-in
    * collapses in map-side combine. Requires a non-empty edge set.
    */
  def scc(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)
    require(!e0.isEmpty, "scc: empty graph")
    val res = sccCanonical(e0)
    e0.unpersist(false)
    res
  }

  /** scc body over an already canonical (deduped, self-loop-free, pinned)
    * edge frame — shared with bowTie so the canonicalization shuffle and
    * the pinned edge copy are paid once. */
  private def sccCanonical(e0: DataFrame): DataFrame = {
    var active = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .select(col("id"), lit(0L).as("part"))
      .localCheckpoint(eager = true)
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (!active.isEmpty) {
      // within-part edge set for this round
      var aE = e0
        .join(active.select(col("id").as("src"), col("part").as("ps")), Seq("src"))
        .join(active.select(col("id").as("dst"), col("part").as("pd")), Seq("dst"))
        .filter(col("ps") === col("pd"))
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = true)
      // 1. trim to fixpoint
      var nActive = active.count()
      var trimming = true
      while (trimming) {
        val keep = active
          .join(aE.select(col("src").as("id")).distinct(), Seq("id"), "left_semi")
          .join(aE.select(col("dst").as("id")).distinct(), Seq("id"), "left_semi")
          .localCheckpoint(eager = true)
        val nKeep = keep.count()
        if (nKeep == nActive) { keep.unpersist(false); trimming = false }
        else {
          out += active.join(keep.select("id"), Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc"))
            .localCheckpoint(eager = true)
          active.unpersist(false); active = keep; nActive = nKeep
          val oldE = aE
          aE = aE
            .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .localCheckpoint(eager = true)
          oldE.unpersist(false)
        }
      }
      if (nActive == 0L) { aE.unpersist(false) }
      else {
        // 2. pivot reach closures — frontier BFS over the within-part edge
        // set. Parts are disjoint and aE edges never cross parts, so ONE
        // closure from the union of all pivots equals the per-part
        // closures run simultaneously.
        val pivots = active.groupBy("part").agg(min(col("id")).as("pivot"))
          .localCheckpoint(eager = true)
        val seeds = pivots.select(col("pivot").as("id"))
        val fwd = reachClosure(aE, seeds, forward = true)
        val bwd = reachClosure(aE, seeds, forward = false)
        // 3. emit the pivot SCCs (fwd ∩ bwd), split the rest
        val inBoth = fwd.join(bwd, Seq("id"), "left_semi")
        out += active.join(inBoth, Seq("id"), "left_semi")
          .join(pivots, Seq("part")).select(col("id"), col("pivot").as("scc"))
          .localCheckpoint(eager = true)
        val rest = active.join(inBoth, Seq("id"), "left_anti")
          .join(fwd.withColumn("fIn", lit(true)), Seq("id"), "left")
          .join(bwd.withColumn("bIn", lit(true)), Seq("id"), "left")
          .select(col("id"), col("part"),
            col("fIn").isNotNull.as("fwd"), col("bIn").isNotNull.as("bwd"))
        val np = rest.groupBy("part", "fwd", "bwd").agg(min("id").as("npart"))
        val oldActive = active
        active = rest.join(np, Seq("part", "fwd", "bwd"))
          .select(col("id"), col("npart").as("part"))
          .localCheckpoint(eager = true)
        Seq(oldActive, pivots, fwd, bwd, aE).foreach(_.unpersist(false))
      }
      outer += 1
    }
    active.unpersist(false)
    val res = out.reduce(_ unionByName _).localCheckpoint(eager = true)
    out.foreach(_.unpersist(false))
    res
  }

  /** Bow-tie decomposition (Broder et al.'s web-graph macro-structure) of
    * the directed, deduped, self-loop-free projection of `edges`:
    * every node classified as
    *   CORE — member of the LARGEST SCC (ties broken by smaller scc label,
    *          so the pick is deterministic),
    *   IN   — reaches the core but is not in it,
    *   OUT  — reachable from the core but not in it,
    *   OTHER — everything else (tendrils, tubes, disconnected).
    * Output (id, region) — rowwise-checked against a sequential BFS twin
    * over the Tarjan dump.
    *
    * Composition: one scc() pass, then two BFS fixpoints seeded at the
    * core (backward for IN, forward for OUT) — wavefront = semi-join +
    * map-side-combinable distinct, changed-count termination; rounds =
    * reach diameter. The giant-SCC pick is a partial-agg count.
    */
  def bowTie(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)
    require(!e0.isEmpty, "bowTie: empty graph")
    val s = sccCanonical(e0) // reuse the pinned canonical edge frame
    // largest SCC, deterministic tie-break on the smaller label
    val coreRow = s.groupBy("scc").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("scc").asc).head()
    val coreId = coreRow.getLong(0)
    val core = s.filter(col("scc") === lit(coreId)).select("id")
      .localCheckpoint(eager = true)
    val toCore = reachClosure(e0, core, forward = false) // core ∪ who reaches it
    val fromCore = reachClosure(e0, core, forward = true) // core ∪ whom it reaches
    val res = s.select("id")
      .join(core.withColumn("inCore", lit(true)), Seq("id"), "left")
      .join(toCore.withColumn("inTo", lit(true)), Seq("id"), "left")
      .join(fromCore.withColumn("inFrom", lit(true)), Seq("id"), "left")
      .select(col("id"),
        when(col("inCore").isNotNull, "CORE")
          .when(col("inTo").isNotNull, "IN")
          .when(col("inFrom").isNotNull, "OUT")
          .otherwise("OTHER").as("region"))
      .localCheckpoint(eager = true)
    Seq(e0, s, core, toCore, fromCore).foreach(_.unpersist(false))
    res
  }

  /** Deterministic shortest path between two entities over the directed,
    * deduped, self-loop-free projection of `edges` — the "how are X and Y
    * related?" query. BFS guarantees minimal hop count; among equal-length
    * paths the MIN-parent rule at every level makes the returned path
    * unique (a pure function of the graph, partition-invariant).
    *
    * Scale shape: frontier rounds are one equi-join + a min-parent groupBy
    * (map-side combine at in-degree hubs) + one anti-join against visited;
    * the found-check is a bounded driver scalar per round, and backtracking
    * touches pathLength singleton lookups. Returns None when `to` is not
    * reachable within `maxDepth` hops. */
  /** Above this many visited nodes the backtrack falls back to per-hop
    * lookups instead of one driver-side collect (~64 MB of (id, parent)
    * longs at the cap — the same driver-budget argument as
    * Pipeline.CanonBroadcastCutover). */
  val BacktrackCollectCap: Long = 4000000L

  def shortestPath(edges: DataFrame, from: Long, to: Long,
                   maxDepth: Int = 30): Option[Seq[Long]] = {
    require(maxDepth >= 1, "shortestPath: maxDepth must be >= 1")
    if (from == to) return Some(Seq(from))
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)
    // visited carries the chosen (min) BFS parent per node; the seed's
    // parent slot is unused
    var visited = spark.range(1)
      .select(lit(from).as("id"), lit(from).as("parent"))
      .localCheckpoint(eager = true)
    var frontier = visited.select("id")
    var frontPin: DataFrame = null // the checkpoint backing the frontier
    var found = false
    var done = false
    var depth = 0
    var visitedCount = 1L
    while (!found && !done && depth < maxDepth) {
      val next = Materialize.iterate(
        e.join(frontier.select(col("id").as("src")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("src")).as("parent"))
          .join(visited.select("id"), Seq("id"), "left_anti"), depth)
      // ONE scan answers both "dead end?" and "target reached?"
      val probe = next.agg(count(lit(1)),
        max(when(col("id") === lit(to), 1).otherwise(0))).head()
      if (probe.getLong(0) == 0L) { next.unpersist(false); done = true }
      else {
        visitedCount += probe.getLong(0)
        found = probe.getInt(1) == 1
        val old = visited
        visited = Materialize.iterate(visited.union(next), depth)
        old.unpersist(false)
        if (frontPin != null) frontPin.unpersist(false)
        frontPin = next
        frontier = next.select("id")
      }
      depth += 1
    }
    val res = if (!found) None
    else if (visitedCount <= BacktrackCollectCap) {
      // backtrack with ONE action: the visited set fits a driver map (the
      // common case for a ≤30-hop relatedness query — the round probes above
      // tracked its exact size), so chase the ≤ maxDepth parent hops in
      // memory instead of issuing one sequential Spark job per hop
      import org.apache.spark.sql.Row
      val parentOf = new scala.collection.mutable.LongMap[Long](visitedCount.toInt * 2)
      visited.select("id", "parent").collect().foreach {
        case Row(id: Long, parent: Long) => parentOf.update(id, parent)
      }
      var path = List(to)
      while (path.head != from) path = parentOf(path.head) :: path
      Some(path)
    } else {
      // bounded-memory fallback past the cap: pathLength singleton lookups
      // against the pinned visited frame (a BFS parent chain never revisits
      // a node), ≤ maxDepth jobs
      var path = List(to)
      while (path.head != from) {
        path = visited.filter(col("id") === path.head).head().getLong(1) :: path
      }
      Some(path)
    }
    e.unpersist(false); visited.unpersist(false)
    if (frontPin != null) frontPin.unpersist(false)
    res
  }

  /** BFS closure from `seeds` over `edges`, seeds included: forward = true
    * follows src→dst, false follows dst→src. Frontier expansion (the
    * Steps.reachable shape): each round touches only the NEW wavefront's
    * edges — a frontier semi-join + map-side-combinable distinct + one
    * anti-join against the visited set — and stops on an empty frontier.
    * Returns a single-column (id) frame, eagerly materialized. */
  private[graft] def reachClosure(edges: DataFrame, seeds: DataFrame,
                                  forward: Boolean): DataFrame = {
    val (from, to) = if (forward) ("src", "dst") else ("dst", "src")
    var visited = seeds.select("id").localCheckpoint(eager = true)
    var frontier = visited
    var it = 0
    var done = false
    while (!done) {
      val next = Materialize.iterate(
        edges.join(frontier.select(col("id").as(from)), Seq(from), "left_semi")
          .select(col(to).as("id")).distinct()
          .join(visited, Seq("id"), "left_anti"), it)
      if (next.isEmpty) { next.unpersist(false); done = true }
      else {
        val old = visited
        visited = Materialize.iterate(visited.union(next), it)
        old.unpersist(false)
        if (frontier ne old) frontier.unpersist(false)
        frontier = next
      }
      it += 1
    }
    // the loop exits on an empty `next` with the last NON-empty frontier
    // still checkpointed — release it (it is only the seed/visited frame on
    // a zero-expansion run, which is the returned frame and must stay)
    if (frontier ne visited) frontier.unpersist(false)
    visited
  }
}
