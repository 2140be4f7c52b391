package graft

/** DuckDB oracle SQL for every query over the KG pipeline, the multimodal
  * plumbing and the signature-based dedup operators.
  *
  * Philosophy (mirrors the reference's output-vs-recompute tests, see
  * [[VerifyOracle]]): the LEAF facts (per-page extraction output, union-find
  * components, per-doc signatures, media metadata) come from the
  * single-threaded dump; everything DOWNSTREAM of the leaves — graph-table
  * assembly, canonical mapping, traversals, banding, hamming, argmax — is
  * re-derived HERE in closed-form SQL, so a second engine independently
  * recomputes every relational derivation the Spark plan performs.
  *
  * `{{ORA}}` is substituted by graft.Verify with the absolute dump dir.
  */
object KgOracleSql {

  private val P = "read_parquet('{{ORA}}/pages/*.parquet')"
  private val M = "read_parquet('{{ORA}}/mentions/*.parquet')"
  private val RT = "read_parquet('{{ORA}}/rawtriples/*.parquet')"
  private val C = "read_parquet('{{ORA}}/components/*.parquet')"
  private val H = "read_parquet('{{ORA}}/hosts/*.parquet')"
  private val L = "read_parquet('{{ORA}}/labelmap/*.parquet')"
  private val MEDIA = "read_parquet('{{ORA}}/media/*.parquet')"
  private val KCORE = "read_parquet('{{ORA}}/kcore/*.parquet')"
  private val SCC = "read_parquet('{{ORA}}/scc/*.parquet')"
  private val BOWTIE = "read_parquet('{{ORA}}/bowtie/*.parquet')"
  private val SIG = "read_parquet('{{ORA}}/docsigs/*.parquet')"
  private val CRM = "read_parquet('{{ORA}}/components_rm/*.parquet')"
  private val RMU = "read_parquet('{{ORA}}/removed_urls/*.parquet')"

  /** Leaf CTEs shared by the graph-shaped oracles. */
  private val leaves =
    s"""p AS (SELECT * FROM $P),
       |h AS (SELECT * FROM $H),
       |m AS (SELECT * FROM $M),
       |rt AS (SELECT * FROM $RT),
       |c AS (SELECT * FROM $C)""".stripMargin

  /** SQL twin of Pipeline.graphTables' node union (props dropped). */
  private val nodesUnion =
    """SELECT pageId AS id, 'Page' AS kind, url AS code, pageId AS "pageId", 0 AS "childNum" FROM p
      |UNION ALL SELECT hostId, 'Host', host, 0, 0 FROM h
      |UNION ALL SELECT DISTINCT domainId, 'Domain', domain, 0, 0 FROM h
      |UNION ALL SELECT mentionId, 'Mention', surface, pageId, mentionIdx FROM m
      |UNION ALL SELECT DISTINCT entityNodeId, 'Entity', CAST(entityId AS VARCHAR), 0, 0
      |  FROM m WHERE entityId >= 0
      |UNION ALL SELECT DISTINCT tripleNodeId, 'Triple', pred, pageId, sentIdx FROM rt""".stripMargin

  /** SQL twin of Pipeline.graphTables' edge union. (The extractor's
    * 16-mentions-per-sentence SAME_SENTENCE cap is not replicated: rule
    * sentences carry at most 3 mentions, so the cap is unreachable on this
    * corpus by construction.) */
  private val edgesUnion =
    """SELECT hostId AS src, pageId AS dst, 'IS_PAGE_OF' AS kind,
      |  CAST(NULL AS VARCHAR) AS variable, CAST(NULL AS VARCHAR) AS label FROM p
      |UNION ALL SELECT domainId, hostId, 'IS_PARENT_HOST_OF', NULL, NULL FROM h
      |UNION ALL SELECT pageId, mentionId, 'MENTIONS', NULL, NULL FROM m
      |UNION ALL SELECT mentionId, entityNodeId, 'LINKS_TO', norm, NULL FROM m WHERE entityId >= 0
      |UNION ALL SELECT idNode, compNode, 'SAME_AS', NULL, NULL FROM c
      |-- NEXT_MENTION flow label: 'except' over a mention-less sentence gap
      |-- (lead over page order = the extractor's marr(i+1))
      |UNION ALL SELECT mentionId, nextMentionId, 'NEXT_MENTION', NULL,
      |    CASE WHEN lead(sentIdx) OVER (PARTITION BY pageId ORDER BY mentionIdx)
      |              - sentIdx > 1 THEN 'except' END
      |  FROM m QUALIFY nextMentionId != 0
      |-- SAME_SENTENCE branch label: True iff b is a's immediate in-sentence
      |-- successor (rank gap 1), False for skip pairs
      |UNION ALL SELECT a.mentionId, b.mentionId, 'SAME_SENTENCE', NULL,
      |    CASE WHEN b.rk = a.rk + 1 THEN 'True' ELSE 'False' END
      |  FROM (SELECT *, row_number() OVER (PARTITION BY pageId, sentIdx
      |          ORDER BY mentionIdx) AS rk FROM m) a
      |  JOIN (SELECT *, row_number() OVER (PARTITION BY pageId, sentIdx
      |          ORDER BY mentionIdx) AS rk FROM m) b
      |    ON a.pageId = b.pageId AND a.sentIdx = b.sentIdx
      |    AND a.mentionIdx < b.mentionIdx
      |UNION ALL SELECT DISTINCT tripleNodeId, subjMentionId, 'SUBJ', pred, NULL FROM rt
      |UNION ALL SELECT DISTINCT tripleNodeId, objMentionId, 'OBJ', pred, NULL FROM rt
      |  WHERE objMentionId != 0""".stripMargin

  /** One nhash iteration: rot1(label) XOR xor(child labels), 16-bit. */
  private def nhashRound(prev: String, xo: String, next: String): String =
    s"""$xo AS (SELECT e.src AS id, bit_xor(l.label) AS cx
       |  FROM e JOIN $prev l ON l.id = e.dst GROUP BY 1),
       |$next AS (SELECT $prev.id, $prev.pageId,
       |    xor((($prev.label << 1) & 65535) | ($prev.label >> 15), coalesce($xo.cx, 0)) % 65536 AS label
       |  FROM $prev LEFT JOIN $xo ON $prev.id = $xo.id)""".stripMargin

  /** Canonical entity-graph CTEs shared by the analytics oracles: the
    * self-loop-free, (src,dst)-deduped subj→obj graph over canonical ids. */
  private val entityGraph =
    s"""rt AS (SELECT * FROM $RT), c AS (SELECT id, component FROM $C),
       |ct AS (SELECT DISTINCT coalesce(cs.component, rt.subj) AS src,
       |    coalesce(co.component, rt.obj) AS dst
       |  FROM rt LEFT JOIN c cs ON rt.subj = cs.id
       |          LEFT JOIN c co ON rt.obj = co.id
       |  WHERE rt.obj >= 0),
       |e AS MATERIALIZED (SELECT src, dst FROM ct WHERE src != dst)""".stripMargin

  /** One integer-PageRank round — `//` (DuckDB integer division) mirrors
    * Spark's `div`, and the HUGEINT sum is cast straight back to BIGINT so
    * the arithmetic stays 64-bit on both engines. Reads the per-node
    * teleport base from the `nb` CTE (uniform for classic PageRank,
    * seed-restricted for the personalized variant). */
  private def prRound(prev: String, x: String, next: String): String =
    s"""$x AS (SELECT e.dst AS id, CAST(sum(r.rank // od.outdeg) AS BIGINT) AS cx
       |  FROM e JOIN od ON od.src = e.src JOIN $prev r ON r.id = e.src
       |  GROUP BY 1),
       |$next AS (SELECT n.id, n.base + (85 * coalesce(x2.cx, 0)) // 100 AS rank
       |  FROM nb n LEFT JOIN $x x2 ON x2.id = n.id)""".stripMargin

  private def prRounds: String =
    (0 until 10).map(i => prRound(s"r$i", s"x${i + 1}", s"r${i + 1}")).mkString(",\n")

  /** One integer-HITS round — the SAME Long arithmetic as
    * GraphAnalytics.hitsInt: gather-sum along (then against) the edge
    * direction, renormalize by `raw // (max(raw) // scale + 1)`. Sums cast
    * straight back to BIGINT (64-bit on both engines); nodes absent from a
    * gather score 0.
    *
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    * half-round references its raw-sum CTE TWICE (the max-divisor subquery
    * and the divide) — 16 inlined half-rounds expand the parquet scans
    * 2^16-fold, which exhausts file handles and surfaces as a bogus
    * "No files found" IO error. */
  private def hitsRound(i: Int, scale: Long): String = {
    val (hp, ar, ad, a, hr, hd, h) =
      (s"h${i - 1}", s"ar$i", s"ad$i", s"a$i", s"hr$i", s"hd$i", s"h$i")
    s"""$ar AS MATERIALIZED (SELECT e.dst AS id, CAST(sum(p.score) AS BIGINT) AS raw
       |  FROM e JOIN $hp p ON p.id = e.src GROUP BY 1),
       |$ad AS (SELECT max(raw) // $scale + 1 AS d FROM $ar),
       |$a AS MATERIALIZED (SELECT n.id, coalesce(r.raw, 0) // (SELECT d FROM $ad) AS score
       |  FROM nodes n LEFT JOIN $ar r ON r.id = n.id),
       |$hr AS MATERIALIZED (SELECT e.src AS id, CAST(sum(p.score) AS BIGINT) AS raw
       |  FROM e JOIN $a p ON p.id = e.dst GROUP BY 1),
       |$hd AS (SELECT max(raw) // $scale + 1 AS d FROM $hr),
       |$h AS MATERIALIZED (SELECT n.id, coalesce(r.raw, 0) // (SELECT d FROM $hd) AS score
       |  FROM nodes n LEFT JOIN $hr r ON r.id = n.id)""".stripMargin
  }

  private def hitsRounds(iters: Int, scale: Long): String =
    (1 to iters).map(hitsRound(_, scale)).mkString(",\n")

  /** One synchronous label-propagation round: neighbor-label histogram over
    * the bidirected edge set, then the (count desc, label asc) argmax — here
    * as max-count join + min(label), the same function hitsInt's Spark twin
    * computes in one struct-max pass. count(*) is BIGINT already.
    * MATERIALIZED for the same inlining reason as hitsRound (each round
    * references the previous labeling 3×: 3^iters-fold expansion). */
  private def lpRound(i: Int): String = {
    val (lp, g, m, w, l) = (s"l${i - 1}", s"g$i", s"m$i", s"w$i", s"l$i")
    s"""$g AS MATERIALIZED (SELECT b.node, p.label, count(*) AS c
       |  FROM bi b JOIN $lp p ON p.id = b.nb GROUP BY 1, 2),
       |$m AS (SELECT node, max(c) AS mx FROM $g GROUP BY 1),
       |$w AS (SELECT g.node AS id, min(g.label) AS nl
       |  FROM $g g JOIN $m m ON m.node = g.node AND g.c = m.mx GROUP BY 1),
       |$l AS MATERIALIZED (SELECT p.id, coalesce(w.nl, p.label) AS label
       |  FROM $lp p LEFT JOIN $w w ON w.id = p.id)""".stripMargin
  }

  private def lpRounds(iters: Int): String =
    (1 to iters).map(lpRound).mkString(",\n")

  // canonical mapping re-derived relationally: left-join the component map
  // on both slots, coalesce, dedup — the same logical op as Pipeline's
  // (broadcast or shuffle) canonical join
  private def canonicalTriplesSql: String =
    s"""WITH rt AS (SELECT * FROM $RT), c AS (SELECT id, component FROM $C)
       |SELECT DISTINCT coalesce(cs.component, rt.subj) AS subj, rt.pred AS pred,
       |  coalesce(co.component, rt.obj) AS obj,
       |  rt.objValue AS "objValue", rt.url AS url, CAST(1.0 AS DOUBLE) AS conf
       |FROM rt LEFT JOIN c cs ON rt.subj = cs.id LEFT JOIN c co ON rt.obj = co.id""".stripMargin

  private def removedTriplesSql: String =
    s"""WITH rt AS (SELECT * FROM $RT
       |  WHERE url NOT IN (SELECT url FROM $RMU)),
       |c AS (SELECT id, component FROM $CRM)
       |SELECT DISTINCT coalesce(cs.component, rt.subj) AS subj, rt.pred AS pred,
       |  coalesce(co.component, rt.obj) AS obj,
       |  rt.objValue AS "objValue", rt.url AS url, CAST(1.0 AS DOUBLE) AS conf
       |FROM rt LEFT JOIN c cs ON rt.subj = cs.id LEFT JOIN c co ON rt.obj = co.id""".stripMargin

  def map: Map[String, String] = Map(
    "kg_pages" ->
      s"""SELECT pageId AS "pageId", url, host, nSentences AS "nSentences", error
         |FROM $P""".stripMargin,
    "kg_mentions" ->
      s"""SELECT pageId AS "pageId", url, mentionId AS "mentionId", surface, norm,
         |  entityId AS "entityId"
         |FROM $M""".stripMargin,
    "kg_components" -> s"SELECT id, component FROM $C",
    "kg_triples" -> canonicalTriplesSql,
    // the corpus-growth append entries must equal the FULL-corpus rebuild —
    // same oracle SQL, so the driver gate hash-checks the equivalence
    // (batch append, and the streaming foreachBatch ingest with redelivery)
    "kg_append_triples" -> canonicalTriplesSql,
    "st5_stream_ingest" -> canonicalTriplesSql,
    // takedown propagation must equal the rebuild over the REMAINING corpus:
    // same canonical-triples derivation, with rawtriples restricted to the
    // surviving urls and the mapping recomputed by a union-find that never
    // saw the removed pages' same-as evidence (components_rm). The batch
    // removal and its streaming foreachBatch twin (redelivered removal
    // micro-batches) share the oracle — both must hash-equal it.
    "kg_remove_triples" -> removedTriplesSql,
    "st6_stream_takedown" -> removedTriplesSql,
    "kg_nodes" ->
      s"""WITH $leaves
         |$nodesUnion""".stripMargin,
    "kg_edges" ->
      s"""WITH $leaves
         |$edgesUnion""".stripMargin,
    "kg_step_megahost_pages" ->
      s"""SELECT hostId AS id, 'Host' AS kind, host AS code,
         |  CAST(0 AS BIGINT) AS "pageId", 0 AS "childNum"
         |FROM $H WHERE regexp_matches(host, '^host0\\.')""".stripMargin,
    // Dominance re-derived from FIRST PRINCIPLES, not CHK: d strictly
    // dominates b iff b is unreachable from the page's first mention once d
    // is removed (the textbook definition, as a per-candidate recursive
    // reachability CTE). idom(b) = the strict dominator with the largest
    // mention index — dominators form a chain, and dominance on this DAG
    // implies topological (index) precedence. A genuinely different
    // algorithm than the Spark side's iterative fixpoint.
    "kg_step_dom" ->
      s"""WITH RECURSIVE
         |m AS (SELECT pageId, mentionId, mentionIdx FROM $M),
         |pe AS (
         |  SELECT pageId, mentionId AS src, nextMentionId AS dst FROM $M
         |    WHERE nextMentionId != 0
         |  UNION
         |  SELECT x.pageId, x.mentionId, y.mentionId
         |  FROM $M x JOIN $M y ON x.pageId = y.pageId AND x.sentIdx = y.sentIdx
         |    AND x.mentionIdx < y.mentionIdx),
         |rt AS (SELECT pageId, mentionId AS root FROM m
         |  QUALIFY row_number() OVER (PARTITION BY pageId ORDER BY mentionIdx) = 1),
         |reach AS (
         |  SELECT r.pageId, c.mentionId AS d, r.root AS node
         |  FROM rt r JOIN m c ON c.pageId = r.pageId AND c.mentionId != r.root
         |  UNION
         |  SELECT re.pageId, re.d, pe.dst
         |  FROM reach re JOIN pe ON pe.pageId = re.pageId AND pe.src = re.node
         |  WHERE pe.dst != re.d),
         |sdom AS (
         |  SELECT b.pageId, dm.mentionId AS d, dm.mentionIdx AS didx, b.mentionId AS b
         |  FROM m b JOIN m dm ON dm.pageId = b.pageId AND dm.mentionId != b.mentionId
         |  JOIN rt r ON r.pageId = b.pageId
         |  WHERE b.mentionId != r.root
         |    AND NOT EXISTS (SELECT 1 FROM reach re
         |      WHERE re.pageId = b.pageId AND re.d = dm.mentionId
         |        AND re.node = b.mentionId))
         |SELECT pageId AS "pageId", d AS src, b AS dst FROM sdom
         |QUALIFY row_number() OVER (PARTITION BY pageId, b ORDER BY didx DESC) = 1
         |ORDER BY "pageId", dst""".stripMargin,
    // control dependence from the same first-principles postdominators:
    // ipdom(a) = min-index strict postdominator; CONTROLS = the FOW chain
    // walk from each edge target down to (excluding) ipdom(src)
    "kg_step_cdg" ->
      s"""WITH RECURSIVE
         |m AS (SELECT pageId, mentionId, mentionIdx FROM $M),
         |pe AS (
         |  SELECT pageId, mentionId AS src, nextMentionId AS dst FROM $M
         |    WHERE nextMentionId != 0
         |  UNION
         |  SELECT x.pageId, x.mentionId, y.mentionId
         |  FROM $M x JOIN $M y ON x.pageId = y.pageId AND x.sentIdx = y.sentIdx
         |    AND x.mentionIdx < y.mentionIdx),
         |ext AS (SELECT pageId, mentionId AS exit FROM m
         |  QUALIFY row_number() OVER (PARTITION BY pageId ORDER BY mentionIdx DESC) = 1),
         |preach AS (
         |  SELECT x.pageId, c.mentionId AS d, x.exit AS node
         |  FROM ext x JOIN m c ON c.pageId = x.pageId AND c.mentionId != x.exit
         |  UNION
         |  SELECT re.pageId, re.d, pe.src
         |  FROM preach re JOIN pe ON pe.pageId = re.pageId AND pe.dst = re.node
         |  WHERE pe.src != re.d),
         |spdom AS (
         |  SELECT a.pageId, dm.mentionId AS d, dm.mentionIdx AS didx, a.mentionId AS a
         |  FROM m a JOIN m dm ON dm.pageId = a.pageId AND dm.mentionId != a.mentionId
         |  JOIN ext x ON x.pageId = a.pageId
         |  WHERE a.mentionId != x.exit
         |    AND NOT EXISTS (SELECT 1 FROM preach re
         |      WHERE re.pageId = a.pageId AND re.d = dm.mentionId
         |        AND re.node = a.mentionId)),
         |ipdom AS (
         |  SELECT pageId, a, d AS ip FROM spdom
         |  QUALIFY row_number() OVER (PARTITION BY pageId, a ORDER BY didx ASC) = 1),
         |walk AS (
         |  SELECT pe.pageId, pe.src AS a, pe.dst AS cur, ia.ip AS stop
         |  FROM pe JOIN ipdom ia ON ia.pageId = pe.pageId AND ia.a = pe.src
         |  WHERE pe.dst != ia.ip
         |  UNION
         |  SELECT w.pageId, w.a, ic.ip, w.stop
         |  FROM walk w JOIN ipdom ic ON ic.pageId = w.pageId AND ic.a = w.cur
         |  WHERE ic.ip != w.stop)
         |SELECT DISTINCT pageId AS "pageId", a AS src, cur AS dst FROM walk
         |ORDER BY "pageId", src, dst""".stripMargin,
    "kg_step_loc" ->
      s"""SELECT mentionId AS id,
         |  url || ':' || sentIdx || ':' || tokStart || ':' || tokEnd AS location
         |FROM $M ORDER BY id""".stripMargin,
    // integer fixed-point PageRank, 10 rounds unrolled — the SAME Long
    // arithmetic as GraphAnalytics.pageRankInt (div truncation included), so
    // the ranks agree bit-exactly with no float ever materialized
    "kg_step_pagerank" ->
      s"""WITH $entityGraph,
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |pr AS (SELECT 1000000000000000 // (SELECT count(*) FROM nodes) AS pernode),
         |nb AS (SELECT id, (SELECT (pernode * 15) // 100 FROM pr) AS base FROM nodes),
         |r0 AS (SELECT id, (SELECT pernode FROM pr) AS rank FROM nodes),
         |$prRounds
         |SELECT id, rank FROM r10 ORDER BY id""".stripMargin,
    // personalized variant: teleport mass returns only to the seed set
    // (every 10th canonical entity id, head entity included) — same rounds,
    // seed-restricted r0/base
    "kg_step_ppr" ->
      s"""WITH $entityGraph,
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |seeds AS (SELECT id FROM nodes WHERE id % 10 = 0),
         |pr AS (SELECT 1000000000000000 // (SELECT count(*) FROM seeds) AS perseed),
         |nb AS (SELECT n.id, CASE WHEN n.id % 10 = 0
         |    THEN (SELECT (perseed * 15) // 100 FROM pr) ELSE 0 END AS base
         |  FROM nodes n),
         |r0 AS (SELECT n.id, CASE WHEN n.id % 10 = 0
         |    THEN (SELECT perseed FROM pr) ELSE 0 END AS rank
         |  FROM nodes n),
         |$prRounds
         |SELECT id, rank FROM r10 ORDER BY id""".stripMargin,
    // integer fixed-point HITS, 8 rounds unrolled — the same gather-sum +
    // max-renormalize Long arithmetic as GraphAnalytics.hitsInt, bit-exact
    "kg_step_hits" ->
      s"""WITH $entityGraph,
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT id, 1000000000000 AS score FROM nodes),
         |${hitsRounds(8, 1000000000000L)}
         |SELECT n.id, h.score AS hub, a.score AS auth
         |FROM nodes n JOIN h8 h ON h.id = n.id JOIN a8 a ON a.id = n.id
         |ORDER BY n.id""".stripMargin,
    // synchronous label propagation, 5 rounds unrolled — max-count join +
    // min(label) computes the same (count desc, label asc) argmax as the
    // Spark twin's single struct-max pass
    "kg_step_communities" ->
      s"""WITH $entityGraph,
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM e),
         |bi AS MATERIALIZED (SELECT u AS node, v AS nb FROM und
         |  UNION ALL SELECT v, u FROM und),
         |l0 AS (SELECT DISTINCT node AS id, node AS label FROM bi),
         |${lpRounds(5)}
         |SELECT id, label FROM l5 ORDER BY id""".stripMargin,
    // power-law degree census over the undirected canonical graph
    "kg_step_degdist" ->
      s"""WITH $entityGraph,
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM e),
         |bi AS (SELECT u AS node FROM und UNION ALL SELECT v FROM und),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM bi
         |  GROUP BY 1)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes FROM deg
         |GROUP BY 1 ORDER BY deg""".stripMargin,
    // ontology summary over the SAME canonical distinct triple set the
    // kg_triples oracle re-derives
    "kg_step_predstats" ->
      s"""WITH rt AS (SELECT * FROM $RT), c AS (SELECT id, component FROM $C),
         |ct AS (SELECT DISTINCT coalesce(cs.component, rt.subj) AS subj,
         |    rt.pred AS pred, coalesce(co.component, rt.obj) AS obj,
         |    rt.objValue AS ov, rt.url AS url
         |  FROM rt LEFT JOIN c cs ON rt.subj = cs.id
         |          LEFT JOIN c co ON rt.obj = co.id)
         |SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
         |  CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
         |  CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
         |FROM ct GROUP BY pred ORDER BY pred""".stripMargin,
    // structural sameAs candidates — shared-witness count with hub witnesses
    // (deg > 64) dropped, full-degree denominators, cross-multiplied integer
    // Jaccard test: the same rule GraphAnalytics.sameAsCandidates computes
    "kg_step_sameas" ->
      s"""WITH $entityGraph,
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM e),
         |bi AS MATERIALIZED (SELECT u AS node, v AS nb FROM und
         |  UNION ALL SELECT v, u FROM und),
         |deg AS MATERIALIZED (SELECT node, count(*) AS deg FROM bi GROUP BY 1),
         |inv AS MATERIALIZED (SELECT b.nb AS w, b.node FROM bi b
         |  JOIN deg d ON d.node = b.nb WHERE d.deg <= 64),
         |pr AS (SELECT a.node AS u, b.node AS v, count(*) AS inter
         |  FROM inv a JOIN inv b ON a.w = b.w AND a.node < b.node
         |  GROUP BY 1, 2)
         |SELECT pr.u, pr.v, pr.inter, du.deg AS du, dv.deg AS dv
         |FROM pr JOIN deg du ON du.node = pr.u JOIN deg dv ON dv.node = pr.v
         |WHERE pr.inter >= 2
         |  AND pr.inter * 4 >= 1 * (du.deg + dv.deg - pr.inter)
         |ORDER BY pr.u, pr.v""".stripMargin,
    // triangles re-derived with the SAME degree-ordered orientation: wedges
    // at each edge's (deg,id)-min endpoint, closed against the undirected
    // edge set; wedges = C(deg,2) in integer division
    "kg_step_triangles" ->
      s"""WITH $entityGraph,
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM e),
         |deg AS (SELECT id, count(*) AS deg FROM (
         |    SELECT u AS id FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
         |o AS (SELECT
         |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
         |         THEN und.u ELSE und.v END AS s,
         |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
         |         THEN und.v ELSE und.u END AS t
         |  FROM und JOIN deg du ON du.id = und.u JOIN deg dv ON dv.id = und.v),
         |w AS (SELECT e1.s, e1.t AS a, e2.t AS b
         |  FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t),
         |tri AS (SELECT w.s, w.a, w.b
         |  FROM w JOIN und ON und.u = w.a AND und.v = w.b),
         |pert AS (SELECT id, count(*) AS triangles FROM (
         |    SELECT s AS id FROM tri UNION ALL SELECT a FROM tri
         |    UNION ALL SELECT b FROM tri) GROUP BY 1)
         |SELECT d.id, d.deg, (d.deg * (d.deg - 1)) // 2 AS wedges,
         |  coalesce(p.triangles, 0) AS triangles
         |FROM deg d LEFT JOIN pert p ON p.id = d.id ORDER BY d.id""".stripMargin,
    // 2-core survivors with in-core degree — the dump IS the oracle (the
    // components precedent): VerifyOracle peels the same canonical graph
    // with a sequential queue, and the k-core's uniqueness makes the
    // synchronous distributed rounds and the queue peel comparable rowwise
    "kg_step_kcore" -> s"SELECT id, deg FROM $KCORE ORDER BY id",
    // sequential iterative Tarjan in the VerifyOracle dump vs the
    // distributed trim+FW-BW rounds: the SCC partition is unique and both
    // label by min member, so the rows must agree exactly
    "kg_step_scc" -> s"SELECT id, scc FROM $SCC ORDER BY id",
    // Broder bow-tie regions by sequential BFS in the dump vs one scc()
    // pass + two distributed BFS fixpoints
    "kg_step_bowtie" -> s"SELECT id, region FROM $BOWTIE ORDER BY id",
    "kg_step_entity_degree" ->
      s"""SELECT entityNodeId AS entity_node, count(*) AS n_mentions
         |FROM $M WHERE entityId >= 0
         |GROUP BY 1 ORDER BY n_mentions DESC, entity_node LIMIT 50""".stripMargin,
    // depth-2 BFS closure over LINKS_TO ∪ SAME_AS, unrolled to two hop CTEs
    "kg_step_slice" ->
      s"""WITH $leaves,
         |nodes AS ($nodesUnion),
         |e AS (
         |  SELECT mentionId AS src, entityNodeId AS dst FROM m WHERE entityId >= 0
         |  UNION ALL SELECT idNode, compNode FROM c),
         |seeds AS (SELECT mentionId AS id FROM m ORDER BY mentionId LIMIT 100),
         |h1 AS (SELECT DISTINCT e.dst AS id FROM seeds JOIN e ON e.src = seeds.id),
         |h2 AS (SELECT DISTINCT e.dst AS id FROM h1 JOIN e ON e.src = h1.id),
         |vis AS (SELECT id FROM seeds UNION SELECT id FROM h1 UNION SELECT id FROM h2)
         |SELECT n.id, n.kind, n.code, n."pageId", n."childNum"
         |FROM vis JOIN nodes n ON n.id = vis.id""".stripMargin,
    // longest-match dedup: drop a mention iff a strictly longer code in the
    // same page contains it (containment is transitive, so the reference's
    // keep-order scan reduces to this closed form)
    "kg_step_usesfiltered" ->
      s"""WITH mn AS (SELECT mentionId AS id, surface AS code, pageId, mentionIdx FROM $M)
         |SELECT a.id, 'Mention' AS kind, a.code, a.pageId AS "pageId", a.mentionIdx AS "childNum"
         |FROM mn a WHERE NOT EXISTS (
         |  SELECT 1 FROM mn b WHERE b.pageId = a.pageId
         |    AND length(b.code) > length(a.code) AND contains(b.code, a.code))
         |ORDER BY "pageId", id""".stripMargin,
    // chain path search in closed form: on the NEXT_MENTION chain a
    // first-path DFS with depth cap 30 finds (src,dst) iff dst is <= 30 hops
    // ahead and no kill mention sits strictly between them
    "kg_step_unsanitized" ->
      s"""WITH lm AS (SELECT pageId, mentionId, mentionIdx, entityId FROM $M WHERE entityId >= 0),
         |pairs AS (
         |  SELECT pageId, arg_min(mentionId, mentionIdx) AS src, min(mentionIdx) AS si,
         |         arg_max(mentionId, mentionIdx) AS dst, max(mentionIdx) AS di
         |  FROM lm GROUP BY 1
         |  HAVING arg_min(mentionId, mentionIdx) != arg_max(mentionId, mentionIdx))
         |SELECT p.pageId AS "pageId", p.src, p.dst, (p.di - p.si) AS "pathLen"
         |FROM pairs p
         |WHERE p.di - p.si <= 30 AND NOT EXISTS (
         |  SELECT 1 FROM lm k WHERE k.pageId = p.pageId
         |    AND k.mentionIdx > p.si AND k.mentionIdx < p.di AND k.entityId % 7 = 3)
         |ORDER BY "pageId"""".stripMargin,
    // 2 iterations of the neighborhood-hash kernel over MENTIONS edges;
    // initial labels from the (kind, code) -> label map dump
    "kg_step_nhash" ->
      s"""WITH $leaves,
         |nodes AS ($nodesUnion),
         |lmap AS (SELECT * FROM $L),
         |l0 AS (SELECT n.id, n."pageId" AS pageId, lm.label
         |  FROM nodes n JOIN lmap lm ON n.kind = lm.kind AND n.code = lm.code
         |  WHERE n.kind IN ('Page', 'Mention')),
         |e AS (SELECT pageId AS src, mentionId AS dst FROM m),
         |${nhashRound("l0", "x1", "l1")},
         |${nhashRound("l1", "x2", "l2")}
         |SELECT pageId AS "pageId", label, count(*) AS "count"
         |FROM l2 GROUP BY 1, 2""".stripMargin,
    // the CLI knn path end-to-end: full-frame nhash bags (every node kind;
    // pageId-0 globals dropped from the BAG, not the label frame) →
    // feature-hashed 64-dim dense vectors (index = label mod 64, value =
    // summed count) → cosine top-5 of the min-id page. Counts are small
    // integers, exactly representable in float32, and both engines
    // accumulate dot/norm in double in the same element order — so the
    // ranks (ties broken by nn_id on both sides) agree exactly, and the
    // float cosine itself never reaches the output
    "e4_knn_kg" ->
      s"""WITH $leaves,
         |nodes AS ($nodesUnion),
         |lmap AS (SELECT * FROM $L),
         |l0 AS (SELECT n.id, n."pageId" AS pageId, lm.label
         |  FROM nodes n JOIN lmap lm ON n.kind = lm.kind AND n.code = lm.code),
         |e AS (SELECT pageId AS src, mentionId AS dst FROM m),
         |${nhashRound("l0", "x1", "l1")},
         |${nhashRound("l1", "x2", "l2")},
         |bag AS (SELECT pageId, label, count(*) AS cnt FROM l2
         |  WHERE pageId != 0 GROUP BY 1, 2),
         |sums AS (SELECT pageId, label % 64 AS pos, CAST(sum(cnt) AS DOUBLE) AS v
         |  FROM bag GROUP BY 1, 2),
         |mp AS (SELECT pageId, map_from_entries(list(struct_pack(k := pos, v := v))) AS m2
         |  FROM sums GROUP BY pageId),
         |emb AS (SELECT pageId AS id, list_transform(range(0, 64),
         |    i -> coalesce(map_extract(m2, i)[1], 0.0)) AS vec FROM mp),
         |seed AS (SELECT min(pageId) AS id FROM p),
         |sims AS (SELECT s.id AS query_id, c.id AS nn_id,
         |    list_cosine_similarity(q.vec, c.vec) AS cs
         |  FROM seed s JOIN emb q ON q.id = s.id
         |  JOIN emb c ON c.id != s.id)
         |SELECT query_id, rank, nn_id, CAST(round(cs * 1e6) AS BIGINT) AS score_q FROM (
         |  SELECT query_id, nn_id, cs,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, nn_id) AS rank
         |  FROM sims) WHERE rank <= 5 ORDER BY rank""".stripMargin,
    // interval-column chain slice: first-mention seeds make the depth-5
    // slice a plain position filter
    "kg_step_chain_slice" ->
      s"""SELECT mentionId AS id, 'Mention' AS kind, surface AS code,
         |  pageId AS "pageId", mentionIdx AS "childNum"
         |FROM $M WHERE mentionIdx <= 5
         |ORDER BY "pageId", "childNum", id""".stripMargin,
    // shortest kill-avoiding distance on the branching page graph,
    // re-derived by a recursive BFS enumeration (kill nodes reachable but
    // never expanded, except the source)
    "kg_step_unsanitized_dag" ->
      s"""WITH RECURSIVE m AS (SELECT * FROM $M),
         |lm AS (SELECT pageId, mentionId, mentionIdx, entityId FROM m WHERE entityId >= 0),
         |pairs AS (
         |  SELECT pageId, arg_min(mentionId, mentionIdx) AS src,
         |         arg_max(mentionId, mentionIdx) AS dst
         |  FROM lm GROUP BY 1
         |  HAVING arg_min(mentionId, mentionIdx) != arg_max(mentionId, mentionIdx)),
         |kills AS (SELECT mentionId AS id FROM lm WHERE entityId % 7 = 3),
         |e AS (
         |  SELECT pageId, mentionId AS src, nextMentionId AS dst FROM m WHERE nextMentionId != 0
         |  UNION ALL
         |  SELECT a.pageId, a.mentionId, b.mentionId FROM m a JOIN m b
         |    ON a.pageId = b.pageId AND a.sentIdx = b.sentIdx AND a.mentionIdx < b.mentionIdx),
         |walk(pageId, src, node, d) AS (
         |  SELECT pageId, src, src, 0 FROM pairs
         |  UNION
         |  SELECT w.pageId, w.src, e.dst, w.d + 1
         |  FROM walk w JOIN e ON e.pageId = w.pageId AND e.src = w.node
         |  WHERE w.d < 30 AND (w.node = w.src OR w.node NOT IN (SELECT id FROM kills)))
         |SELECT p.pageId AS "pageId", p.src, p.dst, CAST(min(w.d) AS INT) AS dist
         |FROM pairs p JOIN walk w
         |  ON w.pageId = p.pageId AND w.src = p.src AND w.node = p.dst
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // initGraphs battery: seed = first head-entity mention per qualifying
    // page; <=3-hop neighborhood size + condition-touch flag via recursive
    // enumeration
    "kg_step_graphlet" ->
      s"""WITH RECURSIVE m AS (SELECT * FROM $M),
         |seeds AS (
         |  SELECT pageId, arg_min(mentionId, mentionIdx) AS seed
         |  FROM m WHERE entityId = 0 GROUP BY 1),
         |e AS (
         |  SELECT pageId, mentionId AS src, nextMentionId AS dst FROM m WHERE nextMentionId != 0
         |  UNION ALL
         |  SELECT a.pageId, a.mentionId, b.mentionId FROM m a JOIN m b
         |    ON a.pageId = b.pageId AND a.sentIdx = b.sentIdx AND a.mentionIdx < b.mentionIdx),
         |walk(pageId, seed, node, d) AS (
         |  SELECT pageId, seed, seed, 0 FROM seeds
         |  UNION
         |  SELECT w.pageId, w.seed, e.dst, w.d + 1
         |  FROM walk w JOIN e ON e.pageId = w.pageId AND e.src = w.node
         |  WHERE w.d < 3),
         |conds AS (SELECT mentionId AS id FROM m WHERE entityId >= 0 AND entityId % 5 = 1)
         |SELECT s.pageId AS "pageId", s.seed, count(DISTINCT w.node) AS "nReach",
         |  CAST(max(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS "hasCond"
         |FROM seeds s JOIN walk w ON w.pageId = s.pageId AND w.seed = s.seed
         |LEFT JOIN conds c ON c.id = w.node
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // coref expansion: seed mentions -> linked entities -> every mention of
    // those entities (the two-hop LINKS_TO walk, re-derived as one join)
    // taken-branch hop: the seed (each page's first mention, in-sentence
    // rank 1) follows its True-labeled SAME_SENTENCE edge = the rank-2
    // mention of the same sentence
    "kg_step_branch" ->
      s"""WITH m AS (SELECT * FROM $M),
         |ms AS (SELECT *, row_number() OVER (PARTITION BY pageId, sentIdx
         |    ORDER BY mentionIdx) AS rk FROM m),
         |seeds AS (SELECT * FROM ms WHERE mentionIdx = 0)
         |SELECT b.mentionId AS id, 'Mention' AS kind, b.surface AS code,
         |  b.pageId AS "pageId", b.mentionIdx AS "childNum"
         |FROM seeds a JOIN ms b ON a.pageId = b.pageId AND a.sentIdx = b.sentIdx
         |  AND b.rk = a.rk + 1
         |ORDER BY id""".stripMargin,
    // siblings over MENTIONS = the other mentions of each seed's page,
    // one row per (seed, sibling) path — the join multiplicity IS the
    // duplicate-preserving pipe semantics
    "kg_step_siblings" ->
      s"""WITH m AS (SELECT * FROM $M),
         |seeds AS (SELECT mentionId AS id, pageId FROM m ORDER BY mentionId LIMIT 100)
         |SELECT m.mentionId AS id, 'Mention' AS kind, m.surface AS code,
         |  m.pageId AS "pageId", m.mentionIdx AS "childNum"
         |FROM m JOIN seeds ON m.pageId = seeds.pageId AND m.mentionId != seeds.id
         |ORDER BY id, "childNum"""".stripMargin,
    // matchParents: the 3-level containment walk re-derived set-wise —
    // seed pages, their hosts, the hosts' domains (deduped, as the step
    // dedups its frontier)
    "kg_step_ancestors" ->
      s"""WITH m AS (SELECT * FROM $M), p AS (SELECT * FROM $P), h AS (SELECT * FROM $H),
         |seeds AS (SELECT mentionId AS id, pageId FROM m ORDER BY mentionId LIMIT 100),
         |sp AS (SELECT DISTINCT pageId FROM seeds),
         |pages AS (SELECT p.* FROM p JOIN sp ON p.pageId = sp.pageId),
         |hosts AS (SELECT DISTINCT h.hostId, h.host, h.domainId, h.domain
         |  FROM h JOIN pages ON h.hostId = pages.hostId)
         |SELECT pageId AS id, 'Page' AS kind, url AS code,
         |  pageId AS "pageId", 0 AS "childNum" FROM pages
         |UNION ALL SELECT hostId, 'Host', host, 0, 0 FROM hosts
         |UNION ALL SELECT DISTINCT domainId, 'Domain', domain, 0, 0 FROM hosts
         |ORDER BY id""".stripMargin,
    "kg_step_coref" ->
      s"""WITH m AS (SELECT * FROM $M),
         |seeds AS (SELECT mentionId AS id FROM m ORDER BY mentionId LIMIT 100),
         |ents AS (SELECT DISTINCT m.entityId FROM m
         |  JOIN seeds ON m.mentionId = seeds.id WHERE m.entityId >= 0)
         |SELECT m.mentionId AS id, 'Mention' AS kind, m.surface AS code,
         |  m.pageId AS "pageId", m.mentionIdx AS "childNum"
         |FROM m JOIN ents ON m.entityId = ents.entityId
         |ORDER BY id""".stripMargin,
    "kg_step_prov" ->
      s"""SELECT DISTINCT tripleNodeId AS triple_id, pred, pageId AS "pageId",
         |  subjMentionId AS subj_mention, nullif(objMentionId, 0) AS obj_mention
         |FROM $RT ORDER BY triple_id""".stripMargin,

    // ---- signature-based dedup: banding/hamming re-derived in SQL ----
    "d3_minhash_lsh" ->
      s"""WITH s0 AS (SELECT doc_id, sig FROM $SIG),
         |s AS (SELECT doc_id, sig FROM s0 UNION ALL SELECT doc_id + 1000000, sig FROM s0),
         |banded AS (
         |  SELECT doc_id, sig, b.band,
         |    array_to_string(sig[b.band*4+1 : b.band*4+4], ',') AS bkey
         |  FROM s, (SELECT range AS band FROM range(8)) b),
         |capped AS (SELECT * FROM banded
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 50),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb
         |  FROM capped x JOIN capped y ON x.band = y.band AND x.bkey = y.bkey
         |    AND x.doc_id < y.doc_id),
         |est AS (SELECT a, b,
         |  CAST(len(list_filter(range(32), i -> sa[i+1] = sb[i+1])) AS DOUBLE) / 32
         |    AS "estJaccard"
         |  FROM cand)
         |SELECT a, b, "estJaccard" FROM est WHERE "estJaccard" >= 0.7
         |ORDER BY a, b""".stripMargin,
    "d4_simhash" ->
      s"""WITH s0 AS (SELECT doc_id, simhash FROM $SIG),
         |s AS (SELECT doc_id, simhash FROM s0 UNION ALL SELECT doc_id + 1000000, simhash FROM s0),
         |chunked AS (
         |  SELECT doc_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS cval
         |  FROM s, (SELECT range AS chunk FROM range(4)) c),
         |capped AS (SELECT * FROM chunked
         |  QUALIFY row_number() OVER (PARTITION BY chunk, cval ORDER BY doc_id) <= 200),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |    x.simhash AS ha, y.simhash AS hb
         |  FROM capped x JOIN capped y ON x.chunk = y.chunk AND x.cval = y.cval
         |    AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 3 ORDER BY a, b""".stripMargin,
    "d8_fingerprint" -> s"""SELECT doc_id, fp0 FROM $SIG ORDER BY doc_id""",

    // ingest-gate equivalence: ONE global closed-form pass over the
    // signature dump re-derives what the Spark side computed as two chunked
    // ingests against a persisted, re-capped index. base = first 80% of
    // doc_ids; batch = the rest ∪ a +1M shifted full copy (monotone ids,
    // the crawl regime the chunk-invariance argument needs). A batch doc is
    // dropped iff a strictly-smaller doc_id in the CAPPED banded set shares
    // a bucket and ≥ 70% of signature slots agree; probes are uncapped.
    "d19_ingest_dedup" ->
      s"""WITH s0 AS (SELECT doc_id, sig FROM $SIG),
         |params AS (SELECT (count(*) * 4) // 5 AS split FROM s0),
         |corpus AS (
         |  SELECT doc_id, sig,
         |    doc_id >= (SELECT split FROM params) AS is_batch FROM s0
         |  UNION ALL
         |  SELECT doc_id + 1000000, sig, TRUE FROM s0),
         |banded AS (
         |  SELECT doc_id, is_batch, b.band,
         |    array_to_string(sig[b.band*4+1 : b.band*4+4], ',') AS bkey
         |  FROM corpus, (SELECT range AS band FROM range(8)) b),
         |capped AS (SELECT * FROM banded
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 50),
         |cand AS (SELECT DISTINCT x.doc_id AS x, y.doc_id AS y
         |  FROM banded x JOIN capped y ON x.band = y.band AND x.bkey = y.bkey
         |    AND y.doc_id < x.doc_id
         |  WHERE x.is_batch),
         |dropped AS (SELECT DISTINCT c.x AS doc_id
         |  FROM cand c JOIN corpus a ON a.doc_id = c.x
         |              JOIN corpus b ON b.doc_id = c.y
         |  WHERE CAST(len(list_filter(range(32), i -> a.sig[i+1] = b.sig[i+1]))
         |          AS DOUBLE) / 32 >= 0.7)
         |SELECT bt.doc_id, d.doc_id IS NULL AS kept
         |FROM (SELECT doc_id FROM corpus WHERE is_batch) bt
         |LEFT JOIN dropped d ON d.doc_id = bt.doc_id
         |ORDER BY bt.doc_id""".stripMargin,

    // fuzzy-dedup clustering: d3's banding SQL derives the near-dup pairs
    // from the signature dump; a recursive CTE (min-label propagation to
    // fixpoint) independently closes them into components — the second
    // engine for ConnectedComponents.auto
    "d17_dup_clusters" ->
      s"""WITH RECURSIVE s0 AS (SELECT doc_id, sig FROM $SIG),
         |s AS (SELECT doc_id, sig FROM s0 UNION ALL SELECT doc_id + 1000000, sig FROM s0),
         |banded AS (
         |  SELECT doc_id, sig, b.band,
         |    array_to_string(sig[b.band*4+1 : b.band*4+4], ',') AS bkey
         |  FROM s, (SELECT range AS band FROM range(8)) b),
         |capped AS (SELECT * FROM banded
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 50),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb
         |  FROM capped x JOIN capped y ON x.band = y.band AND x.bkey = y.bkey
         |    AND x.doc_id < y.doc_id),
         |pr AS (SELECT a, b FROM cand
         |  WHERE CAST(len(list_filter(range(32), i -> sa[i+1] = sb[i+1])) AS DOUBLE) / 32 >= 0.7),
         |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
         |lbl(id, l) AS (
         |  SELECT DISTINCT a, a FROM e
         |  UNION
         |  SELECT e.b, lbl.l FROM lbl JOIN e ON e.a = lbl.id),
         |comp AS (SELECT id, min(l) AS cluster_id FROM lbl GROUP BY id),
         |alldocs AS (SELECT doc_id FROM documents
         |            UNION ALL SELECT doc_id + 1000000 FROM documents)
         |SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |FROM alldocs d LEFT JOIN comp c ON d.doc_id = c.id
         |ORDER BY d.doc_id""".stripMargin,

    // ---- multimodal: metadata math re-derived in SQL over the media dump ----
    "mm1_media_features" ->
      s"SELECT media_id, kind, ok, f0 FROM $MEDIA ORDER BY media_id",
    "mm2_resize_plan" ->
      s"""WITH s AS (SELECT media_id, width, height,
         |  CASE WHEN greatest(width, height) <= 256 THEN CAST(1.0 AS DOUBLE)
         |       ELSE CAST(256 AS DOUBLE) / greatest(width, height) END AS scale
         |  FROM $MEDIA)
         |SELECT media_id, width, height, scale,
         |  CAST(least(ceil(width * scale), 256) AS INT) AS target_w,
         |  CAST(least(ceil(height * scale), 256) AS INT) AS target_h
         |FROM s ORDER BY media_id""".stripMargin,
    "mm3_frame_sample" ->
      s"""SELECT media_id, durationMs AS "durationMs",
         |  CAST((durationMs - 1) // 1000 + 1 AS INT) AS n_frames
         |FROM $MEDIA WHERE kind = 'video' AND durationMs > 0
         |ORDER BY media_id""".stripMargin,
    // real-decode image stats: the dump rows ARE the single-threaded
    // re-derivation (same javax.imageio decode, sequential loop)
    "mm4_image_stats" ->
      s"""SELECT media_id, ok, img_w, img_h, sum_r, sum_g, sum_b,
         |  lum0, lum1, lum2, lum3, lum4, lum5, lum6, lum7
         |FROM read_parquet('{{ORA}}/mediaimg/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // real-decode audio stats: the dump rows ARE the single-threaded
    // re-derivation (same javax.sound.sampled decode, sequential loop)
    "mm5_audio_stats" ->
      s"""SELECT media_id, ok, sample_rate, n_samples, amp_min, amp_max,
         |  sum_abs, sum_sq, zero_cross
         |FROM read_parquet('{{ORA}}/mediaaud/*.parquet')
         |ORDER BY media_id""".stripMargin
  )
}
