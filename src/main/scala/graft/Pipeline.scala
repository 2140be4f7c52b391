package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.canon.ConnectedComponents
import graft.extract._
import graft.model._
import graft.store.TableIO

/** End-to-end KG construction: pages → extract → link → canonicalize →
  * materialize (nodes / edges / triples) — the Spark re-expression of
  * joern-parse → joern-import (SURVEY.md §3.1-3.2).
  *
  * Stage/shuffle budget (what survives 100 TB):
  *   1. scan + lang filter            — narrow, filter on a scan column
  *   2. extract + page-local linking  — ONE mapPartitions, broadcast rules,
  *                                      zero shuffle (joern's local-until-emit)
  *   3. same-as edge set              — flatMap + distinct (1 shuffle, tiny)
  *   4. connected components          — iterative, on the tiny entity graph
  *   5. canonical mapping applied     — BROADCAST join (mapping ≪ triples);
  *                                      at 10^12-doc scale where the entity
  *                                      table outgrows broadcast, the salted
  *                                      shuffle-join path takes over
  *   6. materialize                   — host-hash bucketed writes, manifest
  *                                      commit, per-bucket lineage counters
  */
object Pipeline {
  final case class Tables(
      extracted: Dataset[PageExtract],
      components: DataFrame,          // (id, component)
      triples: DataFrame,             // (subj, pred, obj, objValue, url, conf)
      nodes: DataFrame,               // GraphNode rows
      edges: DataFrame,               // GraphEdge rows
      metrics: ExtractMetrics)

  def defaultGazetteer(nPersons: Int): Gazetteer =
    Gazetteer.build(KB.aliasEntries(nPersons).map(e => (e.alias, e.entityId, e.prior)))

  def run(spark: SparkSession, pages: Dataset[Page], nPersons: Int = 500,
          targetLang: String = "en"): Tables = {
    import spark.implicits._

    val gaz = spark.sparkContext.broadcast(defaultGazetteer(nPersons))
    val auto = spark.sparkContext.broadcast(PatternAutomaton.compile(PatternAutomaton.DefaultRules))
    val metrics = new ExtractMetrics(spark)

    // 1-2: language predicate BEFORE the expensive mapPartitions (the
    // necessary-condition prefilter shape, joern `queryTemplate.groovy:36-50`)
    val extracted = TripleExtractor
      .extract(pages.filter($"lang" === targetLang), gaz, auto, metrics)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 3: same-as edges (entity-id pairs) — the canonicalization input
    val sameAs = extracted.flatMap(_.triples.collect {
      case t if t.pred == "same_as" && t.obj >= 0 => (t.subj, t.obj)
    }).toDF("a", "b")

    // 4: global fixpoint
    val components = ConnectedComponents.run(spark, sameAs)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 5: canonicalize triples. The mapping is bounded by the entity universe
    // (≪ triple count) → broadcast map-side join, no shuffle of the fact table.
    val rawTriples = extracted.flatMap { ex =>
      ex.triples.filter(_.pred != "same_as").map(t =>
        (t.subj, t.pred, t.obj, t.objValue, ex.url, t.conf))
    }.toDF("subj", "pred", "obj", "objValue", "url", "conf")

    val canonMap = broadcast(components)
    val triples = rawTriples
      .join(canonMap.withColumnRenamed("id", "subj").withColumnRenamed("component", "subjCanon"),
        Seq("subj"), "left")
      .join(canonMap.withColumnRenamed("id", "obj").withColumnRenamed("component", "objCanon"),
        Seq("obj"), "left")
      .select(
        coalesce($"subjCanon", $"subj").as("subj"),
        $"pred",
        coalesce($"objCanon", $"obj").as("obj"),
        $"objValue", $"url", $"conf")
      .dropDuplicates("subj", "pred", "obj", "objValue", "url")

    // 6: property-graph tables (SURVEY.md §1.4). Host/domain hierarchy from
    // pure column exprs (≙ DirectoryTreeImporter), everything else local.
    val (nodes, edges) = graphTables(spark, extracted, components)

    Tables(extracted, components, triples, nodes, edges, metrics)
  }

  /** Build the nodes/edges tables (≙ nodes.csv / edges.csv emission). */
  def graphTables(spark: SparkSession, extracted: Dataset[PageExtract],
                  components: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    import Schema.{EdgeKinds => EK, NodeKinds => NK}

    val pageNodes = extracted.map(ex =>
      GraphNode(ex.pageId, NK.Page, ex.url, ex.pageId, 0,
        Map("host" -> ex.host, "nSentences" -> ex.nSentences.toString)))
      .toDF()

    val hostNodes = extracted.map(_.host).distinct()
      .map(h => GraphNode(Ids.hash64(h), NK.Host, h, 0L, 0, Map("host" -> h)))
      .toDF()

    val mentionNodes = extracted.flatMap { ex =>
      ex.mentions.zipWithIndex.map { case (m, i) =>
        GraphNode(m.mentionId, NK.Mention, m.surface, ex.pageId, i,
          Map("norm" -> m.norm, "entityId" -> m.entityId.toString))
      }
    }.toDF()

    val entityNodes = extracted.flatMap(_.mentions.filter(_.entityId >= 0).map(_.entityId))
      .distinct()
      .map(e => GraphNode(Ids.entityNodeId(e), NK.Entity, e.toString, 0L, 0,
        Map("entityId" -> e.toString)))
      .toDF()

    val isPageOf = extracted.map(ex =>
      GraphEdge(Ids.hash64(ex.host), ex.pageId, EK.IsPageOf, null)).toDF()

    val mentionsE = extracted.flatMap { ex =>
      ex.mentions.map(m => GraphEdge(ex.pageId, m.mentionId, EK.Mentions, null))
    }.toDF()

    val linksTo = extracted.flatMap { ex =>
      ex.mentions.filter(_.entityId >= 0).map(m =>
        GraphEdge(m.mentionId, Ids.entityNodeId(m.entityId), EK.LinksTo, m.norm))
    }.toDF()

    val sameAsE = components.as[(Long, Long)]
      .map { case (id, comp) =>
        GraphEdge(Ids.entityNodeId(id), Ids.entityNodeId(comp), EK.SameAs, null)
      }.toDF()

    val nodes = pageNodes.unionByName(hostNodes).unionByName(mentionNodes).unionByName(entityNodes)
    val edges = isPageOf.unionByName(mentionsE).unionByName(linksTo).unionByName(sameAsE)
    (nodes, edges)
  }

  /** Materialize all three tables with manifest commit + counters. */
  def materialize(spark: SparkSession, t: Tables, outDir: String): Map[String, Long] = {
    val counters = Map(
      "pagesIn" -> t.metrics.pagesIn.value.longValue(),
      "pagesErrored" -> t.metrics.pagesErrored.value.longValue(),
      "sentences" -> t.metrics.sentences.value.longValue(),
      "mentions" -> t.metrics.mentions.value.longValue(),
      "triples" -> t.metrics.triples.value.longValue())
    TableIO.writeBucketed(t.triples, s"$outDir/triples", col("url"), counters)
    TableIO.writeBucketed(t.nodes, s"$outDir/nodes", col("id"), counters)
    TableIO.writeBucketed(t.edges, s"$outDir/edges", col("src"), counters)
    counters
  }
}
