package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SHUFFLE-JOIN entity-resolution path — for when the alias dictionary
  * outgrows a broadcast (the cutover the broadcast gazetteer path documents;
  * north rule: "small dict: broadcast map-side join; large: shuffle join on
  * normalized name key + candidate scoring", SURVEY.md G2).
  *
  * Mention DETECTION stays page-local (the trie needs only alias surfaces,
  * far smaller than the candidate lists); what moves to the shuffle is the
  * RESOLUTION: norm-key join against the alias table + the same scoring the
  * local resolver applies — `score = prior + 2.0 · [entity ∈ page context]`,
  * argmax per mention, ties to the smaller entity id, context = entities of
  * the page's unambiguous mentions.
  *
  * Exactly-equal semantics to the in-extractor resolver are asserted by
  * LinkingSpec — byte-identical linking is what makes the two paths
  * interchangeable at the scale cutover.
  *
  * Scale shape: two joins on `norm` (alias skew bounded by the candidate cap
  * any real dictionary applies), one join on (pageId, entityId) for the
  * context bonus, one max_by aggregation per mention. AQE handles hot norms.
  */
object ShuffleLinker {

  /** The SAME constant the in-extractor resolver uses — the byte-identical
    * equivalence of the two paths hinges on it. */
  val ContextBonus: Double = graft.extract.TripleExtractor.ContextBonus

  /** mentions: (pageId, mentionId, norm); aliases: (norm, entityId, prior).
    * Returns (pageId, mentionId, entityId) with -1 for unmatched mentions. */
  def linkMentions(mentions: DataFrame, aliases: DataFrame): DataFrame = {
    // dedup (norm, entityId) exactly like Gazetteer.build (max prior) —
    // duplicate alias rows would inflate nCands and flip an unambiguous
    // mention to ambiguous, silently diverging from the broadcast path
    val dedup = aliases.groupBy("norm", "entityId")
      .agg(max("prior").as("prior"))
    // candidate cardinality per norm (drives the unambiguous fast path)
    val counted = dedup
      .withColumn("nCands", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("norm")))

    val cands = mentions.join(counted, Seq("norm"), "left")

    // page context = entities of unambiguous mentions (distinct per page)
    val ctx = cands.filter(col("nCands") === 1)
      .select(col("pageId"), col("entityId")).distinct()
      .withColumn("inCtx", lit(1))

    // score every candidate; unmatched mentions keep a null entityId
    val scored = cands
      .join(ctx, Seq("pageId", "entityId"), "left")
      .withColumn("score",
        col("prior") + when(col("inCtx").isNotNull, ContextBonus).otherwise(0.0))

    // argmax per mention: max(struct(score, -entityId)) = highest score,
    // ties to the SMALLEST entity id — the local resolver's exact rule
    scored.groupBy("pageId", "mentionId")
      .agg(max(struct(col("score"), negate(col("entityId")).as("negId"))).as("best"))
      .select(col("pageId"), col("mentionId"),
        coalesce(negate(col("best.negId")), lit(-1L)).cast("long").as("entityId"))
  }
}
