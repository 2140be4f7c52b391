package graft

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{Lit, PatternRule}
import graft.model.Page
import graft.store.TableIO

/** Rule-diff incremental recompute — the full G3 shape (≙ joern's
  * ArgumentTainter re-analyzing only affected functions and patching the
  * graph delta, `tools/argumentTainter/ArgumentTainterMain.java`,
  * `ddg/DataDependenceGraph/DDGDifference.java`).
  *
  * Given (oldRules, newRules):
  *   1. diff the rule sets structurally;
  *   2. derive the affected-page predicate — a page can gain or lose a
  *      triple of a changed rule only if its text contains EVERY literal of
  *      that rule (the necessary-condition prefilter, same shape as the
  *      reference's `queryTemplate.groovy` literal pre-grep). Substring
  *      containment over lowercased text is a strict superset of the
  *      tokenizer's view, so no affected page can be missed;
  *   3. map affected urls to their triples-table buckets, invalidate
  *      exactly those ([[TableIO.invalidateBuckets]] — manifest-first,
  *      crash-safe);
  *   4. re-extract ONLY pages hashing into the touched buckets (a bucket
  *      holds every page that hashes there, affected or not) under the new
  *      rules, reusing the materialized GLOBAL canonical mapping, and let
  *      [[TableIO.writeBucketed]] recompute exactly the missing buckets.
  *
  * If a `same_as` rule changed, the global canonical mapping itself is
  * stale and the recompute falls back to a full rebuild (all buckets) —
  * detected, not hoped away.
  *
  * Scale shape: the diff cost is proportional to |touched buckets| / |all
  * buckets| of the corpus, not to corpus size — extraction, canonical join
  * and write all run over the restricted page set only.
  */
object Incremental {

  /** Rules whose semantics changed: structural symmetric difference. */
  def changedRules(oldRules: Seq[PatternRule], newRules: Seq[PatternRule]): Seq[PatternRule] = {
    val o = oldRules.toSet
    val n = newRules.toSet
    ((o diff n) ++ (n diff o)).toSeq.sortBy(_.ruleId)
  }

  /** Necessary-condition predicate column: SOME changed rule has ALL its
    * literal words contained in lower(text). A literal-free rule matches
    * structurally anywhere → predicate true for every page. */
  def affectedPredicate(changed: Seq[PatternRule]): Column = {
    val perRule = changed.map { r =>
      val lits = r.items.collect { case Lit(w) => w.toLowerCase }
      if (lits.isEmpty) lit(true)
      else lits.map(w => lower(col("text")).contains(w)).reduce(_ && _)
    }
    if (perRule.isEmpty) lit(false) else perRule.reduce(_ || _)
  }

  private def bucketCol(numBuckets: Int): Column =
    pmod(xxhash64(col("url")), lit(numBuckets)).cast("int")

  /** Apply a rule diff to a materialized build at `outDir`. Returns the set
    * of invalidated/recomputed triples buckets (empty = no-op diff). */
  def applyRuleDiff(spark: SparkSession, pages: Dataset[Page],
                    oldRules: Seq[PatternRule], newRules: Seq[PatternRule],
                    outDir: String, nPersons: Int = 500,
                    numBuckets: Int = TableIO.NumBuckets): Set[Int] = {
    val changed = changedRules(oldRules, newRules)
    if (changed.isEmpty) return Set.empty

    // a same_as diff changes the connected-components input globally: the
    // materialized mapping is stale, so every bucket is affected
    val sameAsChanged = changed.exists(_.pred == "same_as")
    val touched: Set[Int] =
      if (sameAsChanged) (0 until numBuckets).toSet
      else pages.filter(affectedPredicate(changed))
        .select(bucketCol(numBuckets).as("b")).distinct()
        .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return Set.empty

    TableIO.invalidateBuckets(s"$outDir/triples", touched)

    val restricted =
      if (touched.size == numBuckets) pages
      else pages.filter(bucketCol(numBuckets).isin(touched.toSeq: _*))
    val components =
      if (sameAsChanged) None
      else Some(TableIO.read(spark, s"$outDir/components"))
    val t = Pipeline.run(spark, restricted, nPersons,
      rules = newRules, precomputedComponents = components)
    TableIO.writeBucketed(t.triples, s"$outDir/triples", col("url"),
      Map("ruleDiffTouchedBuckets" -> touched.size.toLong), numBuckets)
    if (sameAsChanged) {
      // refresh the mapping table too — later diffs depend on it
      TableIO.invalidateBuckets(s"$outDir/components", (0 until numBuckets).toSet)
      TableIO.writeBucketed(t.components, s"$outDir/components", col("id"),
        Map("ruleDiffTouchedBuckets" -> touched.size.toLong), numBuckets)
    }
    t.flat.unpersist(false)
    if (components.isEmpty) t.components.unpersist(false)
    touched
  }
}
