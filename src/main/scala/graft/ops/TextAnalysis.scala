package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over a
  * `documents(doc_id, text, lang, source, n_chars)` table. All pure column
  * expressions (whole-stage codegen; no UDFs in the hot path).
  */
object TextAnalysis {

  /** Whitespace token counts (the cheap path; see [[bpeTokenEstimate]]).
    * Splits on whitespace RUNS with empties dropped — a literal-space split
    * counted "a  b" as three tokens and "a\nb" as one. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => t =!= "")).as("n_ws_tokens"),
      col("n_chars"))
      .orderBy("doc_id")

  /** Simple quality signals: length, token count, character-class ratios. */
  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).as("len"),
      size(filter(split(col("text"), "\\s+"), t => t =!= "")).as("n_tokens"),
      round((length(col("text")) -
        length(regexp_replace(regexp_replace(col("text"), lit(" "), lit("")), lit("e"), lit("")))
        ).cast("double") / length(col("text")), 4).as("space_e_ratio"))
      .orderBy("doc_id")

  /** BPE-ish token estimate: words + digits + punctuation runs, via a single
    * regexp count (≈ GPT-style tokenizer pre-split). */
  def bpeTokenEstimate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(filter(split(col("text"), "[^A-Za-z0-9]+"), x => x =!= "")).as("n_word_tokens"),
      size(filter(split(col("text"), "[A-Za-z0-9\\s]+"), x => x =!= "")).as("n_punct_runs"))

  /** Language ID by stopword-hit ratio over small per-language lexicons —
    * an n-gram-free heuristic that is a pure column expression. */
  private val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "para", "en"))

  /** Exposed for the DuckDB oracle generator (Queries builds the equivalent
    * SQL from the same word lists — one source of truth). */
  private[graft] def stopWords: Map[String, Seq[String]] = StopWords

  def langId(docs: DataFrame): DataFrame = {
    // INTEGER-exact argmax: all languages share the same token count, so
    // comparing hit COUNTS is equivalent to comparing hit ratios — and an
    // integer compare is reproducible in any engine (no float tie-break).
    // Tie-break: language name ascending; zero hits anywhere -> "unk".
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val scored = StopWords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(negate(size(filter(toks, t => t.isin(words.map(lit(_)): _*)))).as("neg_hits"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*)).getItem(0)
    docs.select(col("doc_id"),
      when(best.getField("neg_hits") === 0, lit("unk"))
        .otherwise(best.getField("lang")).as("pred_lang"),
      negate(best.getField("neg_hits")).cast("long").as("n_hits"),
      size(toks).cast("long").as("n_toks"))
  }

  /** Rolling-hash document fingerprint: min-k of 8-gram Rabin-Karp hashes
    * (winnowing-style). Computed as a column expression over token shingles. */
  def fingerprint(docs: DataFrame, shingleLen: Int = 8, keep: Int = 4): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val n = size(toks)
    val idx = sequence(lit(0), greatest(n - lit(shingleLen), lit(0)))
    val shingleHashes = transform(idx,
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(shingleLen)))))
    docs.select(col("doc_id"),
      slice(array_sort(shingleHashes), 1, keep).as("fingerprint"))
  }

  /** PII patterns deliberately restricted to syntax with IDENTICAL
    * semantics in Java regex (Spark) and RE2 (the DuckDB oracle): plain
    * classes, no backrefs, no lookaround, no \b. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** PII scan + redaction — the compliance pass every training-data
    * pipeline runs before a corpus ships: per-document match counts for
    * email addresses and phone-shaped numbers, plus the md5 of the text
    * with every match replaced by its placeholder (emails first, then
    * phones — order is part of the contract). Pure per-row column
    * expressions, zero shuffle; the md5 keeps the redacted text
    * hash-comparable without dumping megabytes through the driver gate. */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col("doc_id"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(t, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]")).as("redacted_md5"))
  }
}
