package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic Common-Crawl-style page corpus
  * (BASELINE.json input_hint: url, warc_ts, html, text, lang).
  *
  * Page i is a pure function of (seed, i): identical bytes for any
  * partitioning or core count. Mirrors the reference's inline code-string
  * fixtures (`FunctionContentTestUtil` parses literal strings,
  * joern-fuzzyc `parsing/ModuleParser.java:36-45`) — our fixtures are
  * literal sentence sets with closed-form expected triples.
  *
  * Skew is deliberate (north rule: "skew handled explicitly"):
  *   - 30% of pages land on mega-host host0 (partition skew);
  *   - entity 0 is a head entity appearing as subject in ~15% of sentences
  *     and as the hub of SAME_AS links (giant component in canonicalization).
  */
object PageGen {
  final case class Config(
      nPages: Int,
      nPersons: Int = 500,
      nHosts: Int = 50,
      seed: Long = 42L,
      megaHostFrac: Double = 0.30,
      nullHtmlFrac: Double = 0.10,
      nonEnFrac: Double = 0.10,
      // page weight: sentences per page, uniform in [sentMin, sentMax] —
      // bench uses 40..80 (Common-Crawl-like page text volume); tests keep
      // the light default (identical corpus bytes to the original config)
      sentMin: Int = 3,
      sentMax: Int = 8)

  val BaseTs: Long = 1767225600000L // 2026-01-01T00:00:00Z, fixed

  def host(cfg: Config, i: Long): String = {
    val r = Det.rand(cfg.seed, i, 1)
    val h = if (Det.nextDouble(r) < cfg.megaHostFrac) 0
            else 1 + Det.nextInt(Det.rand(cfg.seed, i, 2), cfg.nHosts - 1)
    val tld = if (h % 3 == 0) "com" else if (h % 3 == 1) "org" else "net"
    s"host$h.example.$tld"
  }

  def url(cfg: Config, i: Long): String = s"https://${host(cfg, i)}/p/$i"

  def lang(cfg: Config, i: Long): String = {
    val r = Det.rand(cfg.seed, i, 3)
    if (Det.nextDouble(r) < cfg.nonEnFrac) {
      Vector("de", "fr", "es", "zh")(Det.nextInt(Det.rand(cfg.seed, i, 4), 4))
    } else "en"
  }

  /** The sentences of page i — the ground truth `text` is their "\n"-join. */
  def sentences(cfg: Config, i: Long): Vector[String] = {
    val n = cfg.sentMin + Det.nextInt(Det.rand(cfg.seed, i, 5), cfg.sentMax - cfg.sentMin + 1)
    (0 until n).map(j => sentence(cfg, i, j)).toVector
  }

  private def pickPersonForm(cfg: Config, i: Long, j: Long, slot: Long, e: Long): String = {
    val r = Det.rand(cfg.seed, i, j * 31 + slot, 11)
    val d = Det.nextDouble(r)
    if (d < 0.60) KB.personFull(e)
    else if (d < 0.85) KB.personAbbrev(e)
    else KB.personLast(e)
  }

  private def pickSubject(cfg: Config, i: Long, j: Long): Long = {
    val r = Det.rand(cfg.seed, i, j * 31 + 1, 12)
    if (Det.nextDouble(r) < 0.15) 0L // head entity: deliberate key skew
    else Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 2, 13), cfg.nPersons).toLong
  }

  def sentence(cfg: Config, i: Long, j: Long): String = {
    val rule = Det.nextInt(Det.rand(cfg.seed, i, j * 31, 10), 100)
    val s = pickSubject(cfg, i, j)
    val subj = pickPersonForm(cfg, i, j, 1, s)
    if (rule < 18) { // works_for
      val o = KB.OrgIdBase + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 3, 14), KB.Orgs.size)
      val oSurf = if (Det.nextDouble(Det.rand(cfg.seed, i, j * 31 + 4, 15)) < 0.7)
        KB.orgFull(o) else KB.orgAcronym(o)
      s"$subj works for $oSurf ."
    } else if (rule < 36) { // born_in
      val p = KB.PlaceIdBase + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 5, 16), KB.Places.size)
      s"$subj was born in ${KB.placeName(p)} ."
    } else if (rule < 52) { // lives_in
      val p = KB.PlaceIdBase + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 6, 17), KB.Places.size)
      s"$subj lives in ${KB.placeName(p)} ."
    } else if (rule < 66) { // founded
      val o = KB.OrgIdBase + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 7, 18), KB.Orgs.size)
      s"$subj founded ${KB.orgFull(o)} ."
    } else if (rule < 78) { // met
      val t = Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 8, 19), cfg.nPersons).toLong
      val obj = pickPersonForm(cfg, i, j, 2, t)
      val p = KB.PlaceIdBase + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 9, 20), KB.Places.size)
      s"$subj met $obj in ${KB.placeName(p)} ."
    } else if (rule < 88) { // age (literal object)
      val a = 18 + Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 10, 21), 80)
      s"$subj is $a years old ."
    } else { // same_as — drives canonicalization. Full names only (unambiguous).
      val hub = Det.nextDouble(Det.rand(cfg.seed, i, j * 31 + 11, 22)) < 0.05
      if (hub) {
        val g = Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 12, 23), cfg.nPersons / 3)
        s"${KB.personFull(0L)} is also known as ${KB.personFull(3L * g)} ."
      } else {
        // within-group link: group g = {3g, 3g+1, 3g+2}; pair (b, b+1)
        val s2 = Det.nextInt(Det.rand(cfg.seed, i, j * 31 + 13, 24), cfg.nPersons - 1).toLong
        val b = if (s2 % 3 == 2) s2 - 1 else s2
        s"${KB.personFull(b)} is also known as ${KB.personFull(b + 1)} ."
      }
    }
  }

  def text(cfg: Config, i: Long): String = sentences(cfg, i).mkString("\n")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** HTML wrapping of the sentences + boilerplate the extractor must strip.
    * Invariant: TextExtractor.extract(html(cfg,i)) == text(cfg,i), byte-identical. */
  def html(cfg: Config, i: Long): Array[Byte] = {
    val r = Det.rand(cfg.seed, i, 6)
    if (Det.nextDouble(r) < cfg.nullHtmlFrac) null
    else {
      val ss = sentences(cfg, i)
      val body = ss.map(s => s"  <p>${esc(s)}</p>").mkString("\n")
      val doc =
        s"""<!DOCTYPE html>
           |<html><head><title>page $i</title>
           |<style> p { color: #333; } </style>
           |<script> var x = $i; if (x < 2) { x = x &amp;&amp; 1; } </script>
           |</head>
           |<body>
           |<nav><a href="/">home</a> | <a href="/about">about</a></nav>
           |<header>site header $i</header>
           |$body
           |<footer>copyright &copy; example</footer>
           |</body></html>""".stripMargin
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Pure single-page synthesis. */
  def page(cfg: Config, i: Long): Page =
    Page(url(cfg, i), new Timestamp(BaseTs + i * 1000L), html(cfg, i), text(cfg, i), lang(cfg, i))

  /** Distributed synthesis: `spark.range` + map — pure function of the index,
    * so output is invariant under partition count (tested). */
  def pages(spark: SparkSession, cfg: Config): Dataset[Page] = {
    import spark.implicits._
    val c = cfg
    spark.range(0L, cfg.nPages.toLong).map(i => page(c, i))
  }
}
