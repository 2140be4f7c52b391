package graft.extract

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction.
  *
  * The per-row invariant (BASELINE.json input_hint): extracted text is
  * byte-identical per url, across partitionings, core counts and runs —
  * the analog of the reference's normalized `code` strings
  * (joern-fuzzyc `parsing/ParseTreeUtils.childTokenString`,
  * `parsing/ParseTreeUtils.java:7-39`: tokens joined by single spaces,
  * deterministically).
  *
  * Pure function `Array[Byte] => String`, hand-rolled single-pass scanner
  * (no codegen-dependent string functions, no regex backtracking): the same
  * code runs in executors, in unit tests, and in the single-threaded oracle.
  *
  * Semantics (fixed, documented, versioned by `ExtractorVersion`):
  *   - UTF-8 decode (malformed bytes replaced);
  *   - `<!-- -->` comments dropped;
  *   - contents of script/style/nav/header/footer/title/noscript dropped;
  *   - block tags (p, div, li, h1-h6, br, tr, ul, ol, table, section,
  *     article, blockquote, pre, body, head, html) delimit blocks;
  *   - all other tags stripped;
  *   - entities decoded: amp lt gt quot apos nbsp copy + numeric `&#NNN;`;
  *   - per block: whitespace runs collapsed to one space, trimmed,
  *     empty blocks dropped;
  *   - blocks joined with "\n".
  */
object TextExtractor {
  val ExtractorVersion = 1

  private val DropContent = Set("script", "style", "nav", "header", "footer", "title", "noscript")
  private val BlockTags = Set(
    "p", "div", "li", "br", "tr", "ul", "ol", "table", "section", "article",
    "blockquote", "pre", "body", "head", "html",
    "h1", "h2", "h3", "h4", "h5", "h6")

  /** Extract text for a page: html when present, else the text column. */
  def pageText(html: Array[Byte], text: String): String =
    if (html == null) { if (text == null) "" else text } else extract(html)

  def extract(html: Array[Byte]): String = extract(new String(html, StandardCharsets.UTF_8))

  def extract(doc: String): String = {
    val blocks = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      val b = collapseWs(cur.toString)
      if (b.nonEmpty) blocks += b
      cur.setLength(0)
    }
    val n = doc.length
    var i = 0
    while (i < n) {
      val c = doc.charAt(i)
      if (c == '<') {
        if (doc.startsWith("<!--", i)) {
          val end = doc.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = doc.indexOf('>', i + 1)
          if (close < 0) { i = n } // truncated tag: drop rest
          else {
            val inner = doc.substring(i + 1, close)
            val name = tagName(inner)
            if (DropContent.contains(name) && !inner.startsWith("/") && !inner.endsWith("/")) {
              val endTag = "</" + name
              val lo = indexOfIgnoreCase(doc, endTag, close + 1)
              if (lo < 0) { i = n }
              else {
                val gt = doc.indexOf('>', lo)
                i = if (gt < 0) n else gt + 1
              }
            } else {
              if (BlockTags.contains(name)) flush()
              i = close + 1
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(doc, i)
        cur.append(decoded)
        i = next
      } else {
        cur.append(c)
        i += 1
      }
    }
    flush()
    blocks.result().mkString("\n")
  }

  private def tagName(inner: String): String = {
    var s = inner
    if (s.startsWith("/")) s = s.substring(1)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length && (s.charAt(i).isLetterOrDigit)) { sb.append(toLowerAscii(s.charAt(i))); i += 1 }
    sb.toString
  }

  private def toLowerAscii(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val limit = hay.length - nl
    while (i <= limit) {
      var j = 0
      while (j < nl && toLowerAscii(hay.charAt(i + j)) == toLowerAscii(needle.charAt(j))) j += 1
      if (j == nl) return i
      i += 1
    }
    -1
  }

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©")

  /** Decode one entity at position i (doc(i) == '&'); returns (text, nextIndex). */
  private def decodeEntity(doc: String, i: Int): (String, Int) = {
    val semi = doc.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 9) ("&", i + 1)
    else {
      val body = doc.substring(i + 1, semi)
      if (body.startsWith("#")) {
        val numStr = body.substring(1)
        val cp =
          try {
            if (numStr.startsWith("x") || numStr.startsWith("X")) Integer.parseInt(numStr.substring(1), 16)
            else Integer.parseInt(numStr)
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 0 && Character.isValidCodePoint(cp)) (new String(Character.toChars(cp)), semi + 1)
        else ("&", i + 1)
      } else Named.get(body) match {
        case Some(s) => (s, semi + 1)
        case None    => ("&", i + 1)
      }
    }
  }

  private def collapseWs(s: String): String = {
    val sb = new StringBuilder
    var lastWs = true // leading ws trimmed
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u00a0') {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else { sb.append(c); lastWs = false }
      i += 1
    }
    var len = sb.length
    while (len > 0 && sb.charAt(len - 1) == ' ') len -= 1
    sb.substring(0, len)
  }
}
