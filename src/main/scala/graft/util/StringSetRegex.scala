package graft.util

/** Discriminating-regex generation from a string set — ≙ the reference's
  * `StringSetToRegex` pass behind `scripts/ml/joern-regex:1-24`: emit one
  * compact ANCHORED regex that matches exactly the input set, folding shared
  * prefixes through a character trie (so {"foo", "fob"} renders as `fo[bo]`,
  * not two alternation branches). Metacharacters in the inputs are escaped,
  * so the regex is safe to feed back into `lookup <kind> <regex>`. */
object StringSetRegex {

  private def esc(c: Char): String =
    if ("\\^$.|?*+()[]{}".indexOf(c.toInt) >= 0) "\\" + c else c.toString

  /** Escaping inside a character class: only `\ ] ^ -` are special. */
  private def escClass(c: Char): String =
    if ("\\]^-".indexOf(c.toInt) >= 0) "\\" + c else c.toString

  private final class Node {
    val kids = scala.collection.mutable.SortedMap.empty[Char, Node]
    var terminal = false
  }

  /** Regex for the suffix set below `n` (empty string when `n` is a leaf). */
  private def suffix(n: Node): String = {
    if (n.kids.isEmpty) return ""
    val branches = n.kids.toSeq.map { case (c, k) => (c, k) }
    val body =
      if (branches.size > 1 && branches.forall { case (_, k) => k.kids.isEmpty && k.terminal })
        // all branches are single terminal chars -> one character class
        "[" + branches.map(b => escClass(b._1)).mkString + "]"
      else if (branches.size == 1) {
        val (c, k) = branches.head
        esc(c) + suffix(k)
      } else
        "(?:" + branches.map { case (c, k) => esc(c) + suffix(k) }.mkString("|") + ")"
    // terminal mid-trie node: the whole suffix below is optional (a group
    // wrap keeps the `?` scoped over multi-char sequences)
    if (n.terminal) "(?:" + body + ")?" else body
  }

  /** One anchored regex matching exactly `strings` (duplicates ignored). */
  def compile(strings: Seq[String]): String = {
    require(strings.nonEmpty, "StringSetRegex: empty string set")
    val root = new Node
    strings.distinct.foreach { s =>
      var n = root
      s.foreach(c => n = n.kids.getOrElseUpdate(c, new Node))
      n.terminal = true
    }
    "^(?:" + suffix(root) + ")$"
  }
}
