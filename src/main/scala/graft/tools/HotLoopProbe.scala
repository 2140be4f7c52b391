package graft.tools

/** Single-threaded extraction micro-profile (no Spark): where does a
  * page-second go? `runMain graft.tools.HotLoopProbe [nPages]` */
object HotLoopProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3000
    val cfg = graft.model.PageGen.Config(nPages = n, sentMin = 40, sentMax = 80)
    val gaz = graft.Pipeline.defaultGazetteer(cfg.nPersons)
    val auto = graft.extract.PatternAutomaton.compile(graft.extract.PatternAutomaton.DefaultRules)
    val pages = (0L until n.toLong).map(i => graft.model.PageGen.page(cfg, i)).toArray

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hot] $name ${(System.nanoTime() - t0) / 1e9}%.3f s (sink=$r)")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      time("extractPage full")(pages.map(p =>
        graft.extract.TripleExtractor.extractPage(p, gaz, auto).triples.size.toLong).sum)
      time("html->text")(pages.map(p =>
        graft.extract.TextExtractor.pageText(p.html, p.text).length.toLong).sum)
      val texts = pages.map(p => graft.extract.TextExtractor.pageText(p.html, p.text))
      time("sentences")(texts.map(t => graft.extract.Tokenizer.sentences(t).length.toLong).sum)
      val sents = texts.flatMap(graft.extract.Tokenizer.sentences)
      time("tokens")(sents.map(s => graft.extract.Tokenizer.tokens(s).length.toLong).sum)
      val toks = sents.map(graft.extract.Tokenizer.tokens)
      time("norm")(toks.map(_.map(_.toLowerCase).length.toLong).sum)
      val norms = toks.map(_.map(_.toLowerCase))
      time("trie findMentions")(norms.map(ns => gaz.findMentions(ns).size.toLong).sum)
    }
  }
}
