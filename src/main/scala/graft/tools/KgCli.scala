package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.Steps
import graft.store.TableIO

/** The joern-tools CLI contract (SURVEY.md §2.7: thin verb per tool, ids in,
  * TSV on stdout) over materialized KG tables:
  *
  *   runMain graft.tools.KgCli <tablesDir> <verb> [args...]
  *
  *   lookup <kind> <codeRegex>        ≙ joern-lookup
  *   code <id> [id...]                ≙ joern-code
  *   edges <kind>                     ≙ joern-edge
  *   slice <forward|backward> <depth> <id> [id...]   ≙ joern-slice
  *   list-pages                       ≙ joern-list-files
  *   list-entities                    ≙ joern-list-funcs
  *   build <nPages>                   ≙ joern-parse + joern-import: run the
  *                                      pipeline on the synthetic corpus and
  *                                      materialize tables into <tablesDir>
  *   import-ref <nodes.csv> <edges.csv>  ≙ joern-import for a REAL reference
  *                                      CSV export (TSV interchange format)
  *   coref <id> [id...]               interproc expansion: mentions -> all
  *                                      co-referent mentions via the entity
  *   tag <tag> <id> [id...]           ≙ joern-tag (tags table, merged)
  *   list-tags                        list the tags table
  *
  * Output: header + rows, tab-separated, maps JSON-ish, deterministic order.
  */
object KgCli {

  /** Verb dispatch — returns the result frame (main prints it as TSV). */
  def run(spark: SparkSession, tablesDir: String, verb: String, args: Seq[String]): DataFrame = {
    lazy val nodes = TableIO.read(spark, s"$tablesDir/nodes")
    lazy val edges = TableIO.read(spark, s"$tablesDir/edges")
    verb match {
      case "build" =>
        val cfg = graft.model.PageGen.Config(nPages = args(0).toInt)
        val t = graft.Pipeline.run(spark, graft.model.PageGen.pages(spark, cfg), cfg.nPersons)
        val counters = graft.Pipeline.materialize(spark, t, tablesDir)
        import spark.implicits._
        counters.toSeq.sortBy(_._1).toDF("counter", "value")
      case "import-ref" =>
        // ≙ joern-import: load a reference nodes.csv/edges.csv export into
        // graft tables (FK-validated; dangling edges counted, not dropped).
        // OVERWRITE semantics: stale tables are invalidated first — without
        // this, writeBucketed would see every bucket committed and silently
        // keep the old data while reporting success
        for (tbl <- Seq("nodes", "edges"))
          if (TableIO.readManifest(s"$tablesDir/$tbl").isDefined)
            TableIO.invalidateBuckets(s"$tablesDir/$tbl", (0 until TableIO.NumBuckets).toSet)
        val nodes = graft.sources.RefCsvGraphSource.readNodes(spark, args(0))
        val edges = graft.sources.RefCsvGraphSource.readEdges(spark, args(1))
        val (valid, dangling) = graft.sources.RefCsvGraphSource.validated(nodes, edges)
        val nm = TableIO.writeBucketed(nodes, s"$tablesDir/nodes", col("id"),
          Map("danglingEdges" -> dangling))
        val em = TableIO.writeBucketed(valid, s"$tablesDir/edges", col("src"),
          Map("danglingEdges" -> dangling))
        import spark.implicits._
        Seq(("nodes", nm.buckets.values.sum), ("edges", em.buckets.values.sum),
          ("danglingEdges", dangling)).toDF("counter", "value")
      case "lookup" =>
        Steps.nodesWithKindAndCodeRegex(nodes, args(0), args(1))
          .drop("props").orderBy("id")
      case "code" =>
        nodes.filter(col("id").isin(args.map(_.toLong): _*))
          .select("id", "code").orderBy("id")
      case "edges" =>
        edges.filter(col("kind") === args(0)).orderBy("src", "dst")
      case "slice" =>
        require(args(0) == "forward" || args(0) == "backward",
          s"slice direction must be forward|backward, got '${args(0)}'")
        val ids = args.drop(2).map(_.toLong)
        val seeds = nodes.filter(col("id").isin(ids: _*))
        val sliced =
          if (args(0) == "backward")
            Steps.backwardSlice(seeds, edges, nodes, symbols = Nil,
              depth = args(1).toInt, kinds = Seq("LINKS_TO", "SAME_AS", "NEXT_MENTION"))
          else
            Steps.forwardSlice(seeds, edges, nodes, symbols = Nil,
              depth = args(1).toInt, kinds = Seq("LINKS_TO", "SAME_AS", "NEXT_MENTION"))
        sliced.drop("props").orderBy("id")
      case "list-pages" =>
        nodes.filter(col("kind") === "Page").select("id", "code").orderBy("code")
      case "list-entities" =>
        nodes.filter(col("kind") === "Entity").select("id", "code").orderBy("id")
      case "coref" =>
        val seeds = nodes.filter(col("id").isin(args.map(_.toLong): _*))
        Steps.corefMentions(seeds, edges, nodes).drop("props").orderBy("id")
      // ≙ joern-tag / joern-unhide: tags live in their own bucketed table,
      // appended by predicate-invalidation + rewrite (no node mutation)
      case "tag" =>
        import spark.implicits._
        val (tag, ids) = (args.head, args.tail.map(_.toLong))
        val existing =
          if (TableIO.readManifest(s"$tablesDir/tags").isDefined)
            TableIO.read(spark, s"$tablesDir/tags") else Seq.empty[(Long, String)].toDF("id", "tag")
        // write the NEW snapshot to a sibling dir first, then swap — a
        // crash mid-rewrite must never lose the only durable copy of the
        // tags (a checkpoint is executor-local, not durable)
        val merged = existing.unionByName(ids.map((_, tag)).toDF("id", "tag"))
          .distinct().localCheckpoint(true)
        val tmp = s"$tablesDir/tags.new"
        TableIO.deleteRecursively(tmp)
        TableIO.writeBucketed(merged, tmp, col("id"))
        TableIO.deleteRecursively(s"$tablesDir/tags")
        java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
          java.nio.file.Paths.get(s"$tablesDir/tags"))
        merged.orderBy("id", "tag")
      case "list-tags" =>
        TableIO.read(spark, s"$tablesDir/tags").orderBy("id", "tag")
      case other =>
        throw new IllegalArgumentException(
          s"unknown verb '$other' (build|import-ref|lookup|code|edges|slice|coref|tag|list-tags|list-pages|list-entities)")
    }
  }

  /** TSV rendering: tabs/newlines in values escaped exactly like the
    * reference writer (`ASTNodeFactory.java:45-51`). */
  def toTsv(df: DataFrame, limit: Int = 10000): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect().map(_.toSeq.map {
      case null => ""
      case m: Map[_, _] => m.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(",")
      case v => v.toString.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
    }.mkString("\t"))
    (cols.mkString("\t") +: rows).mkString("\n")
  }

  def main(argv: Array[String]): Unit = {
    if (argv.length < 2) {
      System.err.println("usage: KgCli <tablesDir> <verb> [args...]")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-kgcli")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try println(toTsv(run(spark, argv(0), argv(1), argv.drop(2).toSeq)))
    finally spark.stop()
  }
}
