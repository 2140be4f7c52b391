package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset re-dump (comma-separated entry names): after an
    // oracle fix, re-verifying 2-3 entries at a large basis should not
    // cost a full 102-entry pass. oracle_sql.json is still written in
    // full, so a subsequent check run stays self-consistent.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // single-threaded oracle leaf dumps (the reference's
    // output-vs-in-memory-recompute test shape — see VerifyOracle); the
    // `{{ORA}}` placeholder in dump-backed oracle SQL resolves to wherever
    // THIS run wrote them, so the driver's DuckDB finds them regardless of
    // its outDir choice
    // Subset mode skips the (expensive, single-threaded) oracle leaf dump
    // unless a selected entry actually reads it via {{ORA}}.
    val needOra = only.forall(_.exists(n =>
      SparkEntry.oracleSql.get(n).exists(_.contains("{{ORA}}"))))
    if (needOra)
      try VerifyOracle.dump(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] oracle dump failed: ${e.getMessage}")
      }
    val oraDir = Paths.get(outDir).toAbsolutePath.normalize.toString + "/_oracle"
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{{ORA}}", oraDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
