package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PageGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` entries whose name starts with `kg_` run the from-scratch
  * KG-construction pipeline on the deterministic synthetic page corpus
  * (BASELINE.json input_hint — the TPC-H-ish tables in sfDir are not its
  * input); they are rows-only checked. All other entries read the sfDir
  * parquet tables and have DuckDB oracles in `oracleSql`.
  */
object SparkEntry {

  /** Synthetic corpus size keyed to the harness scale dir. */
  private def kgPages(sfDir: String): Int =
    if (sfDir.contains("sf0.1")) 20000
    else if (sfDir.contains("sf0.01")) 4000
    else 500

  private def kgTables(spark: SparkSession, sfDir: String): Pipeline.Tables = {
    val cfg = PageGen.Config(nPages = kgPages(sfDir))
    Pipeline.run(spark, PageGen.pages(spark, cfg), cfg.nPersons)
  }

  /** Flagship query on sf=0.001-equivalent scale; driver smoke-checks rows>0:
    * canonical triples whose subject is the head entity, with provenance. */
  def entry(spark: SparkSession): DataFrame = {
    val t = kgTables(spark, "sf0.001")
    t.triples.filter(col("subj") === 0L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
