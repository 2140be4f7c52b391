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

  /** Flagship query on sf=0.001-equivalent scale; driver smoke-checks rows>0:
    * canonical triples whose subject is the head entity, with provenance.
    * Scale ladder + build cache live in [[Queries.kg]] (one source of truth). */
  def entry(spark: SparkSession): DataFrame =
    Queries.kg(spark, "sf0.001").triples.filter(col("subj") === 0L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
