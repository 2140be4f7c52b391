package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.PageGen

/** The query registry behind SparkEntry: one entry per implemented operator
  * (SURVEY.md §2), plus the training-data-pipeline operator suite.
  *
  * Naming convention:
  *   kg_*  — KG-construction pipeline over the synthetic page corpus
  *           (rows-only check; not SQL-expressible)
  *   q*    — relational operators over the sfDir TPC-H-ish tables (oracled)
  *   d*    — documents-table training-data ops (oracled where expressible)
  *   e*    — embeddings-table similarity ops
  */
object Queries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // --- KG pipeline (cached per session+scale: several queries share one build)
  private val kgCache = new java.util.concurrent.ConcurrentHashMap[String, Pipeline.Tables]()
  private[graft] def kg(spark: SparkSession, sfDir: String): Pipeline.Tables =
    kgCache.computeIfAbsent(sfDir + "@" + spark.hashCode(), _ => {
      val n = if (sfDir.contains("sf0.1")) 20000 else if (sfDir.contains("sf0.01")) 4000 else 500
      val cfg = PageGen.Config(nPages = n)
      Pipeline.run(spark, PageGen.pages(spark, cfg), cfg.nPersons)
    })

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- KG construction (the north-rule pipeline) ----------------
    "kg_triples" -> ((s, d) => kg(s, d).triples),
    "kg_components" -> ((s, d) => kg(s, d).components),
    "kg_nodes" -> ((s, d) => kg(s, d).nodes.drop("props")),
    "kg_edges" -> ((s, d) => kg(s, d).edges),
    "kg_mentions" -> ((s, d) => {
      import s.implicits._
      kg(s, d).extracted.flatMap(_.mentions).toDF()
    }),

    // ---------------- relational operator coverage (oracled) ----------------
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")),

    "q2_join_agg" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), round(sum("l_extendedprice"), 2).as("total_price"))
        .orderBy("o_orderpriority")
    }),

    "q3_broadcast_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy("n_name")
    }),

    "q4_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    "q5_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_with_orders"))
    }),

    "q6_window_latest" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id"))
      t(s, d, "events").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type").orderBy("user_id")
    }),

    "q7_json" -> ((s, d) => t(s, d, "events")
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("n")).orderBy("k_mod")),

    "q8_topk" -> ((s, d) => t(s, d, "events")
      .orderBy(col("value").desc, col("event_id")).limit(10)
      .select("event_id", "event_type", "value")),

    "q9_setops" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchasers = e.filter(col("event_type") === "purchase").select("user_id")
      val errorers = e.filter(col("event_type") === "error").select("user_id")
      purchasers.distinct().except(errorers.distinct()).orderBy("user_id")
    }),

    "q10_date_trunc" -> ((s, d) => t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day")),

    "q11_distinct" -> ((s, d) => t(s, d, "lineitem")
      .agg(countDistinct("l_partkey").as("n_parts"),
           countDistinct("l_suppkey").as("n_supps"))),

    "q12_string_funcs" -> ((s, d) => t(s, d, "part")
      .select(col("p_partkey"), upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix"))
      .orderBy("p_partkey").limit(100)),

    "q13_explode_tokens" -> ((s, d) => t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)),

    // ---------------- training-data ops: documents ----------------
    "d1_dedup_exact" -> ((s, d) => graft.ops.Dedup.exact(t(s, d, "documents"))),
    "d5_token_count" -> ((s, d) => graft.ops.TextAnalysis.tokenCounts(t(s, d, "documents"))),
    "d6_quality" -> ((s, d) => graft.ops.TextAnalysis.quality(t(s, d, "documents")))
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_agg" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_broadcast_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q5_semi_join" ->
      """SELECT count(*) AS n_with_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q6_window_latest" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q7_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_topk" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 10""".stripMargin,
    "q9_setops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "q10_date_trunc" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,
    "q12_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS name_len,
        | substring(p_name, 1, 5) AS prefix
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q13_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "d5_token_count" ->
      """SELECT doc_id, length(string_split(text, ' ')) AS n_ws_tokens, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d6_quality" ->
      """SELECT doc_id,
        | length(text) AS len,
        | length(string_split(text, ' ')) AS n_tokens,
        | round(CAST(length(text) - length(replace(replace(text, ' ', ''), 'e', '')) AS DOUBLE) / length(text), 4) AS space_e_ratio
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
