package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Guards the single-threaded oracle twins in [[VerifyOracle]] against drift
  * from the Spark expressions they mirror — if any of these breaks, a dump-
  * backed DuckDB oracle would silently diverge from the distributed path. */
class VerifyOracleSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  test("every registry entry carries a DuckDB oracle (no silent drift)") {
    SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
  }

  test("kgPages ladder: the sf1 branch must not shadow the driver dirs") {
    Queries.kgPages("/root/testdata/sf0.001") shouldBe 500
    Queries.kgPages("/root/testdata/sf0.01") shouldBe 4000
    Queries.kgPages("/root/testdata/sf0.1") shouldBe 20000
    Queries.kgPages("/dev/shm/graft-sf1") shouldBe 200000
  }

  test("sparkXxhash64 equals the xxhash64 expression (1-arg and chained)") {
    import spark.implicits._
    val samples = Seq("", "a", "Domain", "host0.example.com", "Jürgen Müller ★",
      "a long string with several words and 1234 numbers")
    val df = samples.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h1"),
        xxhash64(lit("Domain"), col("s")).as("h2"))
      .collect()
    df.foreach { r =>
      val s = r.getString(0)
      VerifyOracle.sparkXxhash64(Seq(s)) shouldBe r.getLong(1)
      VerifyOracle.sparkXxhash64(Seq("Domain", s)) shouldBe r.getLong(2)
    }
  }

  test("initialLabel equals the neighborhood-hash initial-label column") {
    import spark.implicits._
    val rows = Seq(("Mention", "Ada Lovelace"), ("Entity", "12345"), ("Host", "host0.example.com"),
      ("Triple", "works_for"), ("Mention", "007"), ("Page", "https://x/y"))
    val df = rows.toDF("kind", "code")
      .select(col("kind"), col("code"),
        (abs(when(col("code").rlike("^[0-9]+$"), xxhash64(lit("A_NUMBER")))
          .otherwise(xxhash64(col("kind"), col("code")))) % 65536).as("label"))
      .collect()
    df.foreach { r =>
      VerifyOracle.initialLabel(r.getString(0), r.getString(1)) shouldBe r.getLong(2)
    }
  }

  test("fingerprintMin equals TextAnalysis.fingerprint's min element") {
    import spark.implicits._
    val texts = Seq(
      "one two three four five six seven eight nine ten eleven twelve",
      "short doc", // < shingle length: the truncated-shingle edge case
      "a a a a a a a a a a a a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sparkMin = graft.ops.TextAnalysis.fingerprint(docs)
      .select(col("doc_id"), element_at(col("fingerprint"), 1).as("fp0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      VerifyOracle.fingerprintMin(t) shouldBe sparkMin(i.toLong)
    }
  }

  test("domainOf equals graphTables' registrable-domain column") {
    import spark.implicits._
    val hosts = Seq("host0.example.com", "a.b.c.d.org", "intranet", "x.y")
    val df = hosts.toDF("host")
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("domain",
        when(org.apache.spark.sql.functions.size(col("labels")) < lit(2), col("host"))
        .otherwise(array_join(slice(col("labels"), -2, 2), ".")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    hosts.foreach { h => VerifyOracle.domainOf(h) shouldBe df(h) }
  }
}
