package graft.store

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Pins the partKeys bucket→write-task mapping to Spark's ACTUAL shuffle
  * placement: partKeys hard-codes Spark's internal HashPartitioning hash
  * (Murmur3_x86_32, seed 42). If a Spark upgrade ever changes that hash,
  * the claimed bijective 1 bucket : 1 reduce task mapping silently degrades
  * back to skewed/empty writers — this test makes the dependency fail
  * loudly instead (correctness is unaffected either way: partitionBy still
  * routes rows to the right directory).
  */
class PartKeysSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.TestSpark.spark

  test("repartition on remapped key places exactly one bucket per shuffle partition") {
    import spark.implicits._
    for (n <- Seq(4, 8, 32, 100)) {
      val keys = TableIO.partKeys(n)
      keys.length shouldBe n
      val df = (0 until n).flatMap(b => Seq.fill(3)(b)).toDF("bucket")
        .repartition(n, element_at(typedLit(keys.toSeq), col("bucket") + 1))
        .withColumn("part", spark_partition_id())
      val placement = df.select("bucket", "part").distinct().collect()
        .map(r => r.getInt(0) -> r.getInt(1))
      withClue(s"n=$n:") {
        // each bucket lands in exactly one partition...
        placement.length shouldBe n
        // ...and that partition is the bucket's own id (bijective identity)
        placement.foreach { case (b, p) => p shouldBe b }
      }
    }
  }
}
