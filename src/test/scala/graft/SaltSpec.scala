package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt

/** Salted aggregation must equal the direct aggregation on skewed data,
  * and the partial phase must actually spread the hot key. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows carry one hot key
  private def skewed = spark.range(0, 10000)
    .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
      (col("id") % 7).cast("long").as("v"),
      col("id"))

  test("salted sum/count equals the direct groupBy") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), buckets = 8, sums = Seq("v"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct && direct.nonEmpty)
  }

  test("the hot key spreads over multiple salt buckets in phase one") {
    // uses the operator's own salt formula (Salt.saltCol), so a change to
    // the derivation that stops spreading the hot key fails here
    val spread = skewed
      .withColumn("__salt", Salt.saltCol(Seq("id"), 8))
      .filter(col("k") === 0)
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 buckets")
  }

  test("salting is deterministic under re-execution (hash, not rand)") {
    val a = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), 8, Seq("v")).collect().toSet
    val b = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), 8, Seq("v")).collect().toSet
    assert(a == b)
  }
}
