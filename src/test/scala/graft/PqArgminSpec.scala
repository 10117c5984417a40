package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence pin for the r20 PQ-encode rewrite (q80/q102): the
  * map-side-combinable `MIN(d2·64 + k)` argmin must reproduce the oracle's
  * `row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) = 1` rows
  * bit-for-bit, including ties (equal d2 → smaller k wins) and the
  * decimal(38,0) encoding's no-overflow contract at the extreme long d2.
  */
class PqArgminSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(enc: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("k"))
    enc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("vec_id", "m", "k")
  }

  test("pqArgmin equals the row_number window form, ties to the smaller k") {
    val enc = Seq(
      // plain argmin
      (1L, 0, 0L, 9L), (1L, 0, 1L, 3L), (1L, 0, 2L, 5L),
      // tie on d2: k=4 must win over k=7
      (1L, 1, 7L, 2L), (1L, 1, 4L, 2L), (1L, 1, 9L, 8L),
      // second vector, zero distance
      (2L, 0, 63L, 0L), (2L, 0, 0L, 1L))
      .toDF("vec_id", "m", "k", "d2")
    val got = queries.Similarity.pqArgmin(enc)
      .as[(Long, Int, Long)].collect().toSet
    val want = windowForm(enc).as[(Long, Int, Long)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, 0, 1L), (1L, 1, 4L), (2L, 0, 63L)))
  }

  test("the encoding survives the largest representable long d2") {
    // d2·64 overflows a long exactly here — the decimal(38,0) widening is
    // what keeps the rewrite total; ANSI would have thrown on the long form
    val enc = Seq((1L, 0, 5L, Long.MaxValue), (1L, 0, 2L, Long.MaxValue))
      .toDF("vec_id", "m", "k", "d2")
    val got = queries.Similarity.pqArgmin(enc).as[(Long, Int, Long)].collect().toSet
    assert(got === Set((1L, 0, 2L)))
  }

  test("real-corpus encode: agg form matches the window form end to end") {
    val dir = "/root/testdata/sf0.001"
    graft.plans.GraftExtensions.register(spark)
    val e6 = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        call_function("quantize_scaled", col("embedding"), lit(6)).as("q6"))
    val sub = e6.select(col("vec_id"),
      posexplode(array((0 until 8).map(m =>
        slice(col("q6"), m * 8 + 1, 8)): _*)).as(Seq("m", "sq")))
    val cb = sub.filter(col("vec_id") < 64)
      .select(col("m").as("cm"), col("vec_id").as("k"), col("sq").as("csq"))
    val enc = sub.join(broadcast(cb), col("cm") === col("m"))
      .select(col("vec_id"), col("m"),
        col("k"), call_function("l2_i64", col("sq"), col("csq")).as("d2"))
    val got = queries.Similarity.pqArgmin(enc)
      .as[(Long, Int, Long)].collect().toSet
    val want = windowForm(enc).as[(Long, Int, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }
}
