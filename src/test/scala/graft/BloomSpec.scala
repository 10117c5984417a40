package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Bloom

/** operators.Bloom — the sketch-broadcast semi/anti join reduction.
  *
  * The contract is EXACTNESS of the composite (sketch pre-filter + verify
  * join ≡ the plain join; Bloom false positives are removed by the verify,
  * false negatives cannot exist), plus the plan property that makes it the
  * scale path: the big side's membership predicate sits above its scan with
  * no exchange below it.
  */
class BloomSpec extends SparkSpec {

  private def orders = Tables(spark, sf, "orders")
  private def customer = Tables(spark, sf, "customer")

  test("semiJoin equals the plain left_semi join") {
    val expected = orders.join(
        customer.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val got = Bloom.semiJoin(
        orders, "o_custkey",
        customer.filter(col("c_mktsegment") === "BUILDING"), "c_custkey",
        expectedItems = 1000L)
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("antiJoin equals the plain left_anti join") {
    val expected = orders.join(
        customer.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val got = Bloom.antiJoin(
        orders, "o_custkey",
        customer.filter(col("c_mktsegment") === "BUILDING"), "c_custkey",
        expectedItems = 1000L)
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("empty small side: semi is empty, anti keeps everything") {
    val none = customer.filter(col("c_custkey") < 0)
    assert(Bloom.semiJoin(orders, "o_custkey", none, "c_custkey", 10L).isEmpty)
    assert(Bloom.antiJoin(orders, "o_custkey", none, "c_custkey", 10L).count()
      == orders.count())
  }

  test("sketch has no false negatives: every true member passes mightContain") {
    val keys = customer.select(col("c_custkey"))
    val bytes = Bloom.sketchBytes(keys, col("c_custkey"), 1000L).get
    val misses = keys.filter(!Bloom.mightContain(bytes, col("c_custkey"))).count()
    assert(misses == 0L)
  }

  test("the pre-filter prunes: non-members mostly fail mightContain") {
    // 3% target FPR at the sized estimate — assert a loose 20% so the test
    // pins pruning-happens, not the sketch's exact bit layout
    val members = customer.filter(col("c_custkey") % 2 === 0)
    val bytes = Bloom.sketchBytes(members, col("c_custkey"), 1000L).get
    val nonMembers = customer.filter(col("c_custkey") % 2 === 1)
    val total = nonMembers.count()
    val pass = nonMembers.filter(Bloom.mightContain(bytes, col("c_custkey"))).count()
    assert(total > 0 && pass.toDouble / total < 0.2,
      s"$pass of $total non-members passed the sketch")
  }
}
