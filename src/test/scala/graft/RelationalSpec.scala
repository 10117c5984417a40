package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the relational query registry at sf0.001.
  * (Bit-exact oracle equality is checked by the driver's DuckDB gate and by
  * tools/verify_local.py; here we assert structural invariants.)
  */
class RelationalSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and runs at sf0.001") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.registry.foreach { q =>
      val df = q.build(spark, sf)
      val n = df.count()
      withClue(q.name) { assert(n >= 0) }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("q01 aggregates are exact over decimal (order-independent)") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val a = df.collect().map(_.toSeq).toSeq
    // genuinely different aggregation partitioning must not change values —
    // decimal sums are associative; a double-sum regression would wobble here
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      SparkEntry.queries("q01_pricing_summary")(spark, sf).collect().map(_.toSeq).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert(a == b)
    assert(df.columns.contains("sum_disc_price"))
  }

  test("q07 top-k per group returns at most 3 rows per customer") {
    val df = SparkEntry.queries("q07_topk_per_customer")(spark, sf)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("q11/q12 set ops are distinct") {
    Seq("q11_intersect", "q12_except").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      assert(df.count() == df.distinct().count(), n)
    }
  }
}
