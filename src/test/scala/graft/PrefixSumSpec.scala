package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** The two-level parallel scan must equal the single-window formulation
  * exactly, independent of how the range partitioner cut the chunks. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(0, 5000)
    .select(col("id"),
      (col("id") % 7).cast("string").as("g"),
      (col("id") % 13).as("v"))

  private def expected = {
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    data.withColumn("pre", coalesce(sum("v").over(w), lit(0)))
      .select("id", "g", "v", "pre")
      .as[(Long, String, Long, Long)].collect().toSet
  }

  test("two-level scan equals the single-window prefix sum") {
    val got = PrefixSum.exclusive(data, Seq("g"), "id", "v", chunks = 8, out = "pre")
      .select("id", "g", "v", "pre")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("null group keys form their own partition, like Window.partitionBy") {
    val withNulls = data.withColumn("g", when(col("id") % 5 === 0, lit(null)).otherwise(col("g")))
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = withNulls.withColumn("pre", coalesce(sum("v").over(w), lit(0)))
      .select("id", "g", "v", "pre").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3))).toSet
    val got = PrefixSum.exclusive(withNulls, Seq("g"), "id", "v", 8, "pre")
      .select("id", "g", "v", "pre").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.exists(_._2.isEmpty))
  }

  test("withExclusive releases the internal cache after the consumer returns") {
    spark.catalog.clearCache()
    val got = PrefixSum.withExclusive(data, Seq("g"), "id", "v", 8, "pre") { res =>
      // cache is live while the consumer runs (boundary agreement)
      val rows = res.select("id", "g", "v", "pre")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(!spark.sharedState.cacheManager.isEmpty,
        "chunked relation not persisted during consumption")
      rows
    }
    assert(got == expected)
    // release is async (blocking=false) — the cache ENTRY is removed
    // synchronously, which is the library-hygiene property
    assert(spark.sharedState.cacheManager.isEmpty,
      "withExclusive leaked its chunked relation into the cache manager")
  }

  test("result is chunk-count independent (1, 3, 32 chunks all agree)") {
    val ref = expected
    Seq(1, 3, 32).foreach { n =>
      val got = PrefixSum.exclusive(data, Seq("g"), "id", "v", n, "pre")
        .select("id", "g", "v", "pre")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == ref, s"chunks=$n diverged")
    }
  }
}
