package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression: the properties that make these queries hold up
  * at 100 TB must stay visible in the plan — filter/projection pushdown into
  * the parquet scan, partial (map-side) aggregation, broadcast joins for
  * dimension tables, and top-k without a global sort exchange. A refactor
  * that silently loses one of these still returns correct rows; this suite
  * is what catches it.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("simple"))

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "filter not pushed")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_discount:double,l_shipdate"),
      "column pruning lost")
  }

  test("q01: aggregation is partial+final (map-side combine before exchange)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "scan filter not pushed")
  }

  test("q06: star joins broadcast every dimension") {
    val p = plan("q06_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, "dimensions not broadcast")
  }

  test("q09: global top-k plans as TakeOrderedAndProject (no sort exchange)") {
    val p = plan("q09_top_orders")
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to global sort")
    assert(!p.contains("Exchange rangepartitioning"), "unexpected global sort exchange")
  }

  test("q30: query vectors broadcast against the corpus postings") {
    val p = plan("q30_cosine_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "query side not broadcast — corpus would shuffle")
  }

  test("q04: EXISTS plans as a semi join, not an aggregate-join rewrite") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"), "semi-join shape lost")
  }

  test("no extension query ever plans an all-pairs join") {
    // the scale contract of the dedup/similarity family: candidate
    // generation is always a key-equi join (shingle / band / bucket /
    // cell / label+dim), never a cartesian or nested-loop product
    Seq("q27_jaccard_pairs", "q28_minhash_lsh", "q30_cosine_topk",
        "q31_ann_lsh", "q42_embedding_neardup", "q43_ann_ivf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }
}
