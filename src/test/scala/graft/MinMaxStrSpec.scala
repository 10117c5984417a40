package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.plans.GraftExtensions

/** [[graft.plans.MinMaxStr]]: the typed string MIN/MAX (round 19) must be
  * bit-identical to the declarative Min/Max it replaces — same binary
  * string order, same null skipping, same NULL-for-empty-group — while
  * planning hash-grouped instead of dragging the aggregate onto
  * SortAggregate. */
class MinMaxStrSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("min_str/max_str ≡ min/max over real string columns, grouped and global") {
    val o = Tables(spark, sf, "orders")
    val want = o.groupBy("o_orderstatus")
      .agg(min(col("o_orderpriority")).as("mn"), max(col("o_orderpriority")).as("mx"))
    val got = o.groupBy("o_orderstatus")
      .agg(expr("min_str(o_orderpriority)").as("mn"), expr("max_str(o_orderpriority)").as("mx"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val g = o.agg(expr("min_str(o_orderpriority)"), expr("max_str(o_orderpriority)")).head()
    val w = o.agg(min(col("o_orderpriority")), max(col("o_orderpriority"))).head()
    assert(g == w)
  }

  test("nulls skip; an all-null/empty group is NULL; merges cross partitions") {
    val df = Seq((1, Some("b")), (1, None), (1, Some("a")), (2, None))
      .toDF("k", "s").repartition(8)
    val rows = df.groupBy("k")
      .agg(expr("min_str(s)").as("mn"), expr("max_str(s)").as("mx"))
      .orderBy("k").collect()
    assert(rows(0).getString(1) == "a" && rows(0).getString(2) == "b")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("the profile's Expand-consuming aggregate is hash-grouped with string columns") {
    // the optimization's target is the FIRST aggregation — the one over the
    // |cols|×-Expand'd raw rows, the only corpus-sized pass; with
    // declarative string Min/Max it planned SortAggregate (a full sort of
    // the expanded input). Catalyst's distinct-rewrite still uses first()
    // in the later, distinct-values-sized phases — those stay sort-based
    // and are not what this pins.
    val p = graft.operators.Profile.profile(
      Tables(spark, sf, "orders"),
      Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
    val plan = p.queryExecution.executedPlan.toString
    val i = plan.indexOf("Expand ")
    assert(i > 0, "profile lost its multi-distinct Expand")
    val pre = plan.substring(0, i)
    assert(pre.lastIndexOf("ObjectHashAggregate") > pre.lastIndexOf("SortAggregate"),
      "the Expand-consuming aggregate regressed to SortAggregate " +
        "(string min/max buffers)")
  }
}
