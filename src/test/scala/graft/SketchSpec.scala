package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextOps

/** Approximate-sketch coverage (SURVEY.md §2: the unbounded-domain swap for
  * the exact aggregates). Sketches are engine-specific (HLL++ register
  * layout, t-digest compression), so their outputs are never DuckDB-hash
  * checkable — the contract here is tolerance against the exact twin on the
  * same data (q17's distinct counts, q55's quantiles) plus the plan property
  * that makes them the 100 TB path: both must aggregate PARTIALLY (a
  * mergeable sketch per partition, merged after one exchange), never ship
  * raw rows. State per group is O(sketch size), not O(distinct values) —
  * that is the entire reason to swap them in when the domain is unbounded.
  */
class SketchSpec extends SparkSpec {

  private def events = Tables(spark, sf, "events")
  private def docs = Tables(spark, sf, "documents")

  test("approx_count_distinct per group tracks exact distinct users (q17's shape)") {
    // rsd 0.02 requested; assert a looser 5% so the test pins behavior, not
    // the HLL++ register layout
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"))
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("approx"))
    val both = exact.join(approx, "event_type")
      .select("event_type", "exact", "approx").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"${r.getString(0)}: approx=$a exact=$e drifts > 5%")
    }
  }

  test("approx_percentile tracks exact token-count quantiles per language (q55's shape)") {
    val perLang = docs
      .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy("lang")
      .agg(
        expr("percentile(n_tokens, array(0.25, 0.5, 0.9))").as("exact"),
        expr("approx_percentile(n_tokens, array(0.25, 0.5, 0.9), 10000)").as("approx"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      val e = r.getSeq[Double](1)
      val a = r.getSeq[Int](2).map(_.toDouble)
      e.zip(a).zipWithIndex.foreach { case ((ev, av), i) =>
        // approx_percentile returns an exact ORDER STATISTIC (input dtype);
        // the exact twin interpolates between the two straddling statistics,
        // so the sketch can sit at most one observed value away — bound the
        // drift at 10% relative (token counts are >> 10 everywhere)
        assert(math.abs(av - ev) / math.max(ev, 1.0) < 0.10,
          s"${r.getString(0)} q$i: approx=$av exact=$ev drifts > 10%")
      }
    }
  }

  test("count_min_sketch brackets the exact heavy-hitter counts (q57's shape)") {
    // the unbounded-vocabulary swap for q57: per-token exact counts need
    // state ∝ distinct tokens; a count-min sketch is fixed-size, mergeable,
    // and OVERestimates only (one-sided error ≤ eps × N at the given
    // confidence) — so for top-k work the true heavy hitters always survive
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
    val eps = 0.001
    val bytes = toks
      .agg(expr(s"count_min_sketch(w, ${eps}d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val n = toks.count()
    val top = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(20).collect()
    top.foreach { r =>
      val (w, exact) = (r.getString(0), r.getLong(1))
      // estimateCount(String) hashes the UTF-8 bytes — the same path the
      // aggregate's StringType branch used on the executors
      val est = cms.estimateCount(w)
      assert(est >= exact, s"'$w': CMS underestimated ($est < $exact) — impossible by construction")
      assert(est <= exact + (eps * n).toLong,
        s"'$w': CMS overshoot $est vs $exact exceeds eps×N=${(eps * n).toLong}")
    }
  }

  test("sketch aggregates plan as partial + final (mergeable at scale)") {
    // the scale contract: each partition builds its own sketch, ONE exchange
    // moves sketches (not rows), a final merge finishes. If either sketch
    // ever planned as a single complete-mode aggregate, raw rows would cross
    // the network and per-group state would be unbounded.
    val hll = events.groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02))
      .queryExecution.executedPlan.toString
    assert(hll.contains("partial_approx_count_distinct"),
      "approx_count_distinct lost its partial-aggregation stage")
    val tdigest = docs
      .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy("lang")
      .agg(expr("approx_percentile(n_tokens, array(0.25, 0.5, 0.9), 10000)"))
      .queryExecution.executedPlan.toString
    assert(tdigest.contains("partial_approx_percentile"),
      "approx_percentile lost its partial-aggregation stage")
    // approx_percentile's buffer is a variable-size object → it must ride
    // ObjectHashAggregate (sort-based fallback guarded), not a plain hash agg
    assert(tdigest.contains("ObjectHashAggregate"),
      "approx_percentile not planned as ObjectHashAggregate")
  }
}
