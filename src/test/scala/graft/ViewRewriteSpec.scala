package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Det, Incremental, Snapshots}
import graft.plans.ViewRewrite

/** Optimizer-level query rewrite: aggregates over a snapshot table's head
  * scan are answered from a registered incremental view's state (or the
  * manifest's row counts) — and fall back, silently and correctly, the
  * moment any consistency premise fails.
  */
class ViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("vrw").toString + "/t"

  private def freshBase(): (String, String) = {
    val root = tmp()
    val state = tmp()
    Snapshots.commit(
      Seq(("a", 1.50), ("a", 2.25), ("b", 4.00), ("c", 0.25))
        .toDF("k", "x"),
      root, statsCols = Seq("x"))
    Incremental.refresh(spark, root, state, Seq("k"), Seq("x"))
    (root, state)
  }

  private def aggQuery(root: String) =
    Snapshots.read(spark, root).groupBy("k")
      .agg(Det.dsum(col("x")).as("sum_x"), count(lit(1)).as("n"))

  test("registered view answers the aggregate without scanning the base") {
    val (root, state) = freshBase()
    ViewRewrite.install(spark)
    ViewRewrite.clear()

    // before registration: same query scans the base
    assert(!ViewRewrite.avoidedScan(aggQuery(root), root))

    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))
    val q = aggQuery(root)
    assert(ViewRewrite.avoidedScan(q, root), "rewrite must fire on the head scan")
    assert(q.as[(String, Double, Long)].collect().toSet ===
      Set(("a", 3.75, 2L), ("b", 4.0, 1L), ("c", 0.25, 1L)))
  }

  test("arithmetic over matched aggregates rewrites (avg as sum/count, scaled sums)") {
    val (root, state) = freshBase()
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))

    val q = Snapshots.read(spark, root).groupBy("k")
      .agg((Det.dsum(col("x")) / count(lit(1))).as("avg_x"),
        (Det.dsum(col("x")) * lit(2.0)).as("dbl_x"))
    assert(ViewRewrite.avoidedScan(q, root))
    assert(q.as[(String, Double, Double)].collect().toSet ===
      Set(("a", 1.875, 7.5), ("b", 4.0, 8.0), ("c", 0.25, 0.5)))
    ViewRewrite.clear()
  }

  test("stale view falls back to the scan; refresh re-arms the rewrite") {
    val (root, state) = freshBase()
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))

    Snapshots.commit(Seq(("b", 1.00)).toDF("k", "x"), root, append = true,
      statsCols = Seq("x"))
    // base advanced, view not refreshed: NO rewrite, and the scan answer
    // includes the new row (never a stale view answer)
    val q1 = aggQuery(root)
    assert(!ViewRewrite.avoidedScan(q1, root))
    assert(q1.filter($"k" === "b").as[(String, Double, Long)].head() === ("b", 5.0, 2L))

    Incremental.refresh(spark, root, state, Seq("k"), Seq("x"))
    val q2 = aggQuery(root)
    assert(ViewRewrite.avoidedScan(q2, root))
    assert(q2.filter($"k" === "b").as[(String, Double, Long)].head() === ("b", 5.0, 2L))
  }

  test("time-travel scans, distinct/filtered aggs, and foreign keys never rewrite") {
    val (root, state) = freshBase()
    Snapshots.commit(Seq(("z", 9.0)).toDF("k", "x"), root, append = true,
      statsCols = Seq("x"))
    Incremental.refresh(spark, root, state, Seq("k"), Seq("x"))
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))

    // time travel to v1: file set != head → no rewrite
    val old = Snapshots.read(spark, root, 1).groupBy("k")
      .agg(Det.dsum(col("x")).as("sum_x"), count(lit(1)).as("n"))
    assert(!ViewRewrite.avoidedScan(old, root))
    assert(!old.as[(String, Double, Long)].collect().exists(_._1 == "z"))

    // countDistinct has no state column → no rewrite, still correct
    val cd = Snapshots.read(spark, root).groupBy("k").agg(count_distinct($"x").as("n"))
    assert(!ViewRewrite.avoidedScan(cd, root))

    // grouping by a non-view key → no rewrite
    val byX = Snapshots.read(spark, root).groupBy("x").agg(count(lit(1)).as("n"))
    assert(!ViewRewrite.avoidedScan(byX, root))
  }

  test("a non-deterministic filter below the aggregate blocks the rewrite") {
    val (root, state) = freshBase()
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))

    // spark_partition_id() >= 0 references NOTHING, so a references-only
    // check passes it vacuously — but it is non-deterministic and must
    // evaluate per ROW on the base, not per GROUP on the state: no rewrite
    // (rand() < 2.0 won't do here: the optimizer folds it away knowing
    // rand's [0,1) bounds, so no Filter survives to the rule)
    val q = Snapshots.read(spark, root)
      .filter(spark_partition_id() >= 0).groupBy("k")
      .agg(Det.dsum(col("x")).as("sum_x"), count(lit(1)).as("n"))
    assert(!ViewRewrite.avoidedScan(q, root),
      "non-deterministic filter must not be carried onto the view state")
    // always-true predicate: the scan answer equals the unfiltered one
    assert(q.as[(String, Double, Long)].collect().toSet ===
      Set(("a", 3.75, 2L), ("b", 4.0, 1L), ("c", 0.25, 1L)))
    ViewRewrite.clear()
  }

  test("rewritten aggregate composes under filters and joins (attr ids held)") {
    val (root, state) = freshBase()
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"), Set("x")))

    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "label")
    val q = aggQuery(root).filter(col("sum_x") > 1.0)
      .join(dim, Seq("k")).orderBy("k")
    assert(ViewRewrite.avoidedScan(q, root))
    assert(q.select("k", "label", "sum_x").as[(String, String, Double)].collect().toSeq ===
      Seq(("a", "alpha", 3.75), ("b", "beta", 4.0)))
  }

  test("grouped min/max rewrite onto refreshMinMax state, through the delete regime") {
    val root = tmp()
    val state = tmp()
    Snapshots.commit(
      Seq(("a", 10L), ("a", 3L), ("b", 7L), ("b", 9L)).toDF("k", "x"),
      root, statsCols = Seq("x"))
    Incremental.refreshMinMax(spark, root, state, Seq("k"), Seq("x"))
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("mm", root, state,
      Seq("k"), sums = Set.empty, minmax = Set("x")))

    def q() = Snapshots.read(spark, root).groupBy("k")
      .agg(min($"x").as("lo"), max($"x").as("hi"), count(lit(1)).as("n"))
    assert(ViewRewrite.avoidedScan(q(), root))
    assert(q().as[(String, Long, Long, Long)].collect().toSet ===
      Set(("a", 3L, 10L, 2L), ("b", 7L, 9L, 2L)))

    // a DELETE can move an extremum: view stale → fallback; after the
    // delete-regime refresh the rewrite re-arms with the recomputed group
    Snapshots.delete(Seq(10L).toDF("x"), root, "x", statsCols = Seq("x"))
    assert(!ViewRewrite.avoidedScan(q(), root))
    Incremental.refreshMinMax(spark, root, state, Seq("k"), Seq("x"))
    assert(ViewRewrite.avoidedScan(q(), root))
    assert(q().filter($"k" === "a").as[(String, Long, Long, Long)].head() ===
      ("a", 3L, 3L, 1L))
    // a sum over the same base has no state column here → falls back
    val s = Snapshots.read(spark, root).groupBy("k").agg(sum($"x").as("t"))
    assert(!ViewRewrite.avoidedScan(s, root))
    ViewRewrite.clear()
  }

  test("count(*) over a registered table's head answers from the manifest") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 1000).select($"id", ($"id" % 7).as("g")),
      root, statsCols = Seq("id"))
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerCounts(root)

    val q = Snapshots.read(spark, root).agg(count(lit(1)).as("n"))
    assert(ViewRewrite.avoidedScan(q, root))
    assert(q.as[Long].head() === 1000L)

    // copy-on-write delete: head moves, manifest counts stay exact
    Snapshots.delete(Seq(1L, 2L, 3L).toDF("id"), root, "id", statsCols = Seq("id"))
    val q2 = Snapshots.read(spark, root).agg(count(lit(1)).as("n"))
    assert(ViewRewrite.avoidedScan(q2, root))
    assert(q2.as[Long].head() === 997L)

    // a grouped count is NOT the registered shape → falls back
    val grouped = Snapshots.read(spark, root).groupBy("g").agg(count(lit(1)).as("n"))
    assert(!ViewRewrite.avoidedScan(grouped, root))
    ViewRewrite.clear() // leave the shared session's optimizer inert
  }

  test("global min/max answer from the stats index — only when it is complete") {
    val root = tmp()
    Snapshots.commit(
      spark.range(5, 905).select($"id", ($"id" * 2L).as("v"))
        .repartitionByRange(4, $"id"),
      root, statsCols = Seq("id")) // stats on id, NOT on v
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerMeta(root)

    val q = Snapshots.read(spark, root)
      .agg(min($"id").as("lo"), max($"id").as("hi"), count(lit(1)).as("n"))
    assert(ViewRewrite.avoidedScan(q, root))
    assert(q.as[(Long, Long, Long)].head() === ((5L, 904L, 900L)))

    // v has no stats rows: the whole aggregate falls back (all-or-nothing)
    val qv = Snapshots.read(spark, root).agg(min($"v").as("lo"))
    assert(!ViewRewrite.avoidedScan(qv, root))
    assert(qv.as[Long].head() === 10L)

    // round 17: a stat-less APPEND inherits the head's index declaration,
    // so it keeps the index COMPLETE — the rewrite still answers, now
    // with the new extremum
    Snapshots.commit(spark.range(0, 5).select($"id", ($"id" * 2L).as("v")),
      root, append = true)
    ViewRewrite.registerMeta(root)
    val q2 = Snapshots.read(spark, root).agg(min($"id").as("lo"))
    assert(q2.as[Long].head() === 0L)

    // an incomplete index can only arise from a stat-less HEAD era now:
    // the all-or-nothing completeness rule still falls back there
    val root2 = tmp()
    Snapshots.commit(
      spark.range(100, 200).select($"id", ($"id" * 2L).as("v")),
      root2) // no stats, no declaration
    Snapshots.commit(spark.range(0, 100).select($"id", ($"id" * 2L).as("v")),
      root2, append = true, statsCols = Seq("id"))
    ViewRewrite.registerMeta(root2)
    val q3 = Snapshots.read(spark, root2).agg(min($"id").as("lo"))
    assert(!ViewRewrite.avoidedScan(q3, root2))
    assert(q3.as[Long].head() === 0L)
    ViewRewrite.clear()
  }

  test("a keyed state's tombstone groups never surface through the rewrite") {
    val root = tmp()
    val state = tmp()
    Snapshots.commit(
      Seq(("a", 1.50), ("b", 4.00)).toDF("k", "x"), root, statsCols = Seq("x"))
    Incremental.refreshKeyed(spark, root, state, Seq("k"), Seq("x"))
    // group b nets to zero: the keyed state keeps it as a tombstone row
    // (n_rows = 0) that readKeyed filters — the rewrite must filter too
    Snapshots.deleteWhere(spark, root, $"k" === "b", mergeOnRead = false)
    Incremental.refreshKeyed(spark, root, state, Seq("k"), Seq("x"))
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("kv", root, state, Seq("k"), Set("x")))
    val q = aggQuery(root)
    assert(ViewRewrite.avoidedScan(q, root), "keyed-state rewrite must fire")
    assert(q.as[(String, Double, Long)].collect().toSet === Set(("a", 1.5, 1L)),
      "tombstone group 'b' surfaced as a phantom zero-count row")
    ViewRewrite.clear()
  }

  test("approx-distinct estimates answer from the sketch state - default precision only") {
    val root = tmp()
    val state = tmp()
    Snapshots.commit(
      Seq(("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", "u3")).toDF("k", "u"),
      root)
    Incremental.refreshApproxDistinct(spark, root, state, Seq("k"), Seq("u"))
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("v", root, state, Seq("k"),
      Set.empty, distincts = Set("u")))

    // sketch maintenance is bit-identical to a rebuild, so the rewritten
    // estimate EQUALS the direct plan's, not approximately
    def q = Snapshots.read(spark, root).groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("nd"),
        count(lit(1)).as("n"))
    assert(ViewRewrite.avoidedScan(q, root), "sketch rewrite must fire")
    assert(q.as[(String, Long, Long)].collect().toSet ===
      Set(("a", 2L, 3L), ("b", 1L, 1L)))

    // an explicit non-default precision cannot be served by default-built
    // state: falls back to the scan
    val q13 = Snapshots.read(spark, root).groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"), 13)).as("nd"))
    assert(!ViewRewrite.avoidedScan(q13, root))

    // delete regime: stale view falls back; the touched-group recompute
    // refresh re-arms with the exact post-delete estimate
    Snapshots.deleteWhere(spark, root, col("u") === "u2")
    assert(!ViewRewrite.avoidedScan(q, root))
    Incremental.refreshApproxDistinct(spark, root, state, Seq("k"), Seq("u"))
    assert(ViewRewrite.avoidedScan(q, root))
    assert(q.as[(String, Long, Long)].collect().toSet ===
      Set(("a", 1L, 2L), ("b", 1L, 1L)))
    ViewRewrite.clear()
  }
}
