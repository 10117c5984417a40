package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.engine.{Det, Incremental, Snapshots, Tables}
import graft.plans.ViewRewrite

/** Optimizer-level materialized-view and metadata rewrites
  * (graft.plans.ViewRewrite): the analyst writes a plain aggregate against
  * the base table; Catalyst swaps the scan for maintained state. These
  * queries REQUIRE the rewrite to have fired (optimized plan reads zero
  * base data files) and then hash-gate the answer against DuckDB computing
  * from the raw data — proving the rewritten plan is indistinguishable
  * from the real aggregate, which is the entire contract of a rewrite.
  */
object Rewrite {

  private def scratch(dir: String, name: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"file:${sys.props("java.io.tmpdir")}/graft_lake_$tag/$name"
  }

  val queries: Seq[OracleQuery] = Seq(
    // ---- q109: INCREMENTAL-VIEW QUERY REWRITE. Base = lineitem measures
    //            as a snapshot table; an Incremental view maintains
    //            per-(returnflag, linestatus) exact sums; after an append
    //            + refresh, the analyst's groupBy over the BASE table is
    //            answered from the view (required: no base data file in
    //            the optimized plan). At 100 TB this turns the most common
    //            dashboard scan into a groups-sized read — and the
    //            staleness fence means a lagging view silently falls back
    //            to the scan rather than ever serving old numbers. ----
    OracleQuery(
      "q109_view_rewrite",
      s"""WITH base AS (
        |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
        |  WHERE l_orderkey % 10 = 0)
        |SELECT l_returnflag, l_linestatus,
        |  ${Det.sql.dsum("l_quantity")} AS sum_qty,
        |  count(*) AS n_items
        |FROM base GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      val root = scratch(dir, "li_rewrite_base")
      val state = scratch(dir, "li_rewrite_state")
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(state), true)
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      Snapshots.commit(li, root)
      Incremental.refresh(spark, root, state,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      // the table lives: an append arrives and the view refreshes
      Snapshots.commit(
        Tables(spark, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")),
        root, append = true)
      Incremental.refresh(spark, root, state,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))

      ViewRewrite.install(spark)
      ViewRewrite.registerView(ViewRewrite.SumView("li_flag_status", root, state,
        Seq("l_returnflag", "l_linestatus"), Set("l_quantity")))
      val q = Snapshots.read(spark, root)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag", "l_linestatus")
      require(ViewRewrite.avoidedScan(q, root),
        "view rewrite must fire: the optimized plan may not scan the base table")
      ViewRewrite.clear()
      q
    },

    // ---- q110: MANIFEST COUNT REWRITE. count(*) over the head scan of a
    //            registered table answers from the manifest's exact
    //            per-file row counts — zero data I/O even after a
    //            copy-on-write delete moved the head. The rewrite is
    //            user-transparent (plain count over the plain read); the
    //            grouped variant in the same query falls back to the scan,
    //            so the output carries both a metadata-answered and a
    //            scan-answered column the oracle gates together. ----
    OracleQuery(
      "q110_count_rewrite",
      """WITH t AS (SELECT * FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT (SELECT count(*) FROM t) AS n_total,
        |  (SELECT min(o_orderkey) FROM t) AS k_min,
        |  (SELECT max(o_orderkey) FROM t) AS k_max,
        |  o_orderstatus, count(*) AS n_status
        |FROM t GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val root = scratch(dir, "orders_count")
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      Snapshots.commit(o.repartitionByRange(4, col("o_orderkey")), root,
        statsCols = Seq("o_orderkey"))
      // copy-on-write delete: the manifest's counts must track the head
      Snapshots.delete(
        o.filter(col("o_orderkey") % 13 === 0).select(col("o_orderkey")),
        root, "o_orderkey", statsCols = Seq("o_orderkey"))

      ViewRewrite.install(spark)
      ViewRewrite.registerMeta(root)
      val total = Snapshots.read(spark, root).agg(count(lit(1)).as("n_total"),
        min(col("o_orderkey")).as("k_min"), max(col("o_orderkey")).as("k_max"))
      require(ViewRewrite.avoidedScan(total, root),
        "count/min/max must answer from the manifest, not a scan")
      val byStatus = Snapshots.read(spark, root)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_status"))
      require(!ViewRewrite.avoidedScan(byStatus, root),
        "grouped count has no registered state — it must scan")
      ViewRewrite.clear()
      total.crossJoin(byStatus).orderBy("o_orderstatus")
        .select(col("n_total"), col("k_min"), col("k_max"),
          col("o_orderstatus"), col("n_status"))
    },

    // ---- q115: SKETCH-STATE DISTINCT REWRITE. An approx-distinct view
    //            maintains per-segment HLL sketches through an append
    //            (register-wise union) and a delete (touched-group
    //            recompute); the analyst's hll_sketch_estimate over the
    //            BASE scan answers from the stored sketches (required: no
    //            base file in the plan). The distinct domain is bounded by
    //            construction (custkey % 97 → ≤97 values per group at ANY
    //            scale), which keeps the sketch in its exact sparse
    //            regime — so the estimate is hash-gated against DuckDB's
    //            EXACT count(DISTINCT), proving maintain → rewrite →
    //            estimate end to end, not approximately. ----
    OracleQuery(
      "q115_sketch_rewrite",
      """WITH t1 AS (SELECT c_mktsegment AS seg, c_custkey % 97 AS u
        |            FROM customer),
        |t2 AS (SELECT * FROM t1
        |       UNION ALL SELECT seg, u FROM t1 WHERE u % 3 = 0),
        |t3 AS (SELECT * FROM t2 WHERE NOT (seg = 'BUILDING' AND u >= 50))
        |SELECT seg, count(DISTINCT u) AS nd, count(*) AS n
        |FROM t3 GROUP BY seg ORDER BY seg""".stripMargin) { (spark, dir) =>
      val root = scratch(dir, "cust_sketch_base")
      val state = scratch(dir, "cust_sketch_state")
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(state), true)
      val t1 = Tables(spark, dir, "customer")
        .select(col("c_mktsegment").as("seg"), (col("c_custkey") % 97).as("u"))
      Snapshots.commit(t1, root)
      Incremental.refreshApproxDistinct(spark, root, state, Seq("seg"), Seq("u"))
      // append regime: sketches union register-wise
      Snapshots.commit(t1.filter(col("u") % 3 === 0), root, append = true)
      Incremental.refreshApproxDistinct(spark, root, state, Seq("seg"), Seq("u"))
      // delete regime: the touched group recomputes from the head.
      // Copy-on-write, deliberately: a merge-on-read DV would make the head
      // read more than a bare file scan, and the rewrite (correctly)
      // refuses anything but an exact head file-set match.
      Snapshots.deleteWhere(spark, root,
        col("seg") === "BUILDING" && col("u") >= 50, mergeOnRead = false)
      Incremental.refreshApproxDistinct(spark, root, state, Seq("seg"), Seq("u"))

      ViewRewrite.install(spark)
      ViewRewrite.registerView(ViewRewrite.SumView("cust_nd", root, state,
        Seq("seg"), Set.empty, distincts = Set("u")))
      val q = Snapshots.read(spark, root).groupBy("seg")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("nd"),
          count(lit(1)).as("n"))
        .orderBy("seg")
      require(ViewRewrite.avoidedScan(q, root),
        "sketch rewrite must fire: the optimized plan may not scan the base table")
      ViewRewrite.clear()
      q
    },
  )
}
