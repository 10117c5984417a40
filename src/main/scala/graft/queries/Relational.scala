package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Det, Tables}

/** Core relational operator coverage (SURVEY.md §2.2–§2.7) over the TPC-H-ish
  * testdata: filters/projections, inner/semi/anti/broadcast joins, hash aggs,
  * rollup/cube/grouping-sets, windows, sorts/top-k, set ops, upsert semantics.
  *
  * Scale notes (100 TB design review per query):
  *  - Filters + projections are plain Catalyst expressions → pushed into the
  *    parquet scan (verified via explain: PushedFilters / ReadSchema).
  *  - Dimension tables (region/nation/supplier/customer at TPC-H ratios) are
  *    explicitly `broadcast()` so the fact-table join never shuffles lineitem.
  *  - Aggregations are partial (map-side combine) by construction — groupBy
  *    over low-cardinality keys reduces before the exchange.
  *  - Window queries partition by a high-cardinality key (custkey/suppkey) so
  *    state per partition stays small; no global sort except final top-k
  *    (TakeOrderedAndProject — no full exchange).
  */
object Relational {
  import Det.{dec, dsum, davg, revenue}

  private def ts(d: String): Column = lit(d).cast(TimestampType)

  val queries: Seq[OracleQuery] = Seq(
    // ---- q01: TPC-H Q1-style pricing summary (filter → hash agg → sort) ----
    OracleQuery(
      "q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.sql.dsum("l_quantity")} AS sum_qty,
         |  ${Det.sql.dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(${Det.sql.revenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(${Det.sql.revenue("l_extendedprice", "l_discount")} * (1 + ${Det.sql.dec("l_tax")})) AS DOUBLE) AS sum_charge,
         |  ${Det.sql.davg("l_quantity")} AS avg_qty,
         |  ${Det.sql.davg("l_extendedprice")} AS avg_price,
         |  ${Det.sql.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("sum_disc_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount")) * (lit(1) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- q02: projection + filter pushdown (scan-shape query) ----
    OracleQuery(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("lineitem")
        .filter(col("l_shipdate") >= ts("2000-01-01") && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- q03: TPC-H Q3-style shipping priority (3-way join, agg, top-k) ----
    OracleQuery(
      "q03_shipping_priority",
      s"""SELECT l_orderkey,
         |  CAST(SUM(${Det.sql.revenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders").filter(col("o_orderdate") < ts("1998-03-15"))
      val li = t("lineitem").filter(col("l_shipdate") > ts("1998-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // ---- q04: EXISTS → left-semi join (TPC-H Q4-style) ----
    OracleQuery(
      "q04_order_priority",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val ord = t("orders").filter(
        col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
      val li = t("lineitem")
      ord.join(li, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- q05: NOT EXISTS → left-anti join ----
    OracleQuery(
      "q05_customers_without_orders",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("customer")
        .join(t("orders").filter(col("o_orderdate") < ts("1996-01-01")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- q06: star join over broadcast dimensions (TPC-H Q5-style) ----
    OracleQuery(
      "q06_regional_revenue",
      s"""SELECT n_name,
         |  CAST(SUM(${Det.sql.revenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
         |  AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val ord = t("orders").filter(
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      t("lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t("customer")),
          col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- q07: top-k per group via row_number window ----
    OracleQuery(
      "q07_topk_per_customer",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) sub
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t("orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // ---- q08: running-sum window frame (analytic over unique sort key) ----
    OracleQuery(
      "q08_running_quantity",
      s"""SELECT l_suppkey, l_orderkey, l_linenumber,
         |  CAST(SUM(${Det.sql.dec("l_quantity")}) OVER (
         |    PARTITION BY l_suppkey
         |    ORDER BY l_shipdate, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         |FROM lineitem
         |WHERE l_suppkey <= 10
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("lineitem")
        .filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // ---- q09: global top-k (TakeOrderedAndProject, no full sort exchange) ----
    OracleQuery(
      "q09_top_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- q10: UNION ALL across heterogeneous entities ----
    OracleQuery(
      "q10_union_all",
      """SELECT * FROM (
        |  SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier) u
        |ORDER BY kind, id""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val c = t("customer").select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
      val sup = t("supplier").select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(sup).orderBy("kind", "id")
    },

    // ---- q11: INTERSECT (distinct set semantics) ----
    OracleQuery(
      "q11_intersect",
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val ord = t("orders")
      val y96 = ord.filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")).select("o_custkey")
      val y97 = ord.filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01")).select("o_custkey")
      y96.intersect(y97).orderBy("o_custkey")
    },

    // ---- q12: EXCEPT (anti set semantics) ----
    OracleQuery(
      "q12_except",
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      val ord = t("orders")
      val y96 = ord.filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")).select("o_custkey")
      val y97 = ord.filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01")).select("o_custkey")
      y96.except(y97).orderBy("o_custkey")
    },

    // ---- q13: DISTINCT projection (exact dedup via dropDuplicates) ----
    OracleQuery(
      "q13_distinct",
      """SELECT DISTINCT o_custkey, o_orderstatus FROM orders
        |ORDER BY o_custkey, o_orderstatus""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("orders").select("o_custkey", "o_orderstatus")
        .dropDuplicates("o_custkey", "o_orderstatus")
        .orderBy("o_custkey", "o_orderstatus")
    },

    // ---- q14: ROLLUP hierarchy totals (nulls sentinel'd for cross-engine order) ----
    OracleQuery(
      "q14_rollup",
      s"""SELECT COALESCE(o_orderstatus, '(all)') AS status,
         |  COALESCE(o_orderpriority, '(all)') AS priority,
         |  COUNT(*) AS n, ${Det.sql.dsum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // ---- q15: CUBE over two dimensions ----
    OracleQuery(
      "q15_cube",
      s"""SELECT COALESCE(l_returnflag, '(all)') AS rflag,
         |  COALESCE(l_linestatus, '(all)') AS lstatus,
         |  COUNT(*) AS n, ${Det.sql.dsum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY rflag, lstatus""".stripMargin) { (spark, dir) =>
      def t(n: String) = Tables(spark, dir, n)
      t("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("n"), col("qty"))
        .orderBy("rflag", "lstatus")
    },
  )
}
