package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Det, Tables}

/** Second relational coverage pack (SURVEY.md §2.3–§2.7 long tail): full
  * outer join, explicit grouping sets, conditional-aggregation pivot,
  * correlated scalar subquery (decorrelated form), analytic window pack
  * (rank/dense_rank/lag/ntile), and HAVING.
  *
  * Scale notes: every aggregation here is partial-aggregable; the
  * full-outer join runs on pre-aggregated per-key inputs (tiny sides, one
  * exchange); the scalar-subquery query ships as the decorrelated
  * aggregate-join Catalyst would rewrite to anyway.
  */
object Relational2 {
  import Det.dsum

  private def ts(d: String): Column = lit(d).cast(TimestampType)

  val queries: Seq[OracleQuery] = Seq(
    // ---- q33: FULL OUTER JOIN of per-year activity ----
    OracleQuery(
      "q33_full_outer",
      """WITH a AS (SELECT o_custkey, COUNT(*) AS n96 FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |             AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1),
        |b AS (SELECT o_custkey, COUNT(*) AS n97 FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1)
        |SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, a.n96, b.n97
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        |ORDER BY custkey""".stripMargin) { (spark, dir) =>
      val ord = Tables(spark, dir, "orders")
      def yearly(from: String, to: String, as: String) = ord
        .filter(col("o_orderdate") >= ts(from) && col("o_orderdate") < ts(to))
        .groupBy("o_custkey").agg(count(lit(1)).as(as))
      val a = yearly("1996-01-01", "1997-01-01", "n96")
      val b = yearly("1997-01-01", "1998-01-01", "n97").withColumnRenamed("o_custkey", "ck")
      a.join(b, col("o_custkey") === col("ck"), "full_outer")
        .select(coalesce(col("o_custkey"), col("ck")).as("custkey"), col("n96"), col("n97"))
        .orderBy("custkey")
    },

    // ---- q34: explicit GROUPING SETS (neither rollup nor cube) ----
    OracleQuery(
      "q34_grouping_sets",
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // ---- q35: pivot via conditional aggregation (status columns) ----
    OracleQuery(
      "q35_status_pivot",
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders, customer, nation
        |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (spark, dir) =>
      def flag(s: String) = sum(when(col("o_orderstatus") === s, 1).otherwise(0)).cast(LongType)
      Tables(spark, dir, "orders")
        .join(broadcast(Tables(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(flag("O").as("n_open"), flag("F").as("n_filled"), flag("P").as("n_pending"))
        .orderBy("n_name")
    },

    // ---- q36: correlated scalar subquery (decorrelated aggregate join) ----
    OracleQuery(
      "q36_scalar_subquery",
      """SELECT c_custkey, c_name,
        |  (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val maxes = Tables(spark, dir, "orders")
        .groupBy("o_custkey").agg(max("o_totalprice").as("max_order"))
      Tables(spark, dir, "customer")
        .join(maxes, col("o_custkey") === col("c_custkey"), "left")
        .select("c_custkey", "c_name", "max_order")
        .orderBy("c_custkey")
    },

    // ---- q37: analytic window pack — rank/dense_rank over a tied ordering,
    //           lag/ntile over a unique one ----
    OracleQuery(
      "q37_window_pack",
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INTEGER) AS drnk,
        |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS quartile
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (spark, dir) =>
      val tied = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      val uniq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(spark, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(tied).as("rnk"),
          dense_rank().over(tied).as("drnk"),
          lag("o_totalprice", 1).over(uniq).as("prev_price"),
          ntile(4).over(uniq).as("quartile"))
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    // ---- q40: LIKE / IN / BETWEEN predicate pack over part ----
    OracleQuery(
      "q40_like_in_between",
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE p_type LIKE '%O%'
        |  AND p_brand NOT LIKE 'Brand#1%'
        |  AND p_size BETWEEN 10 AND 30
        |  AND p_brand IN ('Brand#2', 'Brand#4', 'Brand#19', 'Brand#23')
        |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "part")
        .filter(col("p_type").like("%O%")
          && !col("p_brand").like("Brand#1%")
          && col("p_size").between(10, 30)
          && col("p_brand").isin("Brand#2", "Brand#4", "Brand#19", "Brand#23"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    },

    // ---- q41: TPC-H Q14-style promo revenue ratio (conditional agg over a
    //           fact⋈dimension join; ratio of two exact decimal sums) ----
    OracleQuery(
      "q41_promo_revenue",
      s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
         |  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
         |        THEN ${Det.sql.revenue("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(${Det.sql.revenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS promo_pct
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
      val rev = Det.revenue(col("l_extendedprice"), col("l_discount"))
      Tables(spark, dir, "lineitem")
        .join(broadcast(Tables(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).as("y"))
        .agg((lit(100.0) * sum(when(col("p_type").like("PROMO%"), rev).otherwise(lit(0))).cast(DoubleType)
          / sum(rev).cast(DoubleType)).as("promo_pct"))
        .orderBy("y")
    },

    // ---- q38: HAVING — post-aggregation filtering ----
    OracleQuery(
      "q38_having",
      """SELECT o_custkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n") >= 15)
        .orderBy("o_custkey")
    },
  )
}
