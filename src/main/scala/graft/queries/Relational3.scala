package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** Third relational pack: value-range window frames, first/last_value,
  * distribution functions (percent_rank/cume_dist), array scalar functions
  * over embeddings, and null-handling scalars (nullif/coalesce/greatest/
  * least). All outputs are integers, exact decimal sums, or single IEEE
  * ops on exact operands — deterministic across engines.
  */
object Relational3 {

  val queries: Seq[OracleQuery] = Seq(
    // ---- q44: RANGE frame over a value ordering (peers by value, not row) ----
    OracleQuery(
      "q44_range_frame",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_total
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .filter(col("o_custkey") < 200)
        .withColumn("nearby_total", expr(
          """CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            |  PARTITION BY o_custkey ORDER BY o_totalprice
            |  RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE)""".stripMargin))
        .select("o_custkey", "o_orderkey", "o_totalprice", "nearby_total")
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    },

    // ---- q45: first_value / last_value over a full-partition frame ----
    OracleQuery(
      "q45_first_last",
      """SELECT DISTINCT o_custkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir, "orders")
        .select(col("o_custkey"),
          first("o_orderkey").over(w).as("first_order"),
          last("o_orderkey").over(w).as("last_order"))
        .distinct()
        .orderBy("o_custkey")
    },

    // ---- q46: distribution functions (exact integer-ratio doubles) ----
    OracleQuery(
      "q46_distribution",
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
      Tables(spark, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          col("o_totalprice"))
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
        .drop("o_totalprice")
    },

    // ---- q47: array scalar functions over the embedding column ----
    OracleQuery(
      "q47_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(list_min(embedding) AS DOUBLE) AS lo,
        |  CAST(list_max(embedding) AS DOUBLE) AS hi,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          array_min(col("embedding")).cast(DoubleType).as("lo"),
          array_max(col("embedding")).cast(DoubleType).as("hi"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_elem"))
        .orderBy("vec_id")
    },

    // ---- q48: null-handling scalars ----
    OracleQuery(
      "q48_null_scalars",
      """SELECT o_orderkey,
        |  NULLIF(o_orderstatus, 'P') AS status_or_null,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
        |  GREATEST(o_totalprice, 50000.0) AS floored,
        |  LEAST(o_totalprice, 50000.0) AS capped
        |FROM orders WHERE o_custkey < 20
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floored"),
          least(col("o_totalprice"), lit(50000.0)).as("capped"))
        .orderBy("o_orderkey")
    },

    // ---- q66: single-pass column profiling (graft.operators.Profile) —
    //           the ANALYZE-style stats sweep. Columns chosen for exact
    //           cross-engine string casts: bigint and varchar only (a
    //           double's shortest-repr string differs between engines). ----
    OracleQuery(
      "q66_profile",
      """WITH m AS (
        |  SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
        |    COUNT(o_custkey) AS n_nonnull, COUNT(DISTINCT o_custkey) AS n_distinct,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS min_s, CAST(MAX(o_custkey) AS VARCHAR) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
        |    COUNT(DISTINCT o_orderpriority),
        |    CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus),
        |    CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
        |  FROM orders)
        |SELECT * FROM m ORDER BY "column"""".stripMargin) { (spark, dir) =>
      graft.operators.Profile.profile(
        Tables(spark, dir, "orders"),
        Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
    },
  )
}
