package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Det, Tables}
import graft.operators.AsOf

/** Event-stream coverage over the `events` table (SURVEY.md §2.8–§2.9
  * extension targets): JSON scalars, time-window aggregation, 30-minute-gap
  * sessionization, backward as-of join, plus string/date scalar functions.
  *
  * Precision rule: `events.ts` is nanosecond parquet; Spark surfaces it in
  * microseconds (Tables narrows by integer division), so every oracle
  * truncates FIRST (`CAST(ts AS TIMESTAMP)` = µs in DuckDB) and computes gaps
  * and inequalities on the truncated value — both engines then see
  * bit-identical timestamps end to end.
  *
  * Scale notes: all aggregations here group on (hour, type) or (user,
  * session) — partial aggregation shrinks each to tiny cardinality before the
  * exchange. Sessionization and as-of are single-window-pass operators: one
  * hash exchange on user_id, per-user ordered scan, O(1) carried state — the
  * shape that survives a 1000-executor fan-out (no joins, no driver state).
  */
object Events {
  import Det.dsum

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  private val k: Column = get_json_object(col("props"), "$.k").cast(IntegerType)

  /** 30-minute-gap session assignment (lag → break flag → running sum),
    * shared by q18 and q49. Gap rule `>=` matches session_window's
    * half-open merge (see q18's comment). */
  private def sessionized(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    e.withColumn("brk", when(prev.isNull
        || col("ts") >= prev + expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum("brk").over(run).cast(IntegerType))
      .drop("brk")
  }

  val queries: Seq[OracleQuery] = Seq(
    // ---- q16: JSON scalar extraction + typed aggregation ----
    OracleQuery(
      "q16_json_by_type",
      """WITH e AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      ev(spark, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // ---- q17: tumbling 1-hour window aggregation (batch form of the
    //           streaming window; same groupBy shape Structured Streaming
    //           plans incrementally) ----
    OracleQuery(
      "q17_hourly_activity",
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, user_id, value FROM events)
        |SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
      ev(spark, dir)
        // date_trunc yields LTZ even for NTZ input — cast back (UTC session)
        .groupBy(date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("users"),
          dsum(col("value")).as("sum_value"))
        .orderBy("hour", "event_type")
    },

    // ---- q62: sliding-window aggregation — 1-hour windows every 15
    //           minutes, so each event lands in exactly 4 overlapping
    //           windows (Spark's Expand: 4 rows per event, then partial
    //           aggregation shrinks to window×type cardinality before the
    //           exchange). Oracle replicates the epoch-aligned window grid
    //           with explicit integer arithmetic through make_timestamp
    //           (timezone-FREE — to_timestamp()::TIMESTAMP would route
    //           through DuckDB's session TimeZone and shift every window
    //           start on a non-UTC host). ----
    OracleQuery(
      "q62_sliding_windows",
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (
        |  SELECT make_timestamp((CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)
        |           - g.k * 900) * 1000000) AS w_start, event_type, value
        |  FROM e, unnest(generate_series(0, 3)) AS g(k))
        |SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
      ev(spark, dir)
        .groupBy(
          window(col("ts").cast(TimestampType), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        // window bounds come back LTZ — NTZ under the pinned UTC session
        .select(col("window.start").cast(TimestampNTZType).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    // ---- q18: sessionization — 30-minute-gap session assignment via a
    //           single per-user window pass (lag → break flag → running sum).
    //           Gap rule is `>=` so batch sessionization agrees exactly with
    //           session_window's half-open [start, last+gap) merge — an
    //           event landing exactly at the 30-minute mark starts a NEW
    //           session in both formulations (StreamingSpec pins this). ----
    OracleQuery(
      "q18_sessionization",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |b AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
        |      FROM b)
        |SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
      sessionized(ev(spark, dir).select("user_id", "ts", "value"))
        .groupBy("user_id", "session_id")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    },

    // ---- q19: backward as-of join — each purchase matched to the user's
    //           most recent click at or before it (graft.operators.AsOf) ----
    OracleQuery(
      "q19_asof_purchase_click",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |p AS (SELECT user_id, ts, value AS purchase_value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, value AS click_value FROM e WHERE event_type = 'click')
        |SELECT p.user_id, p.ts, p.purchase_value, c.click_ts, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.user_id, p.ts""".stripMargin) { (spark, dir) =>
      val e = ev(spark, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select(col("user_id"), col("ts"), col("purchase_value"),
          col(AsOf.matchedTsName("ts")).as("click_ts"), col("click_value"))
        .orderBy("user_id", "ts")
    },

    // ---- q49: interval (equi + range) join — attribute each purchase to
    //           the session whose [start, end] contains it. The equi key
    //           (user_id) carries the distribution; the range predicate is
    //           evaluated within the co-partitioned sort-merge join, so no
    //           all-pairs work happens at any scale. ----
    OracleQuery(
      "q49_session_attribution",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |b AS (SELECT user_id, ts, value, event_type,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value, event_type,
        |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
        |      FROM b),
        |sess AS (SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        |         FROM s GROUP BY user_id, session_id),
        |p AS (SELECT user_id, ts, value FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.ts, p.value, sess.session_id, sess.session_start
        |FROM p JOIN sess ON sess.user_id = p.user_id
        |  AND p.ts >= sess.session_start AND p.ts <= sess.session_end
        |ORDER BY p.user_id, p.ts""".stripMargin) { (spark, dir) =>
      val e = ev(spark, dir)
      val sess = sessionized(e.select("user_id", "ts", "value"))
        .groupBy("user_id", "session_id")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"))
        .withColumnRenamed("user_id", "s_user")
      e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
        .join(sess, col("s_user") === col("user_id")
          && col("ts") >= col("session_start") && col("ts") <= col("session_end"))
        .select("user_id", "ts", "value", "session_id", "session_start")
        .orderBy("user_id", "ts")
    },

    // ---- q20: string scalar functions (upper/substr/length/levenshtein/
    //           concat_ws/replace — SURVEY.md §2.8) ----
    OracleQuery(
      "q20_string_funcs",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  substr(c_name, 1, 8) AS prefix8,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS seg_lev,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged,
        |  replace(lower(c_name), ' ', '_') AS snake
        |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          length(col("c_name")).as("name_len"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_lev"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          regexp_replace(lower(col("c_name")), " ", "_").as("snake"))
        .orderBy("c_custkey")
    },

    // ---- q21: date-part extraction + aggregation (year/quarter/month) ----
    OracleQuery(
      "q21_date_parts",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("y", "q", "m")
    },

    // ---- q64: FORWARD as-of join — each purchase matched to the user's
    //           earliest click at or after it (pandas merge_asof
    //           direction='forward'). DuckDB's ASOF JOIN leaves the tie
    //           among equal click_ts rows unspecified, so the oracle uses a
    //           LATERAL whose ORDER BY replicates the operator's tie-break
    //           exactly: min (click_ts, click_value). ----
    OracleQuery(
      "q64_asof_forward",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |p AS (SELECT user_id, ts, value AS purchase_value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, value AS click_value FROM e WHERE event_type = 'click')
        |SELECT p.user_id, p.ts, p.purchase_value, m.click_ts, m.click_value
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.click_ts, c.click_value FROM c
        |  WHERE c.user_id = p.user_id AND c.click_ts >= p.ts
        |  ORDER BY c.click_ts, c.click_value LIMIT 1) m ON TRUE
        |ORDER BY p.user_id, p.ts""".stripMargin) { (spark, dir) =>
      val e = ev(spark, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts", direction = "forward")
        .select(col("user_id"), col("ts"), col("purchase_value"),
          col(AsOf.matchedTsName("ts")).as("click_ts"), col("click_value"))
        .orderBy("user_id", "ts")
    },

    // ---- q65: NEAREST as-of join with a 30-minute tolerance (pandas
    //           merge_asof direction='nearest', tolerance=...): the closer
    //           of the latest-before / earliest-after click, equidistant →
    //           backward, candidates beyond the bound nulled. Backward-best
    //           beyond tolerance implies every earlier click is too (and
    //           symmetrically forward), so per-candidate bounding in the
    //           operator equals the oracle's WHERE-in-LATERAL filter. ----
    OracleQuery(
      "q65_asof_nearest",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |p AS (SELECT user_id, ts, value AS purchase_value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, value AS click_value FROM e WHERE event_type = 'click')
        |SELECT p.user_id, p.ts, p.purchase_value,
        |  CASE WHEN b.click_ts IS NULL THEN f.click_ts
        |       WHEN f.click_ts IS NULL THEN b.click_ts
        |       WHEN f.click_ts - p.ts < p.ts - b.click_ts THEN f.click_ts
        |       ELSE b.click_ts END AS click_ts,
        |  CASE WHEN b.click_ts IS NULL THEN f.click_value
        |       WHEN f.click_ts IS NULL THEN b.click_value
        |       WHEN f.click_ts - p.ts < p.ts - b.click_ts THEN f.click_value
        |       ELSE b.click_value END AS click_value
        |FROM p
        |LEFT JOIN LATERAL (
        |  SELECT c.click_ts, c.click_value FROM c
        |  WHERE c.user_id = p.user_id AND c.click_ts <= p.ts
        |    AND p.ts - c.click_ts <= INTERVAL '30 minutes'
        |  ORDER BY c.click_ts DESC, c.click_value DESC LIMIT 1) b ON TRUE
        |LEFT JOIN LATERAL (
        |  SELECT c.click_ts, c.click_value FROM c
        |  WHERE c.user_id = p.user_id AND c.click_ts >= p.ts
        |    AND c.click_ts - p.ts <= INTERVAL '30 minutes'
        |  ORDER BY c.click_ts, c.click_value LIMIT 1) f ON TRUE
        |ORDER BY p.user_id, p.ts""".stripMargin) { (spark, dir) =>
      val e = ev(spark, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts",
          direction = "nearest", tolerance = Some(expr("INTERVAL '30' MINUTE")))
        .select(col("user_id"), col("ts"), col("purchase_value"),
          col(AsOf.matchedTsName("ts")).as("click_ts"), col("click_value"))
        .orderBy("user_id", "ts")
    },
  )
}
