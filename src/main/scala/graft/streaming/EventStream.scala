package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._
import graft.engine.{Det, Tables, Warehouse}

/** Output row of [[EventStream.userTotals]]. */
final case class UserTotal(user_id: Long, n: Long, total: Double)

/** Keyed state of [[EventStream.closedSessions]]: the user's currently open
  * session (epoch-millis bounds). */
final case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

/** Output row of [[EventStream.closedSessions]]. */
final case class ClosedSession(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

/** Structured Streaming surface over the events stream (SURVEY.md §2.9 —
  * ABSENT in the reference, driver-mandated extension).
  *
  * Each transform below is expressed so the SAME code plans as an
  * incremental streaming query (readStream + watermark + state store) or as
  * a batch query (read) — Catalyst picks the execution mode from the source.
  * The batch plans are what the oracle checks (q17/q18 are the batch
  * equivalents); StreamingSpec checks stream-vs-batch agreement on the same
  * files, which is exactly the replay/backfill property a production
  * pipeline needs.
  *
  * Scale notes: all stateful operators key state by (window, type) or
  * (user, session) — state size ∝ active keys within the watermark horizon,
  * not stream length. The watermark bounds late data at 1 hour so state
  * eviction is continuous.
  */
object EventStream {

  /** Streaming read of an events parquet directory. Schema comes from a
    * batch footer read (streaming sources need it declared), with the same
    * ns→µs NTZ normalization Tables applies. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(Tables.path(dir, "events")).schema
    // the file source needs a directory: stream the sf dir, filtered to the
    // events object(s) (a real deployment points at a growing events/ prefix)
    Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Event-time watermarks require TIMESTAMP (LTZ); the engine carries
    * events as NTZ micros. Identity under the UTC session every entry point
    * pins. */
  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast(TimestampType))

  /** Tumbling 1-hour windowed counts/sums per event type, 1-hour watermark.
    * Batch equivalent of q17_hourly_activity (window start == date_trunc). */
  def hourlyActivity(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes per event type — each event
    * contributes to 4 overlapping windows; state is one aggregate row per
    * (window, type) inside the watermark horizon. Batch equivalent of
    * q62_sliding_windows. */
  def slidingActivity(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap sessionization via the built-in session_window — the
    * streaming-native form of q18's lag/running-sum assignment; in batch
    * mode both produce identical (user, start, end, n, sum) sessions. */
  def sessions(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")

  /** Exactly-once event dedup by id within the watermark horizon — the
    * streaming analogue of exact dedup (late duplicates beyond the horizon
    * age out of state). */
  def dedupe(events: DataFrame): DataFrame =
    withEventTime(events).withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Dedup whose state is BOUNDED by the watermark horizon:
    * dropDuplicatesWithinWatermark keeps each id only until the watermark
    * passes its event time + delay, then evicts — so a duplicate arriving
    * beyond the horizon is emitted AGAIN. That weaker guarantee is the
    * 100 TB trade: [[dedupe]] on a key column with no event-time component
    * holds every id ever seen (state ∝ stream length, an unbounded-domain
    * leak on an infinite stream); this form holds only the ids inside the
    * horizon (state ∝ arrival rate × horizon). Use it when the producer's
    * redelivery window is known (retries, at-least-once sources) and
    * global-history dedup is a batch job's concern. Spark refuses the
    * within-watermark form on batch plans (the horizon needs a watermark
    * timeline to mean anything), so the batch branch dispatches to plain
    * dropDuplicates — a finite replay has no horizon, global dedup IS its
    * semantics; a streaming run may legitimately contain extra re-emits. */
  def dedupeWithinWatermark(events: DataFrame): DataFrame = {
    val e = withEventTime(events).withWatermark("ts", "1 hour")
    if (e.isStreaming) e.dropDuplicatesWithinWatermark("event_id")
    else e.dropDuplicates("event_id")
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks in the 30 minutes at or before it — the streaming form of q49's
    * attribution shape. Both sides carry watermarks and the join condition
    * time-bounds c_ts relative to p_ts on both ends, which is exactly what
    * lets the state store evict rows once the watermark passes the bound —
    * state size ∝ events within the (watermark + bound) horizon per user,
    * not stream length. In batch mode the same code is a plain equi+range
    * join (watermarks are no-ops), so stream-vs-batch agreement is testable
    * on the same files. */
  def purchaseClickJoin(events: DataFrame): DataFrame =
    purchaseClickJoinImpl(events, "inner")

  /** LEFT OUTER form of [[purchaseClickJoin]]: every purchase emits, clickless
    * ones with null click columns. In streaming mode the null row for an
    * unmatched purchase is emitted only once the watermark passes the
    * purchase's match bound (no click can arrive anymore — c_ts <= p_ts, so
    * expiry is watermark > p_ts), which is what keeps the answer append-only
    * AND the state bounded: the purchase row leaves the state store at the
    * same moment its nullability is decided. Until the watermark reaches it,
    * the row is neither emitted nor dropped — an outer result is always one
    * horizon late, the price of correctness on an infinite stream. In batch
    * mode the same code is a plain left outer interval join. */
  def purchaseClickJoinOuter(events: DataFrame): DataFrame =
    purchaseClickJoinImpl(events, "left_outer")

  private def purchaseClickJoinImpl(events: DataFrame, joinType: String): DataFrame = {
    val e = withEventTime(events)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
      .withWatermark("c_ts", "1 hour")
    p.join(c, col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL '30' MINUTE")
        && col("c_ts") <= col("p_ts"), joinType)
      .select(col("p_user").as("user_id"), col("p_ts"), col("purchase_value"),
        col("c_ts"), col("click_value"))
  }

  /** Sessions emitted exactly when they CLOSE — the flatMapGroupsWithState +
    * EventTimeTimeout form of sessionization, for consumers that act on a
    * finished session (billing, abandonment alerts) rather than a running
    * aggregate. A session closes two ways: a same-user event ≥ 30 minutes
    * after its end arrives (emitted inline, the new session opens in its
    * place), or the watermark passes end + gap with no successor (the state
    * TIMEOUT fires and emits it — this is the path a windowed aggregate
    * cannot express: output triggered by the ABSENCE of data). State is one
    * OpenSession per active user; eviction is the timeout itself, so state
    * size ∝ users active within the watermark horizon. Within a batch the
    * per-user rows are sorted in memory — bounded by one user's events per
    * micro-batch, not history. The gap rule (`>=` 30 min) matches q18 and
    * session_window's half-open semantics. In batch mode every session is
    * known-closed, so the same call dispatches to [[sessions]] (Spark
    * forbids event-time timeouts without a real watermark timeline). */
  def closedSessions(events: DataFrame): DataFrame = {
    if (!events.isStreaming) return sessions(events)
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    withEventTime(events)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) = ClosedSession(user,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.end >= gapMs =>
                  out += emit(s)
                  cur = Some(OpenSession(t, t, 1, v))
                case Some(s) =>
                  cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.sum + v))
                case None =>
                  cur = Some(OpenSession(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout in the past fires immediately-ish but Spark rejects
              // timestamps at or before the current watermark — clamp forward
              state.setTimeoutTimestamp(math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
      .toDF()
      .select(col("user_id"),
        col("session_start").cast(TimestampType).as("session_start"),
        col("session_end").cast(TimestampType).as("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** Continuous ingestion into the Hive-partitioned lake layout the batch
    * engine reads (S3Like partitionKeys): append-only parquet under
    * `event_date=YYYY-MM-DD/` directories. The file sink's manifest log
    * makes the stream exactly-once (a restarted query never double-counts a
    * file), and every downstream BATCH query over the landed data gets
    * plan-time partition pruning on `event_date` for free — this is the
    * standing pattern that turns an event stream into a 100 TB date-pruned
    * lake: ingestion cost ∝ arrival rate, query cost ∝ dates touched. */
  def lakeSink(events: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    withEventTime(events)
      .withColumn("event_date", to_date(col("ts")))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Streaming-maintained materialized view: per-user running aggregates
    * upserted into a warehouse table each trigger. Update mode emits only
    * the users whose aggregate changed in the batch; `Warehouse.upsert`
    * (delete-using + insert, last-writer-wins on the key) folds them in, so
    * the table always equals the batch aggregate over everything ingested —
    * and REPLAYING any batch converges to the same state (upsert is
    * idempotent per key), which is what makes foreachBatch's at-least-once
    * delivery exactly-once in effect. State is one aggregate row per user
    * (no watermark: totals are over all time); the per-trigger upsert cost
    * is ∝ changed keys, not table size. */
  def userTotalsToWarehouse(events: DataFrame, target: String, checkpointDir: String): StreamingQuery =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Warehouse.upsert(batch.sparkSession, batch, target, Seq("user_id"))
      }
      .start()

  /** Running per-user totals carried in custom keyed state
    * (mapGroupsWithState) — the escape hatch for stateful logic the
    * built-in windowed aggregates can't express. Each trigger folds its
    * events into (count, sum) state and emits the updated row; state is
    * O(1) per active user. Works identically as a single-pass batch group
    * fold. */
  def userTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          UserTotal(user, n, s)
      }
  }
}
