package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.streaming.EventStream

/** Stream-vs-batch agreement on the same files: a streaming run over the
  * events parquet must produce exactly the batch answer (the replay /
  * backfill property). Also checks session_window against the explicit
  * lag/running-sum sessionization the q18 oracle uses.
  */
class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables(spark, sf, "events")

  test("streaming hourly windows equal the batch result") {
    val stream = EventStream.hourlyActivity(EventStream.read(spark, sf))
    val q = stream.writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hourly_stream")
      .select("hour", "event_type", "n", "sum_value").collect().toSet
    val want = EventStream.hourlyActivity(batchEvents).collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("streaming sliding windows equal the batch result") {
    val stream = EventStream.slidingActivity(EventStream.read(spark, sf))
    val q = stream.writeStream.format("memory").queryName("sliding_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sliding_stream").collect().toSet
    val want = EventStream.slidingActivity(batchEvents).collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("streaming dedupe passes distinct event ids through") {
    val stream = EventStream.dedupe(EventStream.read(spark, sf))
      .groupBy().agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("dedupe_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedupe_stream").head().getLong(0)
    assert(got == batchEvents.select("event_id").distinct().count())
  }

  test("session_window sessions equal the lag/running-sum sessionization") {
    // q18's formulation, reduced to the comparable (user, start, end, n) set
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val explicit = batchEvents
      .select("user_id", "ts", "value")
      .withColumn("brk", when(prev.isNull
        || col("ts") >= prev + expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
      .withColumn("sid", sum("brk").over(run))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().toSet
    val viaWindow = EventStream.sessions(batchEvents)
      .select(col("user_id"),
        // sessions() runs on LTZ event time; compare in the engine's NTZ
        col("session_start").cast(TimestampNTZType).as("session_start"),
        col("session_end").cast(TimestampNTZType).as("session_end"),
        col("n_events"))
      .collect().toSet
    assert(viaWindow.nonEmpty && viaWindow == explicit)
  }

  test("stream-stream purchase-click interval join equals the batch join") {
    val stream = EventStream.purchaseClickJoin(EventStream.read(spark, sf))
    val q = stream.writeStream.format("memory").queryName("ppc_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ppc_stream").collect().toSet
    val want = EventStream.purchaseClickJoin(batchEvents).collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("mapGroupsWithState running totals equal the batch aggregate") {
    val stream = EventStream.userTotals(EventStream.read(spark, sf))
    val q = stream.writeStream.format("memory").queryName("totals_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("totals_stream")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = batchEvents.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty && got == want)
  }
}
