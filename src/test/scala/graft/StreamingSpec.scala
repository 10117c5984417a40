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

  // --- controlled multi-batch harness: one parquet file per micro-batch,
  //     ordered by modification time, maxFilesPerTrigger=1 → deterministic
  //     watermark advancement between batches (the property the horizon
  //     semantics below depend on) ---

  private def syntheticEvents(rows: Seq[(Long, Long, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  /** Writes each batch as a single parquet FILE (not directory) with
    * ascending mod times, returns a streaming DataFrame that replays them
    * one file per trigger. */
  private def fileStream(batches: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("evtstream").toFile
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory("evtpart").toFile
      df.coalesce(1).write.mode("overwrite").parquet("file:" + tmp)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(dir, s"b$i.parquet")
      Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + dir)
  }

  test("dedup within watermark: in-horizon dups drop, beyond-horizon dups re-emit") {
    // b0: id 1 twice inside the horizon → one row. b1: id 9 at 14:00 pushes
    // the watermark to 13:00 (past id 1's expiry, 10:00 + 1h). b2 is a
    // filler batch whose processing pass performs the eviction — state
    // cleanup runs in the batch AFTER the watermark advances. b3: id 1 again
    // at 13:30 — beyond the horizon, state gone, so it EMITS again: the
    // bounded-state contract trades global-history dedup for state ∝ horizon.
    val b0 = syntheticEvents(Seq(
      (1L, 1L, "click", "2024-01-01 10:00:00", 1.0),
      (1L, 1L, "click", "2024-01-01 10:05:00", 1.0)))
    val b1 = syntheticEvents(Seq((9L, 2L, "click", "2024-01-01 14:00:00", 1.0)))
    val b2 = syntheticEvents(Seq((8L, 2L, "click", "2024-01-01 14:10:00", 1.0)))
    val b3 = syntheticEvents(Seq((1L, 1L, "click", "2024-01-01 13:30:00", 1.0)))
    val stream = EventStream.dedupeWithinWatermark(fileStream(Seq(b0, b1, b2, b3)))
    val q = stream.writeStream.format("memory").queryName("wmdedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("wmdedup_stream")
      .select(col("event_id"), col("ts").cast(TimestampNTZType).cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00"),   // first occurrence emits; 10:05 dup dropped
      (9L, "2024-01-01 14:00:00"),
      (8L, "2024-01-01 14:10:00"),
      (1L, "2024-01-01 13:30:00")))  // re-emitted: state already evicted
    // batch mode: a finite replay has no horizon — dispatches to global dedup
    val batchIn = b0.union(b1).union(b2).union(b3)
    assert(EventStream.dedupeWithinWatermark(batchIn).count() ==
      batchIn.dropDuplicates("event_id").count())
  }

  test("left-outer stream-stream join emits null rows on watermark expiry, equals batch") {
    // u1's purchase never gets a click; its null row may only emit once the
    // watermark passes its bound. b1 (20:00) lifts the watermark to 19:00,
    // b2's processing pass then evicts-and-null-emits the 10:00 purchase —
    // after which the streaming answer equals the batch left outer exactly.
    val b0 = syntheticEvents(Seq(
      (10L, 1L, "purchase", "2024-01-01 10:00:00", 100.0),
      (11L, 2L, "click", "2024-01-01 09:50:00", 5.0),
      (12L, 2L, "purchase", "2024-01-01 10:00:00", 200.0)))
    val b1 = syntheticEvents(Seq(
      (13L, 3L, "click", "2024-01-01 20:00:00", 6.0),
      (14L, 3L, "purchase", "2024-01-01 20:00:00", 300.0)))
    val b2 = syntheticEvents(Seq((15L, 4L, "click", "2024-01-01 23:00:00", 7.0)))
    val stream = EventStream.purchaseClickJoinOuter(fileStream(Seq(b0, b1, b2)))
    val q = stream.writeStream.format("memory").queryName("ppco_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ppco_stream").collect().toSet
    val want = EventStream.purchaseClickJoinOuter(b0.union(b1).union(b2)).collect().toSet
    assert(got.size == 3 && got == want)
    assert(got.exists(r => r.getLong(0) == 1L && r.isNullAt(3)),
      "u1's clickless purchase did not emit a null row")
  }

  test("closed sessions emit on successor arrival AND on event-time timeout") {
    // u1: two events then a 110-min-later third — session A closes INLINE
    // when the third arrives (successor path), which opens session B.
    // b1 (20:00) lifts the watermark to 19:00; b2's pass then fires B's
    // TIMEOUT (end 12:00 + 30min < 19:00) — emission triggered by the
    // absence of data, the thing a windowed aggregate can't express. After
    // b2 the watermark reaches 22:00 and Spark runs one more empty batch
    // purely to fire expired timeouts — closing u2's session (bound 20:30)
    // too. Only u9 (bound 23:30, past the final watermark) stays open.
    val b0 = syntheticEvents(Seq(
      (1L, 1L, "click", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "click", "2024-01-01 10:10:00", 2.0),
      (3L, 1L, "click", "2024-01-01 12:00:00", 4.0)))
    val b1 = syntheticEvents(Seq((4L, 2L, "click", "2024-01-01 20:00:00", 8.0)))
    val b2 = syntheticEvents(Seq((5L, 9L, "click", "2024-01-01 23:00:00", 16.0)))
    val stream = EventStream.closedSessions(fileStream(Seq(b0, b1, b2)))
    val q = stream.writeStream.format("memory").queryName("closed_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("closed_stream")
      .select(col("user_id"),
        col("session_start").cast(TimestampNTZType).cast("string"),
        col("session_end").cast(TimestampNTZType).cast("string"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L, 3.0),  // successor close
      (1L, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1L, 4.0),  // timeout close
      (2L, "2024-01-01 20:00:00", "2024-01-01 20:00:00", 1L, 8.0))) // empty-batch timeout
    // batch mode: every session is known-closed → dispatches to sessions()
    val batchIn = b0.union(b1).union(b2)
    val batchGot = EventStream.closedSessions(batchIn)
      .select(col("user_id"),
        col("session_start").cast(TimestampNTZType).cast("string"),
        col("session_end").cast(TimestampNTZType).cast("string"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(batchGot.size == 4 && got.subsetOf(batchGot),
      "streaming closed sessions must be the batch sessions the watermark has passed")
  }

  test("lake sink lands date-partitioned parquet that batch reads with pruning") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("lake").toString
    val ckpt = Files.createTempDirectory("lakeckpt").toString
    val q = EventStream.lakeSink(EventStream.read(spark, sf), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    // directory layout is the Hive-partitioned lake shape
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_ != "_spark_metadata") // the exactly-once manifest log
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")))
    // a date-filtered batch read prunes partitions at plan time and agrees
    // with the batch answer for that date
    val oneDate = dirs.head.stripPrefix("event_date=")
    val read = spark.read.parquet(out).filter(col("event_date") === lit(oneDate))
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).isDefined,
      "event_date filter not pruning partitions")
    val want = batchEvents.filter(to_date(col("ts").cast(TimestampType)) === lit(oneDate)).count()
    assert(read.count() == want && want > 0)
    // total landed rows = total stream rows (exactly-once manifest)
    assert(spark.read.parquet(out).count() == batchEvents.count())
  }

  test("foreachBatch upsert maintains the batch aggregate in the warehouse") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("whckpt").toString
    val target = "stream_user_totals"
    val batchAgg = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), graft.engine.Det.dsum(col("value")).as("total"))
    // drop catalog entries AND their locations — an earlier aborted run can
    // leave an orphaned warehouse directory that blocks saveAsTable
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq(target, s"stage_$target").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(wh, t))
    }
    batchAgg.limit(0).write.saveAsTable(target)   // reference contract: target exists
    val q = EventStream.userTotalsToWarehouse(EventStream.read(spark, sf), target, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(target).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = batchAgg.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == want)
    spark.sql(s"DROP TABLE IF EXISTS $target")
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

  test("streaming cluster maintenance equals the batch closure over all arrived pairs") {
    // the streaming form of q68: edge batches arrive per trigger, the
    // labeling parquet is folded forward via Components.merge — after any
    // number of triggers it must equal the batch recompute over EVERYTHING
    // that has arrived, including a batch that BRIDGES two clusters born in
    // different triggers (the case a per-batch-only clustering gets wrong)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val base = java.nio.file.Files.createTempDirectory("clusterstream").toString
    val labelsDir = s"$base/labels"
    val q = graft.streaming.ClusterStream.maintain(
      input.toDF().toDF("pa", "pb"), "pa", "pb", labelsDir, s"$base/ckpt")
    val batch1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val batch2 = Seq((20L, 21L), (3L, 10L)) // (3,10) bridges batch-1 clusters
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(labelsDir).as[(Long, Long)].collect().toSet
    val want = graft.operators.Components
      .connected((batch1 ++ batch2).toDF("pa", "pb"), "pa", "pb")
      .as[(Long, Long)].collect().toSet
    assert(got == want, "maintained labeling diverged from the batch closure")
    assert(got.contains((11L, 1L)), "bridge edge did not merge the trigger-1 clusters")
  }

  test("streaming dedup ingest equals the batch minhash + cluster recompute") {
    // end-to-end standing-pipeline dedup: documents arrive over two
    // triggers, each batch is shingled/signed ONCE, candidates come from
    // probing the persistent band index (new-vs-all), and the labeling is
    // folded forward — the final labels must equal re-running the whole
    // batch path (q28 candidates → q68 closure) over every doc that arrived
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val (b1, b2) = docs.as[(Long, String)].collect().partition(_._1 % 2 == 0)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val q = graft.streaming.DedupStream.maintain(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/index", s"$base/labels", s"$base/ckpt")
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/labels").as[(Long, Long)].collect().toSet
    val sh = graft.functions.TextOps.shinglePostings(docs, "doc_id", "text", 3)
    val want = graft.operators.Components
      .connected(graft.operators.MinHashLSH.candidatePairs(sh), "d1", "d2")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "test corpus has no near-dup pairs — assertion would be vacuous")
    assert(got == want, "streamed labeling diverged from the batch recompute")
  }

  test("dedup stream suppresses over-cap band buckets (bounded per-trigger work)") {
    // 70 identical docs share whole signatures → one band bucket of 70 >
    // BandBucketCap(64) per band: the stream must emit NO pairs for the
    // family (matching q28's capped batch semantics — exact dedup is the
    // right operator for identical docs), while a small genuine near-dup
    // pair in the same batch still labels
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val family = (1L to 70L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val nearDup = Seq(
      (201L, "one two three four five six seven eight nine ten eleven twelve"),
      (202L, "one two three four five six seven eight nine ten eleven thirteen"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("dedupcap").toString
    val q = graft.streaming.DedupStream.maintain(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/index", s"$base/labels", s"$base/ckpt")
    try {
      input.addData(family ++ nearDup: _*)
      q.processAllAvailable()
    } finally q.stop()
    val labeled = spark.read.parquet(s"$base/labels")
      .as[(Long, Long)].collect().toMap
    assert(labeled.keySet === Set(201L, 202L),
      s"expected only the genuine near-dup pair labeled, got ${labeled.keySet}")
  }

  test("snapshot sink folds manifest compaction into the ingest loop") {
    // one metadata shard lands per trigger; compactManifestsEvery bounds
    // resolution cost for long-lived standing ingests
    import spark.implicits._
    import graft.engine.Snapshots
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("snapcompact").toString
    val root = s"file:$base/t"
    val q = graft.streaming.SnapshotSink.start(
      input.toDF().toDF("id", "s"), root, s"$base/ckpt",
      compactManifestsEvery = 2)
    try {
      (0 until 4).foreach { i =>
        input.addData((i.toLong, s"v$i")); q.processAllAvailable()
      }
    } finally q.stop()
    val head = Snapshots.headVersion(spark, root)
    // 4 batch commits + 2 compaction commits; the head resolves ≤ 2 shards
    // (post-compact consolidated shard + at most one fresh batch shard)
    assert(Snapshots.manifestMeta(spark, root, head).shardRefs.size <= 2,
      "manifest compaction did not bound the shard count")
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      (0 until 4).map(i => (i.toLong, s"v$i")).toSet,
      "compaction changed the table contents")
  }

  test("restart from checkpoint: killed snapshot ingest resumes exactly-once") {
    // the real at-least-once path, not an in-process micro-batch harness:
    // a query is STOPPED and a new query object restarts from the same
    // checkpoint directory. The file source's seen-files log (checkpoint)
    // plus the batch-id idempotency tag (table) must compose to
    // exactly-once table states across the restart boundary — by design;
    // this proves it
    import spark.implicits._
    import graft.engine.Snapshots
    val base = java.nio.file.Files.createTempDirectory("ckrestart").toString
    val srcDir = s"$base/src"; val ck = s"$base/ckpt"; val root = s"file:$base/t"
    val schema = new StructType().add("id", LongType).add("s", StringType)
    def run(): Unit = {
      val q = graft.streaming.SnapshotSink.start(
        spark.readStream.schema(schema).parquet(srcDir), root, ck,
        statsCols = Seq("id"))
      try q.processAllAvailable() finally q.stop()
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(srcDir)
    run()
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // data lands while the query is DOWN; the restarted query must pick it
    // up from the checkpoint and absorb it exactly once
    Seq((3L, "c")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(srcDir)
    run()
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "restart lost or duplicated a batch")
    // each absorbed batch carries a distinct batch-id tag — the replay
    // no-op evidence (a re-committed batch would duplicate a tag or a row)
    val tags = Snapshots.historyMeta(spark, root).map(_.tag)
    assert(tags.distinct.size === tags.size, s"duplicate batch tags: $tags")
    // a restart with NOTHING new commits nothing
    val head = Snapshots.headVersion(spark, root)
    run()
    assert(Snapshots.headVersion(spark, root) === head,
      "an empty restart advanced the table")
  }
}
