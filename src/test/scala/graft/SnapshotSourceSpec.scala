package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** DSv2 streaming source over snapshot tables
  * ([[graft.streaming.SnapshotSourceProvider]]): version-offset tailing,
  * exactly-once restart, append-only change guard, DV awareness. */
class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  private def tmp(prefix: String): String =
    "file:" + Files.createTempDirectory(prefix).toString + "/t"

  private def ckpt(): String =
    Files.createTempDirectory("ssrc_ck").toString

  test("tails commits: initial state + appends arrive exactly once, schema surfaced") {
    val root = tmp("ssrc")
    Snapshots.commit(
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x"), root)
    val stream = spark.readStream.format(Fmt).option("root", root).load()
    assert(stream.schema.fieldNames.toSeq === Seq("id", "s", "x"))
    val q = stream.writeStream.format("memory").queryName("ssrc_tail")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_tail").count() === 2)
      Snapshots.commit(Seq((3L, "c", 3.5)).toDF("id", "s", "x"), root, append = true)
      Snapshots.commit(Seq((4L, "d", 4.5)).toDF("id", "s", "x"), root, append = true)
      q.processAllAvailable()
      val got = spark.table("ssrc_tail").as[(Long, String, Double)].collect().toSet
      assert(got === Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5), (4L, "d", 4.5)))
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly-once") {
    val root = tmp("ssrc_r")
    val ck = ckpt()
    val out = Files.createTempDirectory("ssrc_out").toString
    Snapshots.commit(spark.range(0, 50).select($"id"), root)
    val s1 = spark.readStream.format(Fmt).option("root", root).load()
    val q1 = s1.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() === 50)
    // new commits while the stream is DOWN; restart on the SAME checkpoint
    Snapshots.commit(spark.range(50, 80).select($"id"), root, append = true)
    val s2 = spark.readStream.format(Fmt).option("root", root).load()
    val q2 = s2.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q2.processAllAvailable() } finally q2.stop()
    // only the missed span arrived — no replay of the first 50
    assert(spark.read.parquet(out).as[Long].collect().toSet === (0L until 80L).toSet)
    assert(spark.read.parquet(out).count() === 80)
  }

  test("startingVersion=latest skips history; explicit version is an exclusive base") {
    val root = tmp("ssrc_l")
    Snapshots.commit(spark.range(0, 10).select($"id"), root)
    Snapshots.commit(spark.range(10, 20).select($"id"), root, append = true)
    val s = spark.readStream.format(Fmt).option("root", root)
      .option("startingVersion", "latest").load()
    val q = s.writeStream.format("memory").queryName("ssrc_latest")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_latest").count() === 0)
      Snapshots.commit(spark.range(20, 25).select($"id"), root, append = true)
      q.processAllAvailable()
      assert(spark.table("ssrc_latest").as[Long].collect().toSet === (20L until 25L).toSet)
    } finally q.stop()

    val s2 = spark.readStream.format(Fmt).option("root", root)
      .option("startingVersion", "2").load()
    val q2 = s2.writeStream.format("memory").queryName("ssrc_from2")
      .option("checkpointLocation", ckpt()).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ssrc_from2").as[Long].collect().toSet === (20L until 25L).toSet)
    } finally q2.stop()
  }

  test("a rewrite mid-stream fails the append-only tail; ignoreChanges opts through") {
    val root = tmp("ssrc_g")
    Snapshots.commit(spark.range(0, 20).select($"id", lit("v1").as("s")), root,
      statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("memory").queryName("ssrc_guard")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      Snapshots.merge(Seq((5L, "v2")).toDF("id", "s"), root, "id",
        statsCols = Seq("id"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("ignoreChanges") ||
        Option(ex.getCause).exists(_.getMessage.contains("ignoreChanges")))
    } finally q.stop()

    // ignoreChanges: the rewritten file's rows re-emit (documented dupes)
    val q2 = spark.readStream.format(Fmt).option("root", root)
      .option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("ssrc_ign")
      .option("checkpointLocation", ckpt()).start()
    try {
      q2.processAllAvailable()
      val got = spark.table("ssrc_ign").as[(Long, String)].collect().toSet
      // full current state present (the update visible); dupes allowed
      assert(got.size >= 20 && got.contains((5L, "v2")))
    } finally q2.stop()
  }

  test("a vectored delete mid-stream also trips the guard; same-span commit+delete tails clean") {
    val root = tmp("ssrc_dv")
    Snapshots.commit(spark.range(0, 30).select($"id"), root, statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("memory").queryName("ssrc_dvg")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      Snapshots.deleteWhere(spark, root, col("id") === 7)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("ignoreChanges") ||
        Option(ex.getCause).exists(_.getMessage.contains("ignoreChanges")))
    } finally q.stop()

    // commit + vectored delete BEFORE the stream sees either: the span's
    // net effect is clean — the reader applies the vector, deleted rows
    // never arrive
    val root2 = tmp("ssrc_dv2")
    Snapshots.commit(spark.range(0, 30).select($"id"), root2, statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root2, col("id") < 3)
    val q2 = spark.readStream.format(Fmt).option("root", root2).load()
      .writeStream.format("memory").queryName("ssrc_dvclean")
      .option("checkpointLocation", ckpt()).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ssrc_dvclean").as[Long].collect().toSet ===
        (3L until 30L).toSet)
    } finally q2.stop()
  }

  test("array and timestamp columns stream faithfully; column pruning holds") {
    val root = tmp("ssrc_t")
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")),
      (2L, Seq.empty[Float], java.sql.Timestamp.valueOf("1999-12-31 23:59:59.0")))
      .toDF("id", "emb", "ts")
    Snapshots.commit(df, root)
    val q = spark.readStream.format(Fmt).option("root", root).load()
      .select("id", "emb", "ts")
      .writeStream.format("memory").queryName("ssrc_types")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssrc_types")
        .as[(Long, Seq[Float], java.sql.Timestamp)].collect().toSet
      assert(got === df.as[(Long, Seq[Float], java.sql.Timestamp)].collect().toSet)
    } finally q.stop()
    // pruned projection: only one column requested
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .select("id")
      .writeStream.format("memory").queryName("ssrc_prune")
      .option("checkpointLocation", ckpt()).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ssrc_prune").as[Long].collect().toSet === Set(1L, 2L))
    } finally q2.stop()
  }

  test("maxFilesPerTrigger paces a backfill into multiple version-aligned batches") {
    val root = tmp("ssrc_rate")
    // three single-file commits: with a 1-file budget each trigger admits
    // exactly one version
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(1), root)
    Snapshots.commit(spark.range(10, 20).select($"id").repartition(1), root, append = true)
    Snapshots.commit(spark.range(20, 30).select($"id").repartition(1), root, append = true)
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("ssrc_rate")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_rate").as[Long].collect().toSet === (0L until 30L).toSet)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3,
        s"expected 3 paced batches, got ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows === 10))
    } finally q.stop()
  }

  test("maxBytesPerTrigger paces a backfill by shard-recorded file sizes") {
    val root = tmp("ssrc_bytes")
    // three single-file commits of very different widths: a byte budget
    // sized to one small file admits versions one at a time — and the
    // budget arithmetic reads ONLY the shard-recorded sizes (no FS RPC)
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(1), root)
    Snapshots.commit(spark.range(10, 20).select($"id").repartition(1), root, append = true)
    Snapshots.commit(spark.range(20, 30).select($"id").repartition(1), root, append = true)
    val m = Snapshots.manifest(spark, root, 3L)
    assert(m.rows.forall(_.bytes > 0L), "commits must record per-file byte sizes")
    val oneFile = m.rows.map(_.bytes).min
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("maxBytesPerTrigger", oneFile.toString).load()
      .writeStream.format("memory").queryName("ssrc_bytes")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_bytes").as[Long].collect().toSet === (0L until 30L).toSet)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3,
        s"expected 3 byte-paced batches, got ${batches.map(_.numInputRows).mkString(",")}")
    } finally q.stop()
  }

  test("maxFiles and maxBytes together: the tighter budget wins per trigger") {
    val root = tmp("ssrc_both")
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(1), root)
    Snapshots.commit(spark.range(10, 20).select($"id").repartition(1), root, append = true)
    // generous byte budget + 1-file budget → files bound pacing (2 batches)
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("maxFilesPerTrigger", "1")
      .option("maxBytesPerTrigger", "1g").load()
      .writeStream.format("memory").queryName("ssrc_both")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_both").as[Long].collect().toSet === (0L until 20L).toSet)
      assert(q.recentProgress.count(_.numInputRows > 0) === 2)
    } finally q.stop()
  }

  test("Trigger.AvailableNow: paced catch-up to the start-time head, then stop") {
    val root = tmp("ssrc_avnow")
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(1), root)
    Snapshots.commit(spark.range(10, 20).select($"id").repartition(1), root, append = true)
    Snapshots.commit(spark.range(20, 30).select($"id").repartition(1), root, append = true)
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("ssrc_avnow")
      .option("checkpointLocation", ckpt())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // terminates on its own once the pinned head is consumed
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(spark.table("ssrc_avnow").as[Long].collect().toSet === (0L until 30L).toSet)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === 3,
      s"rate limits must still pace the catch-up, got ${batches.length} batches")
  }

  test("a widen mid-stream fails with restart guidance; the restart reads every generation wide") {
    val root = tmp("ssrc_w")
    val sink = tmp("ssrc_wsink")
    Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("k", "s"), root)
    val ck = ckpt()
    def startQ() = spark.readStream.format(Fmt).option("root", root)
      .option("startingVersion", "earliest").load()
      .writeStream.format(Fmt).option("root", sink)
      .option("checkpointLocation", ck).start()
    val q = startQ()
    try {
      q.processAllAvailable()
      assert(spark.read.format(Fmt).option("root", sink).load().count() === 2L)
      // widen + a wide-generation append beneath the running stream: its
      // planned int vectors cannot hold the new files — the failure must
      // be the ACTIONABLE planning error, not a task-level decode crash
      Snapshots.widenColumn(spark, root, "k", org.apache.spark.sql.types.LongType)
      Snapshots.commit(Seq((5000000000L, "wide")).toDF("k", "s"), root,
        append = true)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(causes(e).exists(c =>
        String.valueOf(c.getMessage).contains("restart the streaming query")),
        s"expected the schema-drift planning error, got ${e.getMessage.take(200)}")
    } finally q.stop()
    // operational recovery: widen the SINK to match, restart from the
    // same checkpoint — the stream re-resolves the WIDE schema, resumes
    // at exactly the failed batch, and the sink lands the wide row
    Snapshots.widenColumn(spark, sink, "k", org.apache.spark.sql.types.LongType)
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val out = spark.read.format(Fmt).option("root", sink).load()
      assert(out.schema("k").dataType === org.apache.spark.sql.types.LongType)
      assert(out.as[(Long, String)].collect().toSet
        === Set((1L, "a"), (2L, "b"), (5000000000L, "wide")),
        "the restarted stream must resume at exactly the failed batch")
    } finally q2.stop()
  }

  test("streams under a renamed schema: current logical names over old files") {
    val root = tmp("ssrc_ren")
    Snapshots.commit(Seq((1L, "x")).toDF("id", "old_name"), root)
    Snapshots.renameColumn(spark, root, "old_name", "new_name")
    val s = spark.readStream.format(Fmt).option("root", root).load()
    assert(s.schema.fieldNames.toSeq === Seq("id", "new_name"))
    val q = s.writeStream.format("memory").queryName("ssrc_ren")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssrc_ren").as[(Long, String)].collect().toSet ===
        Set((1L, "x")))
    } finally q.stop()
  }
}
