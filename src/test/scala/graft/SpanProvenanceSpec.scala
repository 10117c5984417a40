package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Per-commit span classification in the snapshot stream
  * ([[graft.streaming.SnapshotSource]] walkSpanProvenance): a compaction of
  * pre-span files is row-invisible to an append-only tail, an in-span
  * compaction emits exactly once, a mixed rewrite trips the guard, and a
  * vacuumed interim manifest degrades to the coarse whole-span check
  * instead of crashing or silently passing. */
class SpanProvenanceSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  private def tmp(prefix: String): String =
    "file:" + Files.createTempDirectory(prefix).toString + "/t"

  private def ckpt(): String =
    Files.createTempDirectory("span_ck").toString

  /** Delete version v's manifest directly — simulates a vacuum that
    * removed an INTERIM manifest while base + head are still retained
    * (the shape the coarse fallback exists for). */
  private def dropManifest(root: String, v: Long): Unit = {
    val dir = root.stripPrefix("file:")
    val p = Paths.get(s"$dir/_snapshots/manifest-$v.json")
    assert(Files.deleteIfExists(p), s"expected $p to exist")
  }

  test("pre-span compaction mid-stream is row-invisible: no re-emit, no guard trip") {
    val root = tmp("span_pre")
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(2), root,
      statsCols = Seq("id"))
    Snapshots.commit(spark.range(10, 20).select($"id").repartition(2), root,
      append = true, statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("memory").queryName("span_pre")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable() // consumed v1+v2: files are now pre-span
      Snapshots.compact(spark, root, targetFiles = 1, statsCols = Seq("id"))
      Snapshots.commit(spark.range(20, 25).select($"id"), root,
        append = true, statsCols = Seq("id"))
      q.processAllAvailable() // span = (2, 4]: optimize carry + append
      assert(spark.table("span_pre").count() === 25) // exactly-once: no re-emit
      assert(spark.table("span_pre").as[Long].collect().toSet === (0L until 25L).toSet)
    } finally q.stop()
  }

  test("in-span appends compacted within the same span emit exactly once") {
    val root = tmp("span_in")
    val ck = ckpt()
    Snapshots.commit(spark.range(0, 5).select($"id"), root, statsCols = Seq("id"))
    val out = Files.createTempDirectory("span_in_out").toString
    val q1 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // while the stream is down: two appends, then a compaction that (via
    // stats pruning) rewrites ONLY those in-span files — its outputs ARE
    // the span's new rows and must emit, once
    Snapshots.commit(spark.range(100, 110).select($"id").repartition(2), root,
      append = true, statsCols = Seq("id"))
    Snapshots.commit(spark.range(110, 120).select($"id").repartition(2), root,
      append = true, statsCols = Seq("id"))
    Snapshots.compactWhere(spark, root, $"id" >= 100L, targetFiles = 1,
      statsCols = Seq("id"))
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out).as[Long].collect().toSeq
    assert(got.size === 25, s"expected 5 base + 20 in-span rows once, got ${got.size}")
    assert(got.toSet === ((0L until 5L) ++ (100L until 120L)).toSet)
  }

  test("a compaction mixing pre-span and in-span inputs trips the guard") {
    val root = tmp("span_mix")
    val ck = ckpt()
    Snapshots.commit(spark.range(0, 10).select($"id"), root, statsCols = Seq("id"))
    val out = Files.createTempDirectory("span_mix_out").toString
    val q1 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // append then compact EVERYTHING: outputs mix pre-span rows (already
    // emitted) with in-span rows (never emitted) — unrepresentable
    Snapshots.commit(spark.range(10, 20).select($"id"), root,
      append = true, statsCols = Seq("id"))
    Snapshots.compact(spark, root, targetFiles = 1, statsCols = Seq("id"))
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ignoreChanges"))
    assert(msg.contains("mix"))
  }

  test("vacuumed interim manifest + pure appends: coarse fallback still tails cleanly") {
    val root = tmp("span_vac")
    val ck = ckpt()
    Snapshots.commit(spark.range(0, 5).select($"id"), root)
    val out = Files.createTempDirectory("span_vac_out").toString
    val q1 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    Snapshots.commit(spark.range(5, 10).select($"id"), root, append = true)
    Snapshots.commit(spark.range(10, 15).select($"id"), root, append = true)
    dropManifest(root, 2) // interim gone; base v1 + head v3 retained
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(out).as[Long].collect().toSet === (0L until 15L).toSet)
    assert(spark.read.parquet(out).count() === 15)
  }

  test("vacuumed interim manifest + compaction in span: coarse check refuses (cannot prove)") {
    val root = tmp("span_vac2")
    val ck = ckpt()
    Snapshots.commit(spark.range(0, 10).select($"id"), root, statsCols = Seq("id"))
    val out = Files.createTempDirectory("span_vacg_out").toString
    val q1 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    Snapshots.compact(spark, root, targetFiles = 1, statsCols = Seq("id")) // v2, optimize
    Snapshots.commit(spark.range(10, 15).select($"id"), root,
      append = true, statsCols = Seq("id")) // v3
    dropManifest(root, 2) // the PROOF (per-commit optimize classification) is gone
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ignoreChanges"))
    assert(msg.contains("vacuumed"))
  }

  test("drop-only commit (full-kill delete): empty delta, no replay, no error") {
    // round 19 (r17 carry): a retention/full-kill delete commits files
    // REMOVED and none added. Nothing was rewritten, so the tail
    // represents the delete by omission — the live stream must plan an
    // EMPTY delta (no SpanNotAppendOnly, no re-emit) and keep tailing
    // appends that land after the kill.
    val root = tmp("span_drop")
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(2), root,
      statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("memory").queryName("span_drop")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable() // consumed v1: its files are now pre-span
      Snapshots.deleteWhere(spark, root, $"id" < 1000L) // every row matches
      // the delete must be the drop-only shape: no files, no new shards
      val m2 = Snapshots.manifest(spark, root, 2)
      assert(m2.files.isEmpty, "full-kill must drop every file")
      q.processAllAvailable() // spans the drop commit: empty delta
      assert(spark.table("span_drop").count() === 10, "no replay, no retract")
      Snapshots.commit(spark.range(100, 105).select($"id"), root,
        append = true, statsCols = Seq("id"))
      q.processAllAvailable() // the tail survives the kill and keeps going
      assert(spark.table("span_drop").as[Long].collect().toSet ===
        ((0L until 10L) ++ (100L until 105L)).toSet)
    } finally q.stop()
  }

  test("drop-only commit with ignoreChanges: same empty delta") {
    val root = tmp("span_drop_ic")
    Snapshots.commit(spark.range(0, 8).select($"id").repartition(2), root,
      statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("span_drop_ic")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      Snapshots.deleteWhere(spark, root, $"id" < 1000L)
      q.processAllAvailable()
      assert(spark.table("span_drop_ic").count() === 8)
    } finally q.stop()
  }

  test("byte pacing spans a drop-only commit: fast path falls back, stream completes") {
    // the append-only byte-pacing arithmetic (new-shards-only delta)
    // cannot describe a commit that REPLACES shards with nothing — it
    // must fall back to the full-manifest diff (zero added bytes) and
    // keep admitting versions past the kill
    val root = tmp("span_drop_pace")
    Snapshots.commit(spark.range(0, 10).select($"id").repartition(2), root,
      statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt).option("root", root)
      .option("maxBytesPerTrigger", "1").load() // one version per trigger
      .writeStream.format("memory").queryName("span_drop_pace")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      Snapshots.deleteWhere(spark, root, $"id" < 1000L) // v2: drop-only
      Snapshots.commit(spark.range(20, 30).select($"id"), root,
        append = true, statsCols = Seq("id")) // v3
      q.processAllAvailable()
      assert(spark.table("span_drop_pace").as[Long].collect().toSet ===
        ((0L until 10L) ++ (20L until 30L)).toSet)
    } finally q.stop()
  }

  test("drop-only net span across a vacuumed interim: coarse check tails cleanly") {
    val root = tmp("span_drop_vac")
    val ck = ckpt()
    // repartition: a zero-row part file records no stats, cannot
    // full-accept, and would SURVIVE the delete (classified keep) —
    // making the net span removal+add instead of drop-only
    Snapshots.commit(spark.range(0, 6).select($"id").repartition(2), root,
      statsCols = Seq("id"))
    val out = Files.createTempDirectory("span_dropvac_out").toString
    val q1 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    Snapshots.commit(spark.range(6, 9).select($"id").repartition(2), root,
      append = true, statsCols = Seq("id")) // v2
    Snapshots.deleteWhere(spark, root, $"id" >= 0L) // v3: drops everything
    dropManifest(root, 2) // per-commit proof gone; net view = drop-only
    val q2 = spark.readStream.format(Fmt).option("root", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try { q2.processAllAvailable() } finally q2.stop()
    // the in-span append (6..8) was deleted before consumption: omitted
    assert(spark.read.parquet(out).as[Long].collect().toSet === (0L until 6L).toSet)
  }
}
