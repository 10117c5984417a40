package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.{Branches, Snapshots}
import graft.operators.Expect

/** Audited streaming ingest: the row-level quality gate (clean rows land,
  * violations quarantine) and the branch-staged write-audit-publish sink
  * (whole batches publish or quarantine atomically).
  */
class GatedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("gated").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("id", "s").as[(Long, String)].collect().toSet

  private val gate = Seq(
    Expect.Rule("s_not_null", col("s").isNotNull),
    Expect.Rule("id_positive", col("id") > 0L))

  test("startGated: clean rows commit, violations quarantine with rule names") {
    val base = tmp()
    val root = s"$base/t"
    val quar = s"$base/q"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.SnapshotSink.startGated(
      input.toDF().toDF("id", "s"), root, quar, s"$base/ckpt", gate,
      statsCols = Seq("id"))
    try {
      input.addData((1L, "a"), (-5L, "neg"), (2L, null.asInstanceOf[String]))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (3L, "c")))
    // quarantine holds the violators, annotated with WHICH rule failed
    val held = Snapshots.read(spark, quar)
      .select($"id", concat_ws(",", $"_failed").as("why"))
      .as[(Long, String)].collect().toMap
    assert(held === Map(-5L -> "id_positive", 2L -> "s_not_null"))
    // batch alignment on main; quarantine committed only for batch 0
    assert(Snapshots.history(spark, root).map(_.tag) === Seq("batch-0", "batch-1"))
    assert(Snapshots.history(spark, quar).map(_.tag) === Seq("batch-0"))

    // replayed trigger no-ops on both tables
    assert(Snapshots.commitIfAbsent(Seq((9L, "x")).toDF("id", "s"), root,
      tag = "batch-1").isEmpty)
    assert(Snapshots.commitIfAbsent(Seq((9L, "x")).toDF("id", "s"), quar,
      tag = "batch-0").isEmpty)
  }

  test("startCdcApply: upsert/delete feed folds by latest-op-per-key, replay-fenced") {
    val base = tmp()
    val root = s"$base/t"
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root,
      statsCols = Seq("id"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val q = graft.streaming.SnapshotSink.startCdcApply(
      input.toDF().toDF("id", "s", "op", "seq"), root, "id", "op", "seq",
      s"$base/ckpt", statsCols = Seq("id"))
    try {
      // update 2, insert 3, delete 1, delete a key that never existed
      input.addData((2L, "B", "U", 1L), (3L, "c", "U", 2L),
        (1L, "", "D", 3L), (9L, "", "D", 4L))
      q.processAllAvailable()
      // within one trigger the key flips twice: the LATEST op wins
      input.addData((4L, "first", "U", 1L), (4L, "last", "U", 5L))
      q.processAllAvailable()
    } finally q.stop()

    assert(rows(Snapshots.read(spark, root)) ===
      Set((2L, "B"), (3L, "c"), (4L, "last")))
    val tags = Snapshots.historyMeta(spark, root).map(_.tag)
    assert(tags.count(_.startsWith("cdc-batch-")) === 2, s"tags: $tags")
    // a replayed trigger observes its tag and must no-op (the sink's gate);
    // the applied check is the same historyMeta scan the sink runs
    assert(tags.contains("cdc-batch-0") && tags.contains("cdc-batch-1"))
  }

  test("startWap: whole batches publish or quarantine; main only ever audited") {
    val base = tmp()
    val root = s"$base/t"
    val quar = s"$base/q"
    Snapshots.commit(Seq((1L, "seed")).toDF("id", "s"), root,
      statsCols = Seq("id"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.SnapshotSink.startWap(
      input.toDF().toDF("id", "s"), root, quar, s"$base/ckpt", gate,
      statsCols = Seq("id"))
    try {
      input.addData((2L, "clean"))
      q.processAllAvailable()
      input.addData((3L, "ok"), (4L, null.asInstanceOf[String])) // poisons the batch
      q.processAllAvailable()
      input.addData((5L, "fine"))
      q.processAllAvailable()
    } finally q.stop()

    // batch 1 never reached main — not even its clean row (whole-batch gate)
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "seed"), (2L, "clean"), (5L, "fine")))
    assert(rows(Snapshots.read(spark, quar)) ===
      Set((3L, "ok"), (4L, null)))
    // main history carries the publish tags; no branches left behind
    val tags = Snapshots.historyMeta(spark, root).map(_.tag)
    assert(tags.count(_.startsWith("publish:batch-")) === 2, s"tags: $tags")
    assert(Branches.list(spark, root) === Seq.empty)

    // a replayed poisoned trigger is a no-op (quarantine tag fences it)
    assert(Snapshots.commitIfAbsent(Seq((9L, "x")).toDF("id", "s"), quar,
      tag = "batch-1").isEmpty)
  }

  test("startWap bootstraps an empty table instead of crash-looping") {
    val base = tmp()
    val root = s"$base/t" // NO seed commit: first trigger must self-bootstrap
    val quar = s"$base/q"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.SnapshotSink.startWap(
      input.toDF().toDF("id", "s"), root, quar, s"$base/ckpt", gate,
      statsCols = Seq("id"))
    try {
      input.addData((1L, "first"))
      q.processAllAvailable()
      input.addData((2L, null.asInstanceOf[String])) // poisoned second batch
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "first")))
    assert(rows(Snapshots.read(spark, quar)) === Set((2L, null)))
    assert(Branches.list(spark, root) === Seq.empty)
  }

  test("startChecked: the table's persisted checks gate the stream, no crash loop") {
    import graft.engine.Checks
    val base = tmp()
    val root = s"$base/t"
    val quar = s"$base/q"
    Snapshots.commit(Seq((1L, "seed")).toDF("id", "s"), root, statsCols = Seq("id"))
    Checks.add(spark, root, "s_set", "s IS NOT NULL")
    Checks.add(spark, root, "id_pos", "id > 0")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.SnapshotSink.startChecked(
      input.toDF().toDF("id", "s"), root, quar, s"$base/ckpt",
      statsCols = Seq("id"))
    try {
      // a batch a PLAIN sink would crash-loop on: write-path enforcement
      // rejects the whole commit, the trigger replays, forever — here the
      // violators split out and the stream keeps running
      input.addData((2L, "ok"), (-3L, "neg"), (4L, null.asInstanceOf[String]))
      q.processAllAvailable()
      input.addData((5L, "clean"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "seed"), (2L, "ok"), (5L, "clean")))
    val held = Snapshots.read(spark, quar)
      .select($"id", $"s", $"_failed")
      .as[(Long, String, Seq[String])].collect().toSet
    assert(held === Set((-3L, "neg", Seq("id_pos")), (4L, null, Seq("s_set"))))
    // the landed table still satisfies its invariant, auditable on demand
    assert(Checks.verify(spark, root).isEmpty)
  }

  test("startChecked replay honors the recorded split even after rules change") {
    import graft.engine.Checks
    import graft.streaming.SnapshotSink
    val base = tmp()
    val root = s"$base/t"
    val quar = s"$base/q"
    Snapshots.commit(Seq((1L, "seed")).toDF("id", "s"), root, statsCols = Seq("id"))
    Checks.add(spark, root, "id_pos", "id > 0")
    val batch = Seq((2L, "ok"), (-3L, "neg")).toDF("id", "s")

    // model the crash window exactly: the first attempt recorded its split
    // (bad row in the tagged quarantine commit) and died before the clean
    // commit reached root
    Snapshots.commitIfAbsent(
      Seq((-3L, "neg")).toDF("id", "s")
        .withColumn("_failed", array(lit("id_pos"))),
      quar, tag = "batch-7", append = true)
    assert(!Snapshots.historyMeta(spark, root).exists(_.tag == "batch-7"))

    // the operator drops the rule BETWEEN crash and replay — a drifted
    // re-gate would call -3 clean, see root's missing tag, and write it
    // to root (duplicating it against the quarantine record); worse, with
    // the tag present it would be written NOWHERE. The recorded decision
    // must win instead.
    Checks.drop(spark, root, "id_pos")
    SnapshotSink.ingestChecked(batch, 7L, root, quar)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "seed"), (2L, "ok")),
      "replay must land exactly the recorded clean rows")
    assert(rows(Snapshots.read(spark, quar)) === Set((-3L, "neg")),
      "replay must not duplicate or reclassify the recorded bad row")
    // a second replay is a full no-op on both tables
    val (hr, hq) = (Snapshots.headVersion(spark, root), Snapshots.headVersion(spark, quar))
    SnapshotSink.ingestChecked(batch, 7L, root, quar)
    assert(Snapshots.headVersion(spark, root) === hr)
    assert(Snapshots.headVersion(spark, quar) === hq)
    ()
  }
}
