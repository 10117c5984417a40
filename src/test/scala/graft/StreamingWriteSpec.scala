package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Native DSv2 STREAMING writes ([[graft.streaming.SnapshotStreamingWrite]]):
  * `df.writeStream.format(...).option("root", ...)` — one epoch = one
  * tagged append commit, exactly-once across restarts, no foreachBatch. */
class StreamingWriteSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  private def tmp(p: String): String =
    "file:" + Files.createTempDirectory(p).toString + "/t"
  private def ckpt(): String = Files.createTempDirectory("swr_ck").toString

  test("each epoch lands as one tagged append; table readable mid-stream") {
    val root = tmp("swr")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "s").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.format(Fmt).option("root", root).load().count() === 2L)
      in.addData((3L, "c"))
      q.processAllAvailable()
      val t = spark.read.format(Fmt).option("root", root).load()
      assert(t.as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      // one commit per non-empty epoch, each tagged stream-<qid>-e<epoch>
      val metas = Snapshots.historyMeta(spark, root)
      assert(metas.length === 2)
      assert(metas.forall(_.tag.startsWith("stream-")))
      assert(metas.map(_.tag).distinct.length === 2)
    } finally q.stop()
  }

  test("restart from checkpoint: a replayed epoch publishes nothing twice") {
    val root = tmp("swr_r")
    val ck = ckpt()
    implicit val sq = spark.sqlContext
    val in1 = MemoryStream[Long]
    val q1 = in1.toDF().toDF("k").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ck).start()
    try {
      in1.addData(1L, 2L, 3L)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.format(Fmt).option("root", root).load().count() === 3L)
    // second incarnation, same checkpoint: the fresh MemoryStream's first
    // batch REPLAYS the committed epoch 0 (we feed it the same rows, as a
    // real replayable source would) — its tag is already retained, so the
    // staged duplicates drop and nothing publishes twice; the next batch
    // is epoch 1 and lands normally
    val in2 = MemoryStream[Long]
    in2.addData(1L, 2L, 3L)
    val q2 = in2.toDF().toDF("k").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ck).start()
    try {
      q2.processAllAvailable()
      assert(spark.read.format(Fmt).option("root", root).load().count() === 3L,
        "the replayed epoch must publish nothing")
      in2.addData(10L, 11L)
      q2.processAllAvailable()
    } finally q2.stop()
    val t = spark.read.format(Fmt).option("root", root).load()
    assert(t.as[Long].collect().toSet === Set(1L, 2L, 3L, 10L, 11L))
    val tags = Snapshots.historyMeta(spark, root).map(_.tag)
    assert(tags.distinct.length === tags.length, s"duplicate epoch tags: $tags")
  }

  test("streamed appends ride the column mapping and never evolve schemas") {
    val root = tmp("swr_m")
    Snapshots.commit(Seq((1L, 10L)).toDF("k", "v"), root)
    Snapshots.renameColumn(spark, root, "v", "amount")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k", "amount").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    try {
      in.addData((2L, 20L))
      q.processAllAvailable()
      val t = spark.read.format(Fmt).option("root", root).load()
      assert(t.columns === Array("k", "amount"))
      assert(t.agg(sum("amount")).head().getLong(0) === 30L)
    } finally q.stop()
    // a stream introducing a new column refuses loudly at start
    val in2 = MemoryStream[(Long, Long, Long)]
    val q2 = in2.toDF().toDF("k", "amount", "extra").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      in2.addData((3L, 30L, 1L)); q2.processAllAvailable()
    }
    assert(e.getMessage.contains("extra") ||
      Option(e.getCause).exists(_.getMessage.contains("extra")))
    q2.stop()
  }

  test("readStream.table tails a catalog table; toTable streams into one") {
    val root = tmp("swr_t")
    spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), root)
    // catalog-addressed streaming READ
    val q = spark.readStream.table(s"graft.`$root`")
      .writeStream.format("memory").queryName("swr_tail")
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("swr_tail").count() === 1L)
      Snapshots.commit(Seq((2L, "b")).toDF("k", "s"), root, append = true)
      q.processAllAvailable()
      assert(spark.table("swr_tail").count() === 2L)
    } finally q.stop()
    // catalog-addressed streaming WRITE (toTable)
    implicit val sq = spark.sqlContext
    val sink = tmp("swr_t2")
    Snapshots.commit(Seq((0L, "z")).toDF("k", "s"), sink)
    val in = MemoryStream[(Long, String)]
    val q2 = in.toDF().toDF("k", "s").writeStream
      .option("checkpointLocation", ckpt())
      .toTable(s"graft.`$sink`")
    try {
      in.addData((5L, "e"))
      q2.processAllAvailable()
      assert(spark.table(s"graft.`$sink`").count() === 2L)
    } finally q2.stop()
  }

  test("streamed-in table serves SQL and time travel like any other") {
    val root = tmp("swr_q")
    spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("k").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    try {
      in.addData(1L to 100L: _*)
      q.processAllAvailable()
      in.addData(101L to 200L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`").head().getLong(0) === 200L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 100L)
  }
}
