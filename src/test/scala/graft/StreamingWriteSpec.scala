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

  test("epoch commits learn indexed columns from the head record, O(1) per trigger") {
    val root = tmp("swr_idx")
    // batch-committed head declares its stats/bloom columns in the RECORD
    Snapshots.commit((1L to 500L).map(i => (i, s"s$i")).toDF("k", "s"),
      root, statsCols = Seq("k"), bloomCols = Seq("s"))
    val head1 = Snapshots.manifestMeta(spark, root, 1L)
    assert(head1.indexed === Some((Seq("k"), Seq("s"))),
      "a commit must declare its indexed physical columns in the manifest record")
    // a streamed epoch indexes its files under the declared columns —
    // straight from the head meta, no shard resolve
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "s").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    try { in.addData((501L, "x501")); q.processAllAvailable() } finally q.stop()
    val m2 = Snapshots.manifest(spark, root, 2L)
    val newFiles = (m2.files.toSet -- Snapshots.manifest(spark, root, 1L).files.toSet)
      .map(u => new org.apache.hadoop.fs.Path(u).getName)
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f => m2.stats.exists(st => st.file == f && st.col == "k")),
      "epoch files must be stats-indexed under the declared column")
    assert(newFiles.forall(f => m2.blooms.exists(b => b.file == f && b.col == "s")),
      "epoch files must be bloom-indexed under the declared column")
    assert(Snapshots.manifestMeta(spark, root, 2L).indexed
      === Some((Seq("k"), Seq("s"))), "the declaration must carry")
    // the epoch's files also carry PARQUET-INTERNAL blooms on the declared
    // column (row-group pruning inside the file, not just file pruning)
    val epochFile = m2.files.find(u =>
      newFiles.contains(new org.apache.hadoop.fs.Path(u).getName)).get
    val pf = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(epochFile),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = pf.getRowGroups.get(0).getColumns
      val sCol = (0 until cols.size).map(cols.get)
        .find(_.getPath.toDotString == "s").get
      assert(sCol.getBloomFilterOffset >= 0,
        "streamed epoch files must write parquet blooms on declared columns")
    } finally pf.close()
    // declaration round-trips the manifest text (render/parse symmetry)
    val reparsed = Snapshots.manifestMeta(spark, root, 2L)
    assert(reparsed.indexed === Some((Seq("k"), Seq("s"))))
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

  test("streaming keyed upsert: every trigger boundary equals the batch merge") {
    val root = tmp("swr_up")
    // seed a keyed table
    Snapshots.commit((1L to 100L).map(i => (i, s"v$i", 0L)).toDF("k", "v", "gen"),
      root, statsCols = Seq("k"))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("k", "v", "gen").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("statsCols", "k")
      .option("checkpointLocation", ckpt()).start()
    def table() = spark.read.format(Fmt).option("root", root).load()
      .as[(Long, String, Long)].collect().toSet
    try {
      // trigger 1: update existing keys + insert new ones
      in.addData((5L, "up5", 1L), (6L, "up6", 1L), (200L, "new200", 1L))
      q.processAllAvailable()
      val expected1 = (1L to 100L).map(i =>
        if (i == 5L) (5L, "up5", 1L) else if (i == 6L) (6L, "up6", 1L)
        else (i, s"v$i", 0L)).toSet + ((200L, "new200", 1L))
      assert(table() === expected1, "after trigger 1 the table must equal the batch merge")
      // trigger 2: second generation over some of the same keys
      in.addData((5L, "up5b", 2L), (300L, "new300", 2L))
      q.processAllAvailable()
      val expected2 = expected1.filterNot(_._1 == 5L) +
        ((5L, "up5b", 2L)) + ((300L, "new300", 2L))
      assert(table() === expected2, "after trigger 2 the table must equal the batch merge")
      // the merges carried untouched files by reference, never the table:
      // head history = seed + 2 merge commits, each epoch-tagged
      val metas = Snapshots.historyMeta(spark, root)
      assert(metas.count(_.tag.startsWith("stream-")) === 2)
    } finally q.stop()
  }

  test("streaming keyed upsert replays exactly-once across a kill/restart") {
    val root = tmp("swr_upr")
    val ck = ckpt()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root,
      statsCols = Seq("k"))
    implicit val sq = spark.sqlContext
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("k", "v").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("checkpointLocation", ck).start()
    try { in1.addData((1L, "a2"), (3L, "c")); q1.processAllAvailable() }
    finally q1.stop()
    val afterFirst = spark.read.format(Fmt).option("root", root).load()
      .as[(Long, String)].collect().toSet
    assert(afterFirst === Set((1L, "a2"), (2L, "b"), (3L, "c")))
    // second incarnation replays epoch 0 with the same rows: the retained
    // tag must make the merge a no-op (no double-apply, no version mint)
    val vBefore = Snapshots.headVersion(spark, root)
    val in2 = MemoryStream[(Long, String)]
    in2.addData((1L, "a2"), (3L, "c"))
    val q2 = in2.toDF().toDF("k", "v").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("checkpointLocation", ck).start()
    try {
      q2.processAllAvailable()
      assert(Snapshots.headVersion(spark, root) === vBefore,
        "a replayed upsert epoch must publish nothing")
      in2.addData((2L, "b2"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.format(Fmt).option("root", root).load()
      .as[(Long, String)].collect().toSet
      === Set((1L, "a2"), (2L, "b2"), (3L, "c")))
  }

  test("intra-epoch duplicate keys refuse loudly without upsertOrder") {
    // a CDC feed batching two events for one key in ONE trigger would land
    // BOTH rows (merge replaces head rows but appends every staged row),
    // silently breaking the keyed-table invariant — it must refuse instead
    val root = tmp("swr_dup")
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), root, statsCols = Seq("k"))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("checkpointLocation", ckpt()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      in.addData((5L, "first"), (5L, "second"))
      q.processAllAvailable()
    }
    q.stop()
    def deepMsg(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + deepMsg(t.getCause)
    assert(deepMsg(e).contains("duplicate key"))
    // the failed epoch published nothing and left no staged debris: every
    // parquet under data/ is referenced by the (unchanged) head manifest
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet
      === Set((1L, "a")))
    val dataDir = new org.apache.hadoop.fs.Path(root.stripPrefix("file:") + "/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(dataDir, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getPath.getName }
      b.result().toSet
    }
    val referenced = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files
      .map(u => new org.apache.hadoop.fs.Path(u).getName).toSet
    assert(onDisk === referenced,
      s"aborted upsert epoch left staged debris: ${onDisk -- referenced}")
  }

  test("upsertOrder folds intra-epoch duplicates last-wins; order ties refuse") {
    val root = tmp("swr_ord")
    Snapshots.commit(Seq((1L, "a", 0L)).toDF("k", "v", "seq"), root,
      statsCols = Seq("k"))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("k", "v", "seq").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("upsertOrder", "seq")
      .option("checkpointLocation", ckpt()).start()
    try {
      // two events for key 5 in one trigger: the seq=2 row must win
      in.addData((5L, "first", 1L), (5L, "second", 2L), (7L, "only", 1L))
      q.processAllAvailable()
      assert(spark.read.format(Fmt).option("root", root).load()
        .as[(Long, String, Long)].collect().toSet
        === Set((1L, "a", 0L), (5L, "second", 2L), (7L, "only", 1L)))
    } finally q.stop()
    // a tie on the max order value is ambiguous last-wins: refuse
    val in2 = MemoryStream[(Long, String, Long)]
    val q2 = in2.toDF().toDF("k", "v", "seq").writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "k")
      .option("upsertOrder", "seq")
      .option("checkpointLocation", ckpt()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      in2.addData((9L, "x", 3L), (9L, "y", 3L))
      q2.processAllAvailable()
    }
    q2.stop()
    def deepMsg(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + deepMsg(t.getCause)
    assert(deepMsg(e).contains("TIE"))
  }

  test("indexed declaration survives bracket characters in column names") {
    // the 'indexed' manifest field was parsed with a non-greedy bracket
    // regex: a physical name containing ']' terminated the capture early,
    // silently mis-declaring the indexed columns for every later epoch
    val root = tmp("swr_br")
    Snapshots.commit((1L to 50L).map(i => (i, i * 2)).toDF("k]x", "v"),
      root, statsCols = Seq("k]x"))
    assert(Snapshots.manifestMeta(spark, root, 1L).indexed
      === Some((Seq("k]x"), Seq.empty)),
      "commit must declare the bracket-bearing column intact")
    // a streamed epoch learns the declaration from the head RECORD — a
    // truncated parse would stats-index the wrong column from here on
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k]x", "v").writeStream.format(Fmt)
      .option("root", root).option("checkpointLocation", ckpt()).start()
    try { in.addData((51L, 102L)); q.processAllAvailable() } finally q.stop()
    val m2 = Snapshots.manifest(spark, root, 2L)
    val newFiles = (m2.files.toSet --
      Snapshots.manifest(spark, root, 1L).files.toSet)
      .map(u => new org.apache.hadoop.fs.Path(u).getName)
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f => m2.stats.exists(st => st.file == f && st.col == "k]x")),
      "epoch files must be stats-indexed under the bracket-bearing column")
    assert(Snapshots.manifestMeta(spark, root, 2L).indexed
      === Some((Seq("k]x"), Seq.empty)))
  }

  test("update-mode streaming aggregate maintains a keyed table through upsert") {
    val root = tmp("swr_agg")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    // update-mode word-count: each trigger emits only the CHANGED keys;
    // the upsert write applies them as a keyed merge — the table IS the
    // aggregate, incrementally maintained
    val counts = in.toDF().toDF("w", "n")
      .groupBy("w").agg(sum("n").as("total"))
    val q = counts.writeStream.format(Fmt)
      .option("root", root).option("upsertKey", "w")
      .option("checkpointLocation", ckpt())
      .outputMode("update").start()
    try {
      in.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      in.addData(("a", 10L), ("c", 5L))
      q.processAllAvailable()
    } finally q.stop()
    val t = spark.read.format(Fmt).option("root", root).load()
      .as[(String, Long)].collect().toSet
    assert(t === Set(("a", 11L), ("b", 2L), ("c", 5L)),
      "the upserted table must equal the full aggregate")
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
    // catalog-addressed streaming UPSERT: the upsertKey writer option
    // survives the catalog's property merge — toTable CDC-applies
    val in3 = MemoryStream[(Long, String)]
    val q3 = in3.toDF().toDF("k", "s").writeStream
      .option("checkpointLocation", ckpt())
      .option("upsertKey", "k")
      .toTable(s"graft.`$sink`")
    try {
      in3.addData((5L, "e2"), (9L, "i"))
      q3.processAllAvailable()
      assert(spark.table(s"graft.`$sink`").as[(Long, String)].collect().toSet
        === Set((0L, "z"), (5L, "e2"), (9L, "i")),
        "toTable with upsertKey must merge, not append")
    } finally q3.stop()
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
