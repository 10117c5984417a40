package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Merge-on-read DELETION VECTORS ([[Snapshots.deleteWhere]] /
  * [[Snapshots.materializeDvs]]): a predicate delete that records row
  * POSITIONS instead of rewriting files, applied by every read path.
  * The pins here are the contract:
  *  - result ≡ the copy-on-write delete (and plain filter) exactly;
  *  - data files are byte-untouched by a vectored delete (that's the point);
  *  - vectors accumulate across deletes (bitmap OR), re-deleting no-ops;
  *  - the fraction cap flips a heavy delete to copy-on-write;
  *  - metadata aggregates stay exact (rowCount subtracts, countWhere
  *    scans vectored files, statsRange declines);
  *  - CDC (signedDelta/changes) surfaces vectored rows with no file diff;
  *  - compaction/materialization retires vectors with identical content;
  *  - time travel and restore see/resurrect the pre-delete rows.
  */
class DvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("dv").toString + "/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  private def dataFiles(root: String): Map[String, Long] = {
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    m.files.map { u =>
      val p = new org.apache.hadoop.fs.Path(u)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      u -> f.getFileStatus(p).getModificationTime
    }.toMap
  }

  test("deleteWhere(mergeOnRead) equals the filter — without touching data files") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 1000).select($"id", ($"id" % 7).as("bucket"))
        .repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    val before = dataFiles(root)
    val v2 = Snapshots.deleteWhere(spark, root, col("id") % 10 === 3)
    assert(v2 === 2L)
    // exactness: identical to filtering the original relation
    assert(ids(Snapshots.read(spark, root)) ===
      (0L until 1000L).filterNot(_ % 10 == 3).toSet)
    // merge-on-read: the SAME files, byte-untouched
    assert(dataFiles(root) === before,
      "a vectored delete must not rewrite or add data files")
    // time travel still sees the deleted rows
    assert(ids(Snapshots.read(spark, root, 1)) === (0L until 1000L).toSet)
  }

  test("vectors accumulate across deletes; a matching-nothing delete no-ops") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 500).select($"id"), root, statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root, col("id") < 100)
    val v = Snapshots.deleteWhere(spark, root, col("id") >= 450)
    assert(ids(Snapshots.read(spark, root)) === (100L until 450L).toSet)
    // re-issuing either predicate finds nothing new: true no-op, no version
    assert(Snapshots.deleteWhere(spark, root, col("id") < 100) === v)
    assert(Snapshots.headVersion(spark, root) === v)
    // null-evaluating rows stay (SQL DELETE semantics): predicate over a
    // column with nulls deletes only TRUE rows
    val root2 = tmp()
    Snapshots.commit(
      Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("id", "x"), root2)
    Snapshots.deleteWhere(spark, root2, col("x") > 2.0)
    assert(ids(Snapshots.read(spark, root2)) === Set(1L, 2L))
  }

  test("fraction cap flips to copy-on-write; mergeOnRead=false forces it") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).select($"id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    val before = dataFiles(root).keySet
    // delete 90% of the first file's range: over the 0.5 default cap — the
    // touched file must REWRITE (CoW), others untouched
    Snapshots.deleteWhere(spark, root, col("id") < 90)
    val after = dataFiles(root).keySet
    assert(ids(Snapshots.read(spark, root)) === (90L until 400L).toSet)
    assert(after !== before, "a past-cap delete must rewrite the touched file")
    assert(before.intersect(after).size >= 2, "untouched files must carry by reference")
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.dvs.isEmpty, "past-cap delete must leave no vector behind")

    // mergeOnRead=false: pure CoW even for a tiny delete — the ONE touched
    // file rewrites (no vector left), the untouched files carry
    val root2 = tmp()
    Snapshots.commit(spark.range(0, 100).select($"id"), root2, statsCols = Seq("id"))
    val b2 = dataFiles(root2).keySet
    Snapshots.deleteWhere(spark, root2, col("id") === 5, mergeOnRead = false)
    assert(ids(Snapshots.read(spark, root2)) === (0L until 100L).toSet - 5L)
    val a2 = dataFiles(root2).keySet
    assert(b2.intersect(a2).size === b2.size - 1,
      "CoW must rewrite exactly the touched file")
    assert(Snapshots.manifest(spark, root2,
      Snapshots.headVersion(spark, root2)).dvs.isEmpty)
  }

  test("metadata aggregates stay exact under vectors") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 1000).select($"id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    assert(Snapshots.rowCount(spark, root) === Some(1000L))
    assert(Snapshots.statsRange(spark, root, "id") === Some((0.0, 999.0)))
    Snapshots.deleteWhere(spark, root, col("id") % 5 === 0)
    // rowCount subtracts the vectors' cardinality — still metadata-only
    assert(Snapshots.rowCount(spark, root) === Some(800L))
    // countWhere: vectored files scan (with vectors applied) — exact
    assert(Snapshots.countWhere(spark, root, col("id") < 500) === 400L)
    assert(Snapshots.countWhere(spark, root, col("id") >= 0) === 800L)
    // statsRange: the deleted rows might have been the extremes — declines
    assert(Snapshots.statsRange(spark, root, "id") === None)
    // readWhere / readRange / readForKeys all apply vectors
    assert(ids(Snapshots.readWhere(spark, root, col("id") < 20)) ===
      (0L until 20L).filterNot(_ % 5 == 0).toSet)
    assert(ids(Snapshots.readRange(spark, root, "id", 0, 19)) ===
      (0L until 20L).filterNot(_ % 5 == 0).toSet)
    assert(ids(Snapshots.readForKeys(spark, root, "id",
      Seq(10L, 11L, 12L).toDF("id"))) === Set(11L, 12L))
  }

  test("CDC: a vectored delete surfaces as -1 rows with no file diff; restore resurrects as +1") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 100).select($"id"), root, statsCols = Seq("id"))
    val v2 = Snapshots.deleteWhere(spark, root, col("id") >= 97)
    val (added, removed) = Snapshots.diffFiles(spark, root, 1, v2)
    assert(added.isEmpty && removed.isEmpty, "a vectored delete is metadata-only")
    val delta = Snapshots.signedDelta(spark, root, 1, v2)
      .select($"id", $"_sign").as[(Long, Int)].collect().toSet
    assert(delta === Set((97L, -1), (98L, -1), (99L, -1)))
    val ch = Snapshots.changes(spark, root, 1, v2)
      .select($"id", $"_op").as[(Long, String)].collect().toSet
    assert(ch === Set((97L, "D"), (98L, "D"), (99L, "D")))
    // restore to v1: rows come back; CDC across the restore is the inverse
    val v3 = Snapshots.restore(spark, root, 1)
    assert(ids(Snapshots.read(spark, root)) === (0L until 100L).toSet)
    val back = Snapshots.signedDelta(spark, root, v2, v3)
      .select($"id", $"_sign").as[(Long, Int)].collect().toSet
    assert(back === Set((97L, 1), (98L, 1), (99L, 1)))
  }

  test("materializeDvs rewrites only vectored files; compaction also clears vectors") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).select($"id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root, col("id") % 100 < 5)
    val expect = (0L until 400L).filterNot(_ % 100 < 5).toSet
    val beforeFiles = dataFiles(root).keySet
    val v = Snapshots.materializeDvs(spark, root, statsCols = Seq("id"))
    assert(v === 3L)
    val m = Snapshots.manifest(spark, root, v)
    assert(m.dvs.isEmpty, "materialization must retire every vector")
    assert(ids(Snapshots.read(spark, root)) === expect)
    assert(Snapshots.statsRange(spark, root, "id") === Some((5.0, 399.0)))
    // only vectored files rewrote — here all 4 ranges were hit, so check
    // the no-op path instead: a second materialization has nothing to do
    assert(Snapshots.materializeDvs(spark, root) === v)

    // selective: vector only one file's range, others carry by reference
    val root2 = tmp()
    Snapshots.commit(
      spark.range(0, 400).select($"id").repartitionByRange(4, $"id"),
      root2, statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root2, col("id") === 7)
    val b2 = dataFiles(root2).keySet
    Snapshots.materializeDvs(spark, root2, statsCols = Seq("id"))
    val a2 = dataFiles(root2).keySet
    assert(b2.intersect(a2).size === b2.size - 1,
      "exactly the one vectored file must rewrite")
    assert(ids(Snapshots.read(spark, root2)) === (0L until 400L).toSet - 7L)

    // compact() reads vectors-applied and rewrites clean
    val root3 = tmp()
    Snapshots.commit(spark.range(0, 100).select($"id"), root3)
    Snapshots.deleteWhere(spark, root3, col("id") < 10)
    Snapshots.compact(spark, root3, targetFiles = 1, statsCols = Seq("id"))
    val m3 = Snapshots.manifest(spark, root3, Snapshots.headVersion(spark, root3))
    assert(m3.dvs.isEmpty)
    assert(ids(Snapshots.read(spark, root3)) === (10L until 100L).toSet)
    assert(Snapshots.rowCount(spark, root3) === Some(90L))
  }

  test("vectors survive merge/append around them; a rewrite retires the touched file's vector") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).select($"id", lit("old").as("s")).repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    // vector rows in the FIRST file's range (0..99) and the LAST's (300..399)
    Snapshots.deleteWhere(spark, root, col("id").isin(3L, 397L))
    // key-merge touching only the last file's range: its vector retires
    // with the file; the first file's vector must survive the commit
    Snapshots.merge(Seq((390L, "new")).toDF("id", "s"), root, "id",
      statsCols = Seq("id"))
    val got = Snapshots.read(spark, root)
      .select($"id", $"s").as[(Long, String)].collect().toMap
    assert(!got.contains(3L), "untouched file's vector must survive a merge elsewhere")
    assert(!got.contains(397L), "rewritten file's survivors had the vector applied")
    assert(got(390L) === "new")
    assert(got.size === 398L)
    // append beside the vectors: still applied
    Snapshots.commit(Seq((1000L, "x")).toDF("id", "s"), root, append = true)
    assert(Snapshots.read(spark, root).count() === 399L)
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.dvs.map(_.deleted).sum === 1L, "only the surviving vector remains")
  }

  test("keyed delete(mergeOnRead) vectors the key set without touching data files") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 1000).select($"id", ($"id" % 3).as("g"))
        .repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    val before = dataFiles(root)
    // scattered GDPR-style key set: stats-pruned probe, positions vectored
    val keys = Seq(5L, 250L, 251L, 999L).toDF("id")
    val v2 = Snapshots.delete(keys, root, "id", statsCols = Seq("id"),
      mergeOnRead = true)
    assert(v2 === 2L)
    assert(ids(Snapshots.read(spark, root)) ===
      (0L until 1000L).toSet -- Set(5L, 250L, 251L, 999L))
    assert(dataFiles(root) === before,
      "a vectored keyed delete must not rewrite or add data files")
    // replayed key set: nothing new to mark, true no-op
    assert(Snapshots.delete(keys, root, "id", mergeOnRead = true) === v2)
    // rowCount subtracts; a later CoW keyed delete still composes
    assert(Snapshots.rowCount(spark, root) === Some(996L))
    Snapshots.delete(Seq(7L).toDF("id"), root, "id", statsCols = Seq("id"))
    assert(ids(Snapshots.read(spark, root)) ===
      (0L until 1000L).toSet -- Set(5L, 7L, 250L, 251L, 999L))
  }

  test("time-based vacuum: versions older than the cutoff go, head always stays") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 10).select($"id"), root)
    Snapshots.commit(spark.range(10, 20).select($"id"), root, append = true)
    val midpoint = System.currentTimeMillis()
    Thread.sleep(20)
    Snapshots.commit(spark.range(20, 30).select($"id"), root, append = true)
    Snapshots.vacuumBefore(spark, root, midpoint)
    // v1/v2 published before the cutoff: gone; v3 (head) retained
    assert(Snapshots.history(spark, root).map(_.version) === Seq(3L))
    assert(ids(Snapshots.read(spark, root)) === (0L until 30L).toSet)
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 1) }
    // a cutoff beyond every version still keeps the head
    Snapshots.vacuumBefore(spark, root, System.currentTimeMillis() + 3600000L)
    assert(Snapshots.history(spark, root).map(_.version) === Seq(3L))
    assert(ids(Snapshots.read(spark, root)) === (0L until 30L).toSet)
  }

  test("compactWhere rewrites only the predicate's files, preserving all content") {
    val root = tmp()
    // 4 range files; many tiny appends land in the 0..99 band
    Snapshots.commit(
      spark.range(0, 400).select($"id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    (0 until 5).foreach { i =>
      Snapshots.commit(spark.range(1000L + i, 1001L + i).select($"id"),
        root, append = true, statsCols = Seq("id"))
    }
    val before = dataFiles(root).keySet
    // compact the small-file band: the 4 original range files are outside
    // the predicate... only files that CAN hold id >= 1000 rewrite
    val v = Snapshots.compactWhere(spark, root, col("id") >= 1000,
      targetFiles = 1, statsCols = Seq("id"))
    val after = dataFiles(root).keySet
    assert(ids(Snapshots.read(spark, root)) ===
      ((0L until 400L) ++ (1000L until 1005L)).toSet)
    assert(before.intersect(after).size === 4,
      "the four out-of-band range files must carry by reference")
    assert(after.size === 5, "the five appended files must consolidate to one")
    // a matching-nothing predicate is a true no-op
    assert(Snapshots.compactWhere(spark, root, col("id") > 1e9) === v)
    // vectors on selected files materialize through the rewrite
    Snapshots.deleteWhere(spark, root, col("id") === 1002)
    Snapshots.compactWhere(spark, root, col("id") >= 1000, targetFiles = 1,
      statsCols = Seq("id"))
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.dvs.isEmpty)
    assert(ids(Snapshots.read(spark, root)) ===
      ((0L until 400L) ++ Seq(1000L, 1001L, 1003L, 1004L)).toSet)
  }

  test("row-group pruning applies under deletion vectors with exact positions") {
    // round 15: a DV'd file used to zero out row-group filters wholesale
    // (vectors address file-global ordinals a skipped group would shift);
    // the reader now requests the parquet row-index column, so a point
    // predicate decodes a FRACTION of a DV'd multi-row-group file while
    // every delete still lands on its true position
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", (1 << 15).toString) // many tiny row groups
    try {
      Snapshots.commit(
        spark.range(0, 60000).select($"id", ($"id" % 7).as("bucket"))
          .coalesce(1).sortWithinPartitions("id"),
        root, statsCols = Seq("id"))
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    val m1 = Snapshots.manifest(spark, root, 1L)
    assert(m1.files.size === 1)
    val rowGroups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(m1.files.head), hc)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRowGroups.size finally r.close()
    }
    assert(rowGroups > 4, s"need several row groups, got $rowGroups")
    // vector out a band that includes rows INSIDE the probed range
    Snapshots.deleteWhere(spark, root, col("id") % 100 === 7)
    val m2 = Snapshots.manifest(spark, root, 2L)
    assert(m2.dvs.nonEmpty, "the delete must land as a vector")
    // DSv2 point-range read: decoded rows must be a fraction of the file
    val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
      .option("root", root).load()
      .filter($"id" >= 1000L && $"id" < 3000L)
    // collect q ITSELF (not a derived projection) so the metrics below
    // read the same executed plan
    val got = q.collect().map(_.getLong(0)).toSet
    val expected = (1000L until 3000L).filterNot(_ % 100 == 7).toSet
    assert(got === expected, "deletes must land on their true positions")
    val decoded = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.metrics("numOutputRows").value
    }.sum
    assert(decoded > 0 && decoded < 30000,
      s"point range must skip row groups in the DV'd file (decoded $decoded of 60000)")
  }

  test("a DV'd large file splits into byte ranges: rows exactly once, deletes applied") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "65536") // small row groups: sub-splits carry rows
    try {
      Snapshots.commit(
        spark.range(1, 100001).select($"id", md5($"id".cast("string")).as("s"))
          .repartition(1),
        root, statsCols = Seq("id"))
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    assert(Snapshots.manifest(spark, root, 1L).files.size === 1)
    // deletes spread across the whole file: every byte range hits some
    Snapshots.deleteWhere(spark, root, col("id") % 10 === 3)
    val oldMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    try {
      def dsv2(): org.apache.spark.sql.DataFrame = spark.read
        .format("graft.streaming.SnapshotSourceProvider").option("root", root).load()
      val q = dsv2()
      val parts = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
      }.sum
      assert(parts > 1, s"a DV'd large file must split into byte ranges, got $parts")
      // every live row exactly once, every deleted row absent — the
      // row-index ordinals are file-global in every range
      assert(ids(q) === (1L to 100000L).filterNot(_ % 10 == 3).toSet)
      // point reads through the split + row-group-filtered path stay exact
      assert(ids(dsv2().filter(col("id") === 42L)) === Set(42L))
      assert(ids(dsv2().filter(col("id") === 43L)) === Set.empty[Long])
    } finally oldMax.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
      spark.conf.set("spark.sql.files.maxPartitionBytes", _))
  }

  test("a DV'd flat table stays COLUMNAR: filtered batches, every type exact") {
    val root = tmp()
    def shaped(df: org.apache.spark.sql.Dataset[java.lang.Long]) = df.select(
      $"id",
      ($"id" % 97).cast("int").as("i"),
      ($"id" % 2 === 0).as("flag"),
      md5($"id".cast("string")).as("s"),
      to_binary(md5($"id".cast("string")), lit("hex")).as("bin"),
      ($"id" * 3).cast("decimal(12,2)").as("dec"),
      when($"id" % 11 === 0, lit(null)).otherwise($"id".cast("double")).as("d"),
      timestamp_seconds($"id").as("ts"))
    Snapshots.commit(shaped(spark.range(0, 20000).as[java.lang.Long]).repartition(2), root,
      statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root, $"id" % 10 === 3)
    def dsv2(): org.apache.spark.sql.DataFrame = spark.read
      .format("graft.streaming.SnapshotSourceProvider").option("root", root).load()
    val q = dsv2()
    q.collect()
    // the scan must stay on the columnar path (ColumnarToRow above it),
    // DV notwithstanding — one delete must not cost the table codegen
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"DV'd flat scan must stay columnar:\n${q.queryExecution.executedPlan}")
    // survivor copy-out is type-exact for every flat type incl. nulls
    val expected = shaped(spark.range(0, 20000).as[java.lang.Long]).filter(!($"id" % 10 === 3))
    assert(q.exceptAll(expected).count() === 0L)
    assert(expected.exceptAll(dsv2()).count() === 0L)
    assert(dsv2().count() === 18000L)
    // nested schemas keep the row path (no columnar copy for arrays) and
    // stay row-exact
    val root2 = tmp()
    Snapshots.commit(
      spark.range(0, 100).select($"id", array($"id", -$"id").as("arr")), root2)
    Snapshots.deleteWhere(spark, root2, $"id" < 10)
    val q2 = spark.read.format("graft.streaming.SnapshotSourceProvider")
      .option("root", root2).load()
    q2.collect()
    assert(!q2.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a nested DV'd schema must fall back to the row path")
    assert(ids(q2) === (10L until 100L).toSet)
    assert(q2.select(expr("arr[1]")).as[Long].collect().toSet ===
      (10L until 100L).map(-_).toSet)
  }

  test("deleteWhere prunes the probe scan through the stats index") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 1000).select($"id").repartitionByRange(5, $"id"),
      root, statsCols = Seq("id"))
    // predicate confined to one file's range: only that file may scan.
    // Indirect pin: the delete still lands exactly, and the untouched
    // files' shard entries carry by reference (same shard names).
    val metaBefore = Snapshots.manifestMeta(spark, root, 1L).shardRefs.toSet
    Snapshots.deleteWhere(spark, root, col("id") === 42)
    assert(ids(Snapshots.read(spark, root)) === (0L until 1000L).toSet - 42L)
    val metaAfter = Snapshots.manifestMeta(spark, root, 2L).shardRefs.toSet
    // the single batch shard got rewritten (vector added) — ref differs;
    // content equality of the untouched portion is covered above
    assert(metaBefore !== metaAfter)
  }
}
