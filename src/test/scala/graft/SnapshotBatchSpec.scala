package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** DSv2 BATCH reads of snapshot tables: a plain `spark.read.format(...)`
  * (or SQL over a temp view of it) must see the same rows as the API read
  * — deletion vectors applied, renames honored — while pushed filters
  * prune FILES through the manifest's stats/bloom/null indexes and the
  * scan reports exact manifest row counts to the optimizer.
  */
class SnapshotBatchSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  private def tmp(): String =
    "file:" + Files.createTempDirectory("snapbatch").toString + "/t"

  private def batchRead(root: String): DataFrame =
    spark.read.format(Fmt).option("root", root).load()

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  private def freshTable(): String = {
    val root = tmp()
    val df = (1L to 4000L).map(i => (i, s"name_$i", (i % 7).toDouble))
      .toDF("id", "name", "score")
    Snapshots.commit(df.repartitionByRange(8, col("id")), root,
      statsCols = Seq("id", "score"))
    root
  }

  test("batch read equals the API read; SQL over a temp view works") {
    val root = freshTable()
    val api = Snapshots.read(spark, root).as[(Long, String, Double)].collect().toSet
    val dsv2 = batchRead(root).as[(Long, String, Double)].collect().toSet
    assert(dsv2 === api)

    batchRead(root).createOrReplaceTempView("snap_t")
    val n = spark.sql("SELECT count(*) AS n FROM snap_t").as[Long].head()
    assert(n === 4000L)
  }

  test("pushed range filter prunes files; result stays row-exact") {
    val root = freshTable()
    val total = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files.size
    val q = batchRead(root).filter(col("id") >= 3500L)
    assert(scannedFiles(q) < total,
      s"range filter must prune (scanned ${scannedFiles(q)} of $total)")
    assert(q.select("id").as[Long].collect().toSet === (3500L to 4000L).toSet)
    // the pushdown is visible in the scan description
    assert(q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.exists(_.contains("PushedFilters")))

    // point + IN prune harder
    val point = batchRead(root).filter(col("id") === 42L)
    assert(scannedFiles(point) === 1)
    assert(point.count() === 1L)
    val in = batchRead(root).filter(col("id").isin(10L, 3990L))
    assert(scannedFiles(in) === 2)
    assert(in.count() === 2L)
  }

  test("an unminable filter scans everything but never drops rows") {
    val root = freshTable()
    val total = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files.size
    val q = batchRead(root).filter(col("name").endsWith("_7"))
    assert(scannedFiles(q) === total)
    assert(q.count() === 1L) // only "name_7" ends with "_7"
  }

  test("deletion vectors apply through the batch scan") {
    val root = freshTable()
    Snapshots.deleteWhere(spark, root, col("id") % 100 === 3)
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.dvs.nonEmpty, "delete must have landed as vectors, not rewrites")
    val api = Snapshots.read(spark, root).as[(Long, String, Double)].collect().toSet
    val dsv2 = batchRead(root).as[(Long, String, Double)].collect().toSet
    assert(dsv2 === api)
    assert(!dsv2.exists(_._1 % 100 == 3))
    assert(dsv2.size === 3960)
  }

  test("version option time-travels the batch scan") {
    val root = freshTable()
    Snapshots.commit(Seq((9001L, "late", 0.0)).toDF("id", "name", "score"),
      root, append = true)
    val head = batchRead(root)
    val v1 = spark.read.format(Fmt).option("root", root)
      .option("version", 1).load()
    assert(head.count() === 4001L)
    assert(v1.count() === 4000L)
  }

  test("the scan reports exact post-pruning, DV-adjusted row counts") {
    val root = freshTable()
    Snapshots.deleteWhere(spark, root, col("id") <= 10L)
    val q = batchRead(root)
    val reported = q.queryExecution.optimizedPlan.stats.rowCount
    assert(reported.contains(BigInt(3990)),
      s"expected exact manifest count 3990, got $reported")
    // and with a pushed filter, the estimate shrinks with the file set
    val band = batchRead(root).filter(col("id") >= 3500L)
    val bandRows = band.queryExecution.optimizedPlan.collect {
      case r if r.stats.rowCount.isDefined => r.stats.rowCount.get
    }
    assert(bandRows.nonEmpty && bandRows.min < BigInt(3990),
      s"pruned scan must report fewer rows: $bandRows")
  }

  test("string-bloom equality pruning through the DSv2 scan") {
    val root = tmp()
    val df = (1L to 2000L).map(i => (f"doc_$i%05d", i)).toDF("doc_id", "v")
    Snapshots.commit(df.repartitionByRange(8, col("doc_id")), root,
      bloomCols = Seq("doc_id"))
    val total = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files.size
    val q = batchRead(root).filter(col("doc_id") === "doc_00042")
    assert(scannedFiles(q) < total,
      s"bloom must prune (scanned ${scannedFiles(q)} of $total)")
    assert(q.select("v").as[Long].collect().toSeq === Seq(42L))
  }

  test("row-group predicate pushdown: a point filter decodes a fraction of a multi-row-group file") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "65536") // ~1.6k rows per row group
    try {
      Snapshots.commit(
        spark.range(1, 100001).select(col("id"), md5(col("id").cast("string")).as("s"))
          .sort("id").repartition(1), // one file, id-ordered -> tight row-group stats
        root)
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    assert(Snapshots.manifest(spark, root, 1L).files.size === 1)
    def decodedRows(q: DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.metrics("numOutputRows").value
      }.sum
    }
    // point predicate: footer stats keep ~one row group (and the page
    // index inside it), not the whole 100k-row file
    val point = batchRead(root).filter(col("id") === 42L)
    assert(point.select("id").as[Long].collect().toSeq === Seq(42L))
    val scanned = decodedRows(point)
    assert(scanned > 0 && scanned < 25000L,
      s"point filter must skip row groups (decoded $scanned of 100000)")
    // range predicate over the tail skips the head row groups
    val band = batchRead(root).filter(col("id") >= 99000L)
    assert(band.count() === 1001L)
    val bandScanned = decodedRows(band)
    assert(bandScanned < 25000L,
      s"range filter must skip row groups (decoded $bandScanned of 100000)")
    // a DV'd file row-group-filters too (round 15): the reader requests
    // the parquet row-index column so ordinals stay file-global under
    // skipping — the query stays row-exact AND decodes a fraction
    Snapshots.deleteWhere(spark, root, col("id") === 500L)
    val dvQ = batchRead(root).filter(col("id") === 42L)
    assert(dvQ.select("id").as[Long].collect().toSeq === Seq(42L))
    val dvScanned = decodedRows(dvQ)
    assert(dvScanned > 0 && dvScanned < 25000L,
      s"DV'd point filter must still skip row groups (decoded $dvScanned of 99999)")
    // filter on a column the footer lacks the expected type for is simply
    // not pushed: string equality without blooms still answers exactly
    val s = batchRead(root).filter(col("s") === md5(lit("77")))
    assert(s.count() === 1L)
  }

  test("parquet-internal blooms skip row groups on string points stats can't discriminate") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "65536")
    try {
      // high-cardinality strings in key-shuffled order: every row group's
      // [min,max] string range spans ~everything, so ONLY the bloom can
      // prune. bloomCols also turns on the parquet-internal filters.
      Snapshots.commit(
        spark.range(1, 60001)
          .select(md5(col("id").cast("string")).as("doc"), col("id"))
          .repartition(1),
        root, bloomCols = Seq("doc"))
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    assert(Snapshots.manifest(spark, root, 1L).files.size === 1)
    def decodedRows(q: DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.metrics("numOutputRows").value
      }.sum
    }
    val target = spark.range(777, 778)
      .select(md5(col("id").cast("string"))).head().getString(0)
    val q = batchRead(root).filter(col("doc") === target)
    assert(q.select("id").as[Long].collect().toSeq === Seq(777L))
    val scanned = decodedRows(q)
    assert(scanned > 0 && scanned < 30000L,
      s"bloom must skip row groups on a string point (decoded $scanned of 60000)")
  }

  test("runtime DPP in-sets reach the reader: the probe side decodes a row-group sliver") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "65536")
    try {
      Snapshots.commit(
        spark.range(1, 100001).select(col("id"), md5(col("id").cast("string")).as("s"))
          .sort("id").repartition(1),
        root, statsCols = Seq("id"))
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    // one fact file: FILE-level pruning can't help; only the runtime
    // IN-set handed into the parquet reader can skip row groups. Drive
    // Spark's REAL injection (a parquet dim with a selective filter — a
    // local relation never triggers the pruning heuristic), then read the
    // scan's decode count out of the AQE-wrapped plan (plain
    // SparkPlan.collect stops at the adaptive boundary).
    val dimDir = Files.createTempDirectory("rgdim").toString
    spark.range(0, 100).select(
      (col("id") * 1000 + 5).as("dk"),
      when(col("id") === 0, "keep").otherwise("drop").as("tag"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val fact = batchRead(root)
    val joined = fact.join(org.apache.spark.sql.functions.broadcast(dim),
      col("id") === col("dk"))
    // collect JOINED itself: metrics live on the executed plan instance —
    // a derived frame (joined.select(...)) would execute a different one
    assert(joined.collect().map(_.getLong(0)).toSeq === Seq(5L))
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
      case b: BatchScanExec if b.scan.description().contains("graft-snapshot") =>
        b.metrics("numOutputRows").value
      case other => other.children.map(walk).sum
    }
    assert(joined.queryExecution.executedPlan.toString.contains("RuntimeFilters: ["),
      "Spark must inject the runtime filter on the snapshot fact scan")
    val decoded = walk(joined.queryExecution.executedPlan)
    assert(decoded > 0 && decoded < 50000L,
      s"runtime IN-set must skip row groups on the probe side (decoded $decoded of 100000)")
  }

  test("a compacted single-file table splits into parallel byte ranges, rows exactly once") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "65536") // small row groups: sub-splits carry rows
    try {
      Snapshots.commit(
        spark.range(1, 100001).select(col("id"), md5(col("id").cast("string")).as("s"))
          .repartition(1),
        root)
    } finally oldBlock.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    assert(Snapshots.manifest(spark, root, 1L).files.size === 1)
    val oldMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    try {
      val q = batchRead(root)
      val parts = scannedFiles(q)
      assert(parts > 1, s"one large file must split into byte ranges, got $parts")
      assert(q.select("id").as[Long].collect().toSet === (1L to 100000L).toSet)
    } finally oldMax.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
      spark.conf.set("spark.sql.files.maxPartitionBytes", _))
  }

  test("COUNT(*) pushes down to the manifest: one-row scan, DV-adjusted, no file I/O") {
    val root = freshTable()
    Snapshots.deleteWhere(spark, root, col("id") <= 10L) // vectors adjust the count
    val q = batchRead(root).groupBy().count()
    assert(q.as[Long].head() === 3990L)
    val descs = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => (b.scan.description(), b.inputPartitions.length)
    }
    assert(descs.exists { case (d, n) =>
      d.contains("PushedAggregates: [COUNT(*)]") && n == 1 },
      s"expected the manifest count scan, got $descs")
    // a filtered count must NOT push (file pruning is not row-exact):
    // still answers row-exactly through the normal scan
    val filtered = batchRead(root).filter(col("id") > 3990L)
    assert(filtered.count() === 10L)
    assert(!filtered.groupBy().count().queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
  }

  test("MIN/MAX/COUNT(col) push down to the manifest stats: one-row scan, exact") {
    val root = tmp()
    val df = (1L to 4000L).map(i =>
      (i, if (i % 10 == 0) null else s"n$i",
        java.sql.Date.valueOf(s"2024-01-${(i % 28 + 1).toString.reverse.padTo(2, '0').reverse}"),
        i.toInt - 2000,
        if (i % 10 == 0) None else Some(i * 3)))
      .toDF("id", "name", "d", "k", "v")
    Snapshots.commit(df.repartitionByRange(8, col("id")), root,
      statsCols = Seq("id", "d", "k", "v"))
    def descOf(q: DataFrame): String =
      q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan.description()
      }.mkString("\n")
    // a mixed aggregate answers entirely from metadata
    val q = batchRead(root).agg(
      min(col("id")), max(col("id")), min(col("d")), max(col("k")),
      count(lit(1)), count(col("v")))
    val d = descOf(q)
    assert(d.contains("PushedAggregates") && d.contains("MIN(id)") &&
      d.contains("MAX(k)") && d.contains("COUNT(v)"), s"got: $d")
    val row = q.head()
    assert(row.getLong(0) === 1L && row.getLong(1) === 4000L)
    assert(row.getDate(2) === java.sql.Date.valueOf("2024-01-01"))
    assert(row.getInt(3) === 2000)
    assert(row.getLong(4) === 4000L && row.getLong(5) === 3600L)
    // no stats on the column → no pushdown, still exact through the scan
    val noStats = batchRead(root).agg(min(col("name")))
    assert(!descOf(noStats).contains("PushedAggregates"))
    assert(noStats.head().getString(0) === "n1")
    // a live deletion vector poisons extremes (the min row may be gone):
    // whole aggregation declines, answers stay row-exact via the scan
    Snapshots.deleteWhere(spark, root, col("id") <= 5L)
    val afterDv = batchRead(root).agg(min(col("id")), count(lit(1)))
    assert(!descOf(afterDv).contains("MIN"), descOf(afterDv))
    val r2 = afterDv.head()
    assert(r2.getLong(0) === 6L && r2.getLong(1) === 3995L)
    // pure COUNT(*) still pushes (vectors subtract exactly)
    val cnt = batchRead(root).groupBy().count()
    assert(descOf(cnt).contains("PushedAggregates: [COUNT(*)]"))
    assert(cnt.as[Long].head() === 3995L)
  }

  test("asOfTimestamp option and SQL VERSION/TIMESTAMP AS OF time-travel the scan") {
    val root = tmp()
    Snapshots.commit((1L to 100L).map(i => (i, i)).toDF("k", "v"), root)
    Thread.sleep(15) // publish timestamps must separate the versions
    val t1 = System.currentTimeMillis()
    Thread.sleep(15)
    Snapshots.commit((101L to 200L).map(i => (i, i)).toDF("k", "v"), root,
      append = true)
    // option forms: epoch millis and ISO instant
    def asOf(ts: String): Long =
      spark.read.format(Fmt).option("root", root)
        .option("asOfTimestamp", ts).load().count()
    assert(asOf(t1.toString) === 100L)
    assert(asOf(java.time.Instant.ofEpochMilli(t1).toString) === 100L)
    assert(asOf(System.currentTimeMillis().toString) === 200L)
    // everything retained is newer → loud error, not an empty read
    val e = intercept[Exception] { asOf("1000") }
    assert(e.getMessage.contains("published at or before"))
    // SQL surfaces through the catalog
    spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 100L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`")
      .head().getLong(0) === 200L)
    val lit = new java.sql.Timestamp(t1).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$root` TIMESTAMP AS OF '$lit'")
      .head().getLong(0) === 100L)
    // era schema: a version loaded before a rename surfaces its OWN names
    Snapshots.renameColumn(spark, root, "k", "key")
    assert(spark.sql(s"SELECT key FROM graft.`$root` LIMIT 1").columns === Array("key"))
    assert(spark.sql(s"SELECT k FROM graft.`$root` VERSION AS OF 2 WHERE k > 150")
      .count() === 50L)
  }

  test("runtime filtering: an IN-set landing after planning re-prunes files") {
    val root = freshTable() // 8 range files by id, statsCols id+score
    val scan = batchRead(root).queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    val rf = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    // only index-backed columns advertised (name has no stats/bloom: a
    // runtime IN-set on it could never prune, so don't ask Spark for one)
    assert(rf.filterAttributes().map(_.fieldNames().head).toSet ===
      Set("id", "score"))
    val before = scan.toBatch.planInputPartitions().length
    assert(before === 8)
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(42L, 3990L))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after === 2,
      s"two point keys in two distinct range files must plan 2 of $before")
  }

  test("DPP end-to-end: dimension-filtered join runs a runtime filter on the fact scan") {
    val root = freshTable()
    val dim = Seq((42L, "a"), (3990L, "b"), (4100L, "c")).toDF("k", "tag")
    val fact = batchRead(root)
    val joined = fact.join(dim.filter(col("tag") =!= "c"),
      fact("id") === dim("k"))
    val rows = joined.select("id", "tag").as[(Long, String)].collect().toSet
    assert(rows === Set((42L, "a"), (3990L, "b")))
    // the executed plan's fact scan carries the dynamic-pruning filter
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("RuntimeFilters: ["),
      s"expected a runtime filter on the DSv2 scan; plan:\n$planStr")
  }

  test("df.write through the provider IS an engine commit: append, overwrite, time travel") {
    val root = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format(Fmt).option("root", root)
      .option("statsCols", "id").mode("append").save()
    Seq((3L, "c")).toDF("id", "s")
      .write.format(Fmt).option("root", root)
      .option("statsCols", "id").mode("append").save()
    // both writes landed as engine commits — versioned, API-readable
    assert(Snapshots.headVersion(spark, root) === 2L)
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(batchRead(root).count() === 3L)
    // overwrite truncates at the head; history stays time-travelable
    Seq((9L, "z")).toDF("id", "s")
      .write.format(Fmt).option("root", root).mode("overwrite").save()
    assert(batchRead(root).as[(Long, String)].collect().toSet === Set((9L, "z")))
    assert(spark.read.format(Fmt).option("root", root).option("version", 2)
      .load().count() === 3L)
  }

  test("df.write append onto a renamed table rides the column mapping") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "x")).toDF("id", "old_name"), root)
    Snapshots.renameColumn(spark, root, "old_name", "new_name")
    // the append arrives with the CURRENT logical name; files must store
    // the physical one so old and new generations read together
    Seq((2L, "y")).toDF("id", "new_name")
      .write.format(Fmt).option("root", root).mode("append").save()
    assert(batchRead(root).as[(Long, String)].collect().toSet ===
      Set((1L, "x"), (2L, "y")))
    assert(batchRead(root).schema.fieldNames.toSeq === Seq("id", "new_name"))
  }

  test("a write-option statsCols indexes the new files: pushed filters prune them") {
    val root = tmp()
    (1L to 4000L).map(i => (i, i % 7)).toDF("id", "v")
      .repartitionByRange(8, col("id"))
      .write.format(Fmt).option("root", root)
      .option("statsCols", "id").mode("append").save()
    val total = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files.size
    val q = batchRead(root).filter(col("id") === 42L)
    assert(scannedFiles(q) === 1, s"stats from the write must prune ($total files)")
    assert(q.count() === 1L)
  }

  test("column pruning reaches the scan; renamed tables read under new names") {
    val root = freshTable()
    Snapshots.renameColumn(spark, root, "score", "quality")
    val q = batchRead(root).select("id", "quality")
    val scanSchemas = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scanSchemas === Seq(Seq("id", "quality")))
    assert(q.filter(col("id") === 5L).as[(Long, Double)].head() === ((5L, 5.0)))
  }
}
