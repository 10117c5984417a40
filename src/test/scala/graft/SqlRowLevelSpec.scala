package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** SQL UPDATE / MERGE INTO / rewriting DELETE over snapshot tables —
  * group-based copy-on-write row-level operations
  * ([[graft.streaming.SnapshotRowLevelOperation]]). The scale assertions
  * matter as much as the row assertions: a point UPDATE must rewrite the
  * files its predicate touches, never the table. */
class SqlRowLevelSpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")

  private def tmp(): String =
    "file:" + Files.createTempDirectory("sqlrl").toString + "/t"

  /** 8 range-partitioned files over k = 1..4000, stats-indexed on k. */
  private def freshTable(): String = {
    val root = tmp()
    Snapshots.commit(
      (1L to 4000L).map(i => (i, i % 10, s"s$i")).toDF("k", "v", "s")
        .repartitionByRange(8, col("k")),
      root, statsCols = Seq("k"))
    root
  }

  test("UPDATE rewrites only the files its predicate touches") {
    val root = freshTable()
    val before = Snapshots.manifest(spark, root, 1L)
    assert(before.files.size === 8)
    spark.sql(s"UPDATE graft.`$root` SET v = v + 100 WHERE k <= 500")
    assert(Snapshots.headVersion(spark, root) === 2L)
    val after = Snapshots.manifest(spark, root, 2L)
    val carried = after.files.toSet intersect before.files.toSet
    assert(carried.size >= 6,
      s"a k<=500 update over 8 range files must carry >=6 untouched files " +
        s"by reference, carried only ${carried.size}")
    assert(after.files.size <= before.files.size + 1,
      "the rewrite must not fragment the table")
    // row exactness: updated where matched, copied verbatim otherwise
    val got = spark.table(s"graft.`$root`")
    assert(got.count() === 4000L)
    assert(got.where($"k" <= 500 && $"v" < 100).count() === 0L)
    assert(got.where($"k" > 500 && $"v" >= 100).count() === 0L)
    assert(got.agg(sum($"v")).head().getLong(0) ===
      (1L to 4000L).map(i => i % 10 + (if (i <= 500) 100L else 0L)).sum)
    // history: the pre-update version still answers
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1 WHERE v >= 100")
      .head().getLong(0) === 0L)
    // the replacement files are stats-indexed like the originals: a
    // point read after the update still prunes to a sliver
    val m = Snapshots.manifest(spark, root, 2L)
    assert(m.stats.map(_.col).distinct === Seq("k"))
    val scan = spark.read.format("graft.streaming.SnapshotSourceProvider")
      .option("root", root).load().where($"k" === 4000L)
    val parts = scan.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum
    assert(parts <= 2, s"post-update point read must still prune files, scanned $parts")
  }

  test("MERGE INTO: matched update + not-matched insert, one commit") {
    val root = freshTable()
    Seq((100L, 7L), (200L, 7L), (5000L, 7L), (6000L, 7L))
      .toDF("mk", "mv").createOrReplaceTempView("changes")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING changes c ON t.k = c.mk
        |WHEN MATCHED THEN UPDATE SET v = c.mv
        |WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (c.mk, c.mv, 'new')
        |""".stripMargin)
    assert(Snapshots.headVersion(spark, root) === 2L)
    val got = spark.table(s"graft.`$root`")
    assert(got.count() === 4002L)
    assert(got.where($"k".isin(100L, 200L) && $"v" === 7L).count() === 2L)
    assert(got.where($"k".isin(5000L, 6000L) && $"s" === "new").count() === 2L)
    // untouched rows untouched
    assert(got.where($"k" === 300L).select("v").as[Long].head() === 300L % 10)
  }

  test("MERGE with only inserts appends without touching existing files") {
    val root = freshTable()
    val before = Snapshots.manifest(spark, root, 1L).files.toSet
    Seq((9001L, 1L), (9002L, 2L)).toDF("mk", "mv")
      .createOrReplaceTempView("ins_only")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING ins_only c ON t.k = c.mk
        |WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (c.mk, c.mv, 'ins')
        |""".stripMargin)
    val after = Snapshots.manifest(spark, root, 2L)
    assert(before.subsetOf(after.files.toSet),
      "insert-only merge must carry every existing file by reference")
    assert(spark.table(s"graft.`$root`").count() === 4002L)
  }

  test("MERGE WHEN MATCHED DELETE drops exactly the matched rows") {
    val root = freshTable()
    Seq(10L, 20L, 30L).toDF("mk").createOrReplaceTempView("kill")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING kill c ON t.k = c.mk
        |WHEN MATCHED THEN DELETE
        |""".stripMargin)
    val got = spark.table(s"graft.`$root`")
    assert(got.count() === 3997L)
    assert(got.where($"k".isin(10L, 20L, 30L)).count() === 0L)
    // the rest of the touched files' rows survived the rewrite verbatim
    assert(got.where($"k" < 40L).count() === 36L)
  }

  test("DELETE with a subquery predicate falls back to the rewrite path") {
    val root = freshTable()
    Seq(1L, 2L, 3L).toDF("dk").createOrReplaceTempView("doomed")
    // not translatable to source filters → SupportsDelete can't take it;
    // the group-based rewrite must
    spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (SELECT dk FROM doomed)")
    val got = spark.table(s"graft.`$root`")
    assert(got.count() === 3997L)
    assert(got.where($"k" <= 3L).count() === 0L)
  }

  test("_file metadata column: provenance on clean and DV'd files") {
    val root = tmp()
    Snapshots.commit(
      (1L to 400L).map(i => (i, i)).toDF("k", "v").repartitionByRange(4, col("k")),
      root, statsCols = Seq("k"))
    val t = spark.table(s"graft.`$root`")
    // columnar path: 4 distinct files, counts per file sum to the total
    val perFile = t.select(col("_file")).groupBy("_file").count().collect()
    assert(perFile.length === 4)
    assert(perFile.map(_.getLong(1)).sum === 400L)
    assert(perFile.forall(_.getString(0).endsWith(".parquet")))
    // DV path (row reader): vector some rows, provenance still exact
    Snapshots.deleteWhere(spark, root, col("k") <= 50L)
    val after = spark.table(s"graft.`$root`")
      .groupBy("_file").count().collect()
    assert(after.map(_.getLong(1)).sum === 350L)
    assert(after.length === 4)
  }

  test("runtime group filtering: an unindexed UPDATE rewrites only matching files") {
    val root = tmp()
    // NO statsCols: the static index cannot mine s — only the dynamic
    // _file subquery can narrow the rewrite
    Snapshots.commit(
      (1L to 4000L).map(i => (i, if (i <= 500) "hot" else s"cold$i"))
        .toDF("k", "s").repartitionByRange(8, col("k")),
      root)
    val before = Snapshots.manifest(spark, root, 1L).files.toSet
    assert(before.size === 8)
    spark.sql(s"UPDATE graft.`$root` SET s = 'patched' WHERE s = 'hot'")
    val after = Snapshots.manifest(spark, root, 2L).files.toSet
    val carried = before intersect after
    assert(carried.size >= 6,
      s"group filtering must carry the non-matching files by reference, " +
        s"carried only ${carried.size} of 8")
    val got = spark.table(s"graft.`$root`")
    assert(got.where($"s" === "patched").count() === 500L)
    assert(got.count() === 4000L)
  }

  test("UPDATE that matches nothing is a true no-op") {
    val root = freshTable()
    spark.sql(s"UPDATE graft.`$root` SET v = 0 WHERE k > 99999")
    assert(spark.table(s"graft.`$root`").count() === 4000L)
    // pruning keeps the scan empty and the commit skips — no new version
    // is required, but if one lands it must be row-identical; accept both
    val head = Snapshots.headVersion(spark, root)
    assert(head === 1L || spark.sql(
      s"SELECT count(*) FROM graft.`$root` VERSION AS OF $head WHERE v <> k % 10")
      .head().getLong(0) === 0L)
  }

  test("UPDATE cannot manufacture CHECK-violating rows") {
    val root = tmp()
    Snapshots.commit((1L to 100L).map(i => (i, i)).toDF("k", "v"), root)
    graft.engine.Checks.add(spark, root, "v_pos", "v >= 0")
    intercept[Exception] {
      spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k <= 10")
    }
    // nothing published, nothing lost
    assert(Snapshots.headVersion(spark, root) >= 1L)
    assert(spark.table(s"graft.`$root`").where($"v" < 0).count() === 0L)
    assert(spark.table(s"graft.`$root`").count() === 100L)
  }

  test("replaceFiles fences on the expected head (concurrent commit aborts)") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 1L)).toDF("k", "v"), root)
    Snapshots.commit(Seq((2L, 2L)).toDF("k", "v"), root, append = true)
    val e = intercept[Exception] {
      Snapshots.replaceFiles(spark, root, expectedHead = 1L,
        removed = Snapshots.manifest(spark, root, 1L).files.toSet,
        newFiles = Seq.empty)
    }
    assert(e.getMessage.contains("concurrent commit"))
    assert(spark.table(s"graft.`$root`").count() === 2L)
  }

  test("UPDATE round-trips the column mapping on a renamed table") {
    val root = tmp()
    Snapshots.commit((1L to 50L).map(i => (i, i)).toDF("k", "v"), root)
    Snapshots.renameColumn(spark, root, "v", "amount")
    spark.sql(s"UPDATE graft.`$root` SET amount = amount * 2 WHERE k <= 25")
    val got = spark.table(s"graft.`$root`")
    assert(got.columns === Array("k", "amount"))
    assert(got.agg(sum("amount")).head().getLong(0) ===
      (1L to 50L).map(i => if (i <= 25) i * 2 else i).sum)
    // and the rewritten files stored the PHYSICAL name: a further rename
    // back still reads both generations
    Snapshots.renameColumn(spark, root, "amount", "v2")
    assert(spark.table(s"graft.`$root`").agg(sum("v2")).head().getLong(0) ===
      (1L to 50L).map(i => if (i <= 25) i * 2 else i).sum)
  }
}
