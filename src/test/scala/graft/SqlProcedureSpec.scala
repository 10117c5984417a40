package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** SQL CALL procedures over the snapshot catalog — the admin lifecycle
  * (history / compact / restore / vacuum / checks) drivable without the
  * Scala API. */
class SqlProcedureSpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")

  private def tmp(): String =
    "file:" + Files.createTempDirectory("sqlproc").toString + "/t"

  test("history returns one row per retained version with tags and clustering") {
    val root = tmp()
    Snapshots.commit((1L to 100L).map(i => (i, i)).toDF("k", "v"), root,
      clusterBy = Some((Seq("k"), 4)))
    Snapshots.commit((101L to 200L).map(i => (i, i)).toDF("k", "v"), root,
      append = true, tag = "batch-2")
    val h = spark.sql(s"CALL graft.system.history('$root')").collect()
    assert(h.length === 2)
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(h(1).getString(3) === "batch-2")
    assert(h(0).getString(6) === "bucket(4, k)")
    assert(h(1).getAs[java.sql.Timestamp]("committed_at") != null)
    assert(h.map(r => r.getLong(5)).sum > 0, "per-version file counts recorded")
  }

  test("compact + vacuum lifecycle through CALL; history shrinks to retained") {
    val root = tmp()
    (1 to 3).foreach { i =>
      Snapshots.commit(Seq((i.toLong, i.toLong)).toDF("k", "v"), root,
        append = i > 1)
    }
    val v = spark.sql(s"CALL graft.system.compact('$root', target_files => 1)")
      .head().getLong(0)
    assert(v === 4L)
    assert(spark.table(s"graft.`$root`").count() === 3L)
    // predicate-scoped compaction: the commits carried no stats index,
    // so the miner conservatively keeps every file — the rewrite must
    // stay row-neutral whatever it touches
    val v2 = spark.sql(s"CALL graft.system.compact_where('$root', 'k > 100')")
      .head().getLong(0)
    assert(spark.table(s"graft.`$root`").count() === 3L)
    spark.sql(s"CALL graft.system.vacuum('$root', keep_last => 1)")
    // vacuumed history: only the head remains readable
    val h = spark.sql(s"CALL graft.system.history('$root')").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(v2))
    assert(spark.table(s"graft.`$root`").count() === 3L)
  }

  test("restore via CALL rolls back as history; named args work") {
    val root = tmp()
    Snapshots.commit((1L to 50L).map(i => (i, i)).toDF("k", "v"), root)
    spark.sql(s"DELETE FROM graft.`$root` WHERE k <= 10")
    assert(spark.table(s"graft.`$root`").count() === 40L)
    val v = spark.sql(s"CALL graft.system.restore('$root', version => 1)")
      .head().getLong(0)
    assert(v === 3L)
    assert(spark.table(s"graft.`$root`").count() === 50L)
  }

  test("add_check enforces through SQL writes; drop_check lifts it") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 5L)).toDF("k", "v"), root)
    spark.sql(s"CALL graft.system.add_check('$root', 'v_pos', 'v >= 0')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (2, -1)")
    }
    assert(spark.table(s"graft.`$root`").count() === 1L)
    spark.sql(s"CALL graft.system.drop_check('$root', 'v_pos')")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (2, -1)")
    assert(spark.table(s"graft.`$root`").count() === 2L)
  }

  test("table_stats reports per-file rows, vectored deletes, and indexed cols") {
    val root = tmp()
    Snapshots.commit(
      (1L to 400L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")),
      root, statsCols = Seq("k"), bloomCols = Seq("s"))
    spark.sql(s"DELETE FROM graft.`$root` WHERE k <= 50")
    val st = spark.sql(s"CALL graft.system.table_stats('$root')").collect()
    assert(st.length === 4)
    assert(st.map(_.getLong(1)).sum === 400L)
    assert(st.map(_.getLong(2)).sum === 50L)
    assert(st.forall(_.getString(3) === "k,s"))
    // time-traveled stats answer for THAT version: no deletes at v1
    val v1 = spark.sql(s"CALL graft.system.table_stats('$root', version => 1)")
      .collect()
    assert(v1.map(_.getLong(2)).sum === 0L)
  }

  test("branch lifecycle from SQL: fork, write via @ref address, audit, publish") {
    val root = tmp()
    Snapshots.commit((1L to 100L).map(i => (i, i)).toDF("k", "v"), root)
    spark.sql(s"CALL graft.system.create_branch('$root', 'staging')")
    assert(spark.sql(s"CALL graft.system.list_branches('$root')")
      .as[String].collect().toSeq === Seq("staging"))
    // the branch is a first-class SQL table: insert + delete on it,
    // main unchanged until publish
    spark.sql(s"INSERT INTO graft.`$root@ref=staging` " +
      "SELECT id, id FROM range(101, 111)")
    spark.sql(s"DELETE FROM graft.`$root@ref=staging` WHERE k <= 10")
    assert(spark.table(s"graft.`$root@ref=staging`").count() === 100L)
    assert(spark.table(s"graft.`$root`").count() === 100L,
      "main must not see branch work before publish")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root@ref=staging` WHERE k <= 10")
      .head().getLong(0) === 0L)
    spark.sql(s"CALL graft.system.publish_branch('$root', 'staging')")
    assert(spark.table(s"graft.`$root`").count() === 100L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` WHERE k > 100")
      .head().getLong(0) === 10L)
    spark.sql(s"CALL graft.system.drop_branch('$root', 'staging')")
    assert(spark.sql(s"CALL graft.system.list_branches('$root')").count() === 0L)
  }

  test("convert adopts a plain parquet dir; unknown procedure refuses with the list") {
    val dir = "file:" + Files.createTempDirectory("sqlconv").toString + "/plain"
    (1L to 20L).map(i => (i, i * 2)).toDF("a", "b")
      .repartition(2).write.parquet(dir)
    val v = spark.sql(
      s"CALL graft.system.convert('$dir', stats_cols => 'a')").head().getLong(0)
    assert(v === 1L)
    assert(spark.table(s"graft.`$dir`").count() === 20L)
    // Spark wraps loadProcedure failures as FAILED_TO_LOAD_ROUTINE with
    // our listing message in the cause chain
    val e = intercept[Exception] { spark.sql(s"CALL graft.system.nope('$dir')") }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE") ||
      messages.contains("no such procedure"))
  }
}
