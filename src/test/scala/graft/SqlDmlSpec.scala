package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** SQL DML/DDL over snapshot tables through [[graft.streaming
  * .SnapshotCatalog]]: DELETE FROM (merge-on-read deletion vectors),
  * TRUNCATE TABLE (O(1) metadata), and ALTER TABLE column evolution
  * (metadata-only rename/drop/add) — each an engine commit with full
  * history semantics. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")

  private def tmp(): String =
    "file:" + Files.createTempDirectory("sqldml").toString + "/t"

  test("DELETE FROM WHERE vectors rows without rewriting files; history intact") {
    val root = tmp()
    Snapshots.commit((1L to 1000L).map(i => (i, i % 7, s"s$i")).toDF("k", "g", "s"),
      root, statsCols = Seq("k"))
    val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
    spark.sql(s"DELETE FROM graft.`$root` WHERE k <= 100 AND g = 3")
    assert(Snapshots.headVersion(spark, root) === 2L)
    val m2 = Snapshots.manifest(spark, root, 2L)
    assert(m2.files.toSet === filesBefore,
      "a small predicate delete must vector, not rewrite (merge-on-read)")
    assert(m2.dvs.nonEmpty, "the delete must have recorded deletion vectors")
    val expectGone = (1L to 100L).count(i => i % 7 == 3)
    assert(spark.table(s"graft.`$root`").count() === 1000L - expectGone)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$root` WHERE k <= 100 AND g = 3")
      .head().getLong(0) === 0L)
    // time travel still sees the deleted rows
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 1000L)
  }

  test("DELETE FROM translates string/null/IN/NOT shapes exactly") {
    val root = tmp()
    Snapshots.commit(Seq(
      (1L, Some("apple")), (2L, Some("apricot")), (3L, Some("banana")),
      (4L, None), (5L, Some("cherry"))).toDF("k", "s"), root)
    spark.sql(s"DELETE FROM graft.`$root` WHERE s LIKE 'ap%'")
    assert(spark.table(s"graft.`$root`").select("k").as[Long].collect().sorted
      === Array(3L, 4L, 5L))
    // NULL-evaluating rows survive a negated predicate only when SQL says so:
    // NOT(s IN ('banana')) is null for s=null → row survives
    spark.sql(s"DELETE FROM graft.`$root` WHERE s NOT IN ('banana')")
    assert(spark.table(s"graft.`$root`").select("k").as[Long].collect().sorted
      === Array(3L, 4L))
    spark.sql(s"DELETE FROM graft.`$root` WHERE s IS NULL")
    assert(spark.table(s"graft.`$root`").select("k").as[Long].collect()
      === Array(3L))
  }

  test("unconditioned DELETE and TRUNCATE TABLE are O(1) metadata commits") {
    val root = tmp()
    Snapshots.commit((1L to 500L).map(i => (i, i)).toDF("k", "v"), root,
      clusterBy = Some(("k", 4)))
    spark.sql(s"DELETE FROM graft.`$root`")
    assert(Snapshots.headVersion(spark, root) === 2L)
    val m2 = Snapshots.manifest(spark, root, 2L)
    assert(m2.files.isEmpty, "unconditioned DELETE must truncate, zero files")
    assert(spark.table(s"graft.`$root`").count() === 0L)
    // schema and clustering survive the truncate; appends re-cluster
    assert(Snapshots.clusteringAt(spark, root, 2L) ===
      Some(Snapshots.Clustering("k", 4)))
    spark.sql(s"INSERT INTO graft.`$root` SELECT id, id FROM range(1, 11)")
    assert(Snapshots.clusteringAt(spark, root, 3L) ===
      Some(Snapshots.Clustering("k", 4)))
    assert(spark.table(s"graft.`$root`").count() === 10L)
    spark.sql(s"TRUNCATE TABLE graft.`$root`")
    assert(spark.table(s"graft.`$root`").count() === 0L)
    // history is history: every pre-truncate version still reads
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 500L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 3")
      .head().getLong(0) === 10L)
  }

  test("ALTER TABLE RENAME/DROP/ADD COLUMNS are metadata-only engine commits") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s"), root)
    val filesV1 = Snapshots.manifest(spark, root, 1L).files.toSet

    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN v TO amount")
    assert(spark.table(s"graft.`$root`").columns === Array("k", "amount", "s"))
    assert(spark.table(s"graft.`$root`").agg(sum("amount")).head().getLong(0) === 30L)

    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN s")
    assert(spark.table(s"graft.`$root`").columns === Array("k", "amount"))

    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (score DOUBLE)")
    val withNew = spark.table(s"graft.`$root`")
    assert(withNew.columns === Array("k", "amount", "score"))
    assert(withNew.where(col("score").isNull).count() === 2L,
      "existing rows read null for an added column")

    // re-adding the dropped name must NOT resurrect the old bytes
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (s STRING)")
    assert(spark.table(s"graft.`$root`").where(col("s").isNull).count() === 2L,
      "a re-added dropped column reads null, never the retired files' values")

    // all four ALTERs were metadata-only: no data file was written
    val head = Snapshots.headVersion(spark, root)
    assert(head === 5L)
    assert(Snapshots.manifest(spark, root, head).files.toSet === filesV1)

    // the evolved schema round-trips an insert (new columns land, old read)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 30, 1.5, 'c')")
    val rows = spark.table(s"graft.`$root`").orderBy("k")
      .select("k", "amount", "score", "s").collect()
    assert(rows.length === 3)
    assert(rows(2).getLong(1) === 30L && rows(2).getDouble(2) === 1.5 &&
      rows(2).getString(3) === "c")
    // time travel to the pre-rename era surfaces the era's names
    assert(spark.sql(s"SELECT v FROM graft.`$root` VERSION AS OF 1").columns
      === Array("v"))
  }

  test("unsupported ALTER shapes refuse loudly instead of silently dropping") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), root)
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (x BIGINT FIRST)")
    }
    assert(e1.getMessage.contains("FIRST/AFTER"))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES ('a'='b')")
    }
    assert(e2.getMessage.toLowerCase.contains("unsupported"))
    // DROP COLUMN IF EXISTS on a missing column is the one silent no-op SQL asks for
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN IF EXISTS nope")
    assert(Snapshots.headVersion(spark, root) === 1L)
  }

  test("engine truncate fences concurrent commits; addColumn collides safely") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), root)
    // truncate is requireHead-fenced: a stale-head caller aborts loudly
    Snapshots.truncate(spark, root)
    assert(Snapshots.headVersion(spark, root) === 2L)
    val e = intercept[Exception] { Snapshots.addColumn(spark, root, "k",
      org.apache.spark.sql.types.LongType) }
    assert(e.getMessage.contains("already exists"))
  }
}
