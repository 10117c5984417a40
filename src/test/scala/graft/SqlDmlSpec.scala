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
      clusterBy = Some((Seq("k"), 4)))
    spark.sql(s"DELETE FROM graft.`$root`")
    assert(Snapshots.headVersion(spark, root) === 2L)
    val m2 = Snapshots.manifest(spark, root, 2L)
    assert(m2.files.isEmpty, "unconditioned DELETE must truncate, zero files")
    assert(spark.table(s"graft.`$root`").count() === 0L)
    // schema and clustering survive the truncate; appends re-cluster
    assert(Snapshots.clusteringAt(spark, root, 2L) ===
      Some(Snapshots.Clustering(Seq("k"), 4)))
    spark.sql(s"INSERT INTO graft.`$root` SELECT id, id FROM range(1, 11)")
    assert(Snapshots.clusteringAt(spark, root, 3L) ===
      Some(Snapshots.Clustering(Seq("k"), 4)))
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

  test("ALTER COLUMN TYPE widens metadata-only; both generations read; merge after widen") {
    val root = tmp()
    Snapshots.commit((1 to 100).map(i => (i, i.toFloat / 2, BigDecimal(i) / 100))
      .toDF("k", "f", "d")
      .select(col("k"), col("f"),
        col("d").cast(org.apache.spark.sql.types.DecimalType(5, 2)).as("d")),
      root, statsCols = Seq("k"))
    val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN f TYPE DOUBLE")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN d TYPE DECIMAL(12,4)")
    assert(Snapshots.manifest(spark, root, 4L).files.toSet === filesBefore,
      "widening must be metadata-only (no file rewritten)")
    // both readers surface the widened types over the NARROW files
    val apiSchema = Snapshots.read(spark, root).schema
    assert(apiSchema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(apiSchema("f").dataType === org.apache.spark.sql.types.DoubleType)
    assert(apiSchema("d").dataType === org.apache.spark.sql.types.DecimalType(12, 4))
    assert(spark.table(s"graft.`$root`").schema("k").dataType
      === org.apache.spark.sql.types.LongType)
    assert(Snapshots.read(spark, root).agg(sum("k")).head().getLong(0) === 5050L)
    assert(spark.sql(s"SELECT sum(k) FROM graft.`$root`").head().getLong(0) === 5050L)
    assert(spark.sql(s"SELECT sum(f) FROM graft.`$root` WHERE k <= 4")
      .head().getDouble(0) === 5.0)
    // time travel to the pre-widen version surfaces the NARROW schema
    assert(spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 1")
      .schema("k").dataType === org.apache.spark.sql.types.IntegerType)
    // appends after the widen write the WIDE type; generations mix in one scan
    Snapshots.commit(Seq((101L, 2.5d, BigDecimal("99.1234")))
      .toDF("k", "f", "d")
      .select(col("k"), col("f"),
        col("d").cast(org.apache.spark.sql.types.DecimalType(12, 4)).as("d")),
      root, append = true)
    assert(spark.table(s"graft.`$root`").count() === 101L)
    // MERGE over the widened key: updates hit rows in narrow-generation files
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING (SELECT 7 AS k, 100.0 AS nf) s
         |ON t.k = s.k WHEN MATCHED THEN UPDATE SET f = s.nf""".stripMargin)
    assert(spark.sql(s"SELECT f FROM graft.`$root` WHERE k = 7")
      .head().getDouble(0) === 100.0)
    assert(spark.table(s"graft.`$root`").count() === 101L)
    // point filter through the stats index still prunes and stays exact
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` WHERE k = 101")
      .head().getLong(0) === 1L)
    // non-widening changes keep refusing — Spark's analyzer rejects
    // narrowings before the catalog (NOT_SUPPORTED_CHANGE_COLUMN), and the
    // engine's own guard refuses anything not provably value-preserving
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    val eApi = intercept[Exception] { Snapshots.widenColumn(spark, root, "k",
      org.apache.spark.sql.types.IntegerType) }
    assert(eApi.getMessage.contains("value-preserving"))
    val eApi2 = intercept[Exception] { Snapshots.widenColumn(spark, root, "f",
      org.apache.spark.sql.types.StringType) }
    assert(eApi2.getMessage.contains("value-preserving"))
    // widening the cluster key refuses (bucket hashes are type-sensitive)
    val croot = tmp()
    graft.engine.Snapshots.commit(
      (1 to 50).map(i => (i, s"v$i")).toDF("ck", "v"), croot,
      clusterBy = Some((Seq("ck"), 4)))
    val e2 = intercept[Exception] { Snapshots.widenColumn(spark, croot, "ck",
      org.apache.spark.sql.types.LongType) }
    assert(e2.getMessage.contains("cluster key"))
  }

  test("CTAS is atomic: a failed SELECT leaves no table, the retry succeeds; DROP TABLE clears metadata") {
    val root = tmp()
    // a CTAS whose SELECT fails mid-job must create NOTHING
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$root` AS " +
        "SELECT id, CAST(assert_true(id < 5) AS STRING) AS x FROM range(0, 100000)")
    }
    assert(graft.engine.Snapshots.headVersion(spark, root) === 0L,
      "a failed CTAS must not strand a visible (empty) table")
    assert(!spark.catalog.tableExists(s"graft.`$root`"))
    // the retry works (no TableAlreadyExists from the failed attempt)
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT id AS k FROM range(1, 101)")
    assert(graft.engine.Snapshots.headVersion(spark, root) === 1L,
      "atomic CTAS: the SELECT's write is v1 itself")
    assert(spark.table(s"graft.`$root`").count() === 100L)
    // an empty-result CTAS still creates the table (schema-recording v1)
    val root2 = tmp()
    spark.sql(s"CREATE TABLE graft.`$root2` AS " +
      s"SELECT k FROM graft.`$root` WHERE k < 0")
    assert(spark.table(s"graft.`$root2`").count() === 0L)
    assert(spark.table(s"graft.`$root2`").schema.fieldNames === Array("k"))
    // DROP TABLE removes the existence (metadata chain), data debris stays
    spark.sql(s"DROP TABLE graft.`$root`")
    assert(graft.engine.Snapshots.headVersion(spark, root) === 0L)
    assert(!spark.catalog.tableExists(s"graft.`$root`"))
    // the directory is reusable: CTAS over the dropped root succeeds
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT id AS z FROM range(1, 11)")
    assert(spark.table(s"graft.`$root`").count() === 10L)
    spark.sql(s"DROP TABLE IF EXISTS graft.`$root`")
    // dropping a missing table: IF EXISTS no-ops, bare DROP refuses
    spark.sql(s"DROP TABLE IF EXISTS graft.`$root`")
    intercept[Exception] { spark.sql(s"DROP TABLE graft.`$root`") }
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
