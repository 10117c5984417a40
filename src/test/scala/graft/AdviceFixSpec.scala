package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.engine.{S3Like, SchemaMap, Tables, Xlsx}

/** Regression suite for the round-1 ADVICE findings. */
class AdviceFixSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = "file:" + Files.createTempDirectory("advicefix").toString

  test("putDf exactNaming=true with format=object is rejected, not silently lossy") {
    val df = Seq((1L, "a")).toDF("col_1", "col_2")
    val e = intercept[IllegalArgumentException](
      S3Like.putDf(df, tmp() + "/k.obj", format = "object", exactNaming = true))
    assert(e.getMessage.contains("exactNaming"))
  }

  test("putDf exactNaming=true with format=xlsx lands a readable single file at the exact key") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("col_1", "col_2")
    val uri = tmp() + "/k.xlsx"
    S3Like.putDf(df, uri, format = "xlsx", exactNaming = true)
    assert(new java.io.File(uri.stripPrefix("file:")).isFile)
    val back = S3Like.getDf(spark, uri, "xlsx")
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("xlsx round-trips longs beyond 2^53 exactly") {
    val big = (1L << 53) + 3 // would corrupt via a double round-trip
    val df = Seq((big, "x"), (-big, "y")).toDF("col_1", "col_2")
    val uri = tmp() + "/big.xlsx"
    Xlsx.write(df, uri)
    val back = Xlsx.read(spark, uri)
    assert(back.schema("col_1").dataType == LongType)
    assert(back.select("col_1").as[Long].collect().toSet == Set(big, -big))
  }

  test("normalizeColumns fails fast on post-normalization collisions") {
    val df = Seq((1L, "x")).toDF("A B", "a_b")
    val e = intercept[IllegalArgumentException](SchemaMap.normalizeColumns(df))
    assert(e.getMessage.contains("collide"))
  }

  test("normalizeEventTs truncates ns → µs by integer division (no double drift)") {
    // 9000000000000000999 ns: exact µs = 9000000000000000, but double
    // division rounds to ...001 (ULP at this magnitude is > 1 µs).
    val ns = 9000000000000000999L
    val schema = StructType(Seq(StructField("ts", LongType)))
    val df = spark.createDataFrame(java.util.List.of(Row(ns)), schema)
    val micros = Tables.normalizeEventTs(df)
      .select(unix_micros_col).as[Long].head()
    assert(micros == ns / 1000)
  }
  private def unix_micros_col = org.apache.spark.sql.functions.unix_micros(
    org.apache.spark.sql.functions.col("ts").cast(TimestampType)) // NTZ→LTZ is identity in the UTC test session

  test("mixed-mode sniff rejects gzip objects without a .gz extension") {
    val dir = Files.createTempDirectory("sniffgz")
    val f = dir.resolve("nogz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write("col_1,col_2\n1,a\n".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException](
      S3Like.getDfFromKeys(spark, "file:" + dir, format = "mixed"))
    assert(e.getMessage.contains(".gz"))
  }

  test("mixed-mode sniff accepts gzip objects with a .gz extension") {
    val dir = Files.createTempDirectory("sniffgzok")
    val f = dir.resolve("data.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write("col_1,col_2\n1,a\n2,b\n".getBytes("UTF-8")); out.close()
    val got = S3Like.getDfFromKeys(spark, "file:" + dir, format = "mixed").get
    assert(got.count() == 2)
  }

  test("approximate sketches stay within tolerance of exact counts") {
    // approx_count_distinct is the HLL 'novel sketch' path — never oracle-
    // checked (engine-specific sketch), sanity-bounded here instead
    import org.apache.spark.sql.functions._
    val orders = Tables(spark, sf, "orders")
    val exact = orders.select(countDistinct("o_custkey")).head().getLong(0)
    val approx = orders.select(approx_count_distinct("o_custkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("merge/delete work on non-numeric (string) keys via conservative rewrite") {
    // round-6 advice: the double-cast key probe NPE'd on string doc-ids —
    // a primary corpus-lake shape. Opaque keys disable file pruning
    // (every file rewrites) but must stay correct.
    import graft.engine.Snapshots
    val root = tmp() + "/t"
    Snapshots.commit(Seq(("doc-a", 1L), ("doc-b", 2L)).toDF("doc_id", "v"), root,
      statsCols = Seq("v"))
    Snapshots.merge(Seq(("doc-b", 20L), ("doc-c", 30L)).toDF("doc_id", "v"), root,
      key = "doc_id")
    assert(Snapshots.read(spark, root).as[(String, Long)].collect().toSet ===
      Set(("doc-a", 1L), ("doc-b", 20L), ("doc-c", 30L)))
    Snapshots.delete(Seq("doc-a").toDF("doc_id"), root, key = "doc_id")
    assert(Snapshots.read(spark, root).as[(String, Long)].collect().toSet ===
      Set(("doc-b", 20L), ("doc-c", 30L)))
  }

  test("metadata delete never full-accepts longs that collapse in double space") {
    // round-16 advice: full acceptance compared stats and literals as
    // doubles with no exact-representability guard — DELETE WHERE
    // id = 2^53+1 full-accepted (and DROPPED) a file whose rows are 2^53,
    // silently deleting non-matching rows. Equality and non-strict bounds
    // must decline full acceptance outside the exact-double range.
    import graft.engine.Snapshots
    import org.apache.spark.sql.functions.{col, lit}
    val big = 9007199254740992L // 2^53; 2^53+1 rounds to the same double
    val root = tmp() + "/t"
    Snapshots.commit(
      spark.range(0, 100).select((lit(big) + ($"id" * 0)).as("id"), $"id".as("v"))
        .coalesce(1),
      root, statsCols = Seq("id"))
    val head = Snapshots.headVersion(spark, root)
    // equality on the collapsing neighbor: a true no-op, zero rows deleted
    assert(Snapshots.deleteWhere(spark, root, col("id") === (big + 1)) === head)
    // non-strict band on the collapsing neighbor: also a no-op
    assert(Snapshots.deleteWhere(spark, root, col("id") >= (big + 1)) === head)
    assert(Snapshots.read(spark, root).count() === 100L)
    // countWhere must not overcount through the same primitive
    assert(Snapshots.countWhere(spark, root, col("id") === (big + 1)) === 0L)
    assert(Snapshots.countWhere(spark, root, col("id") === big) === 100L)
  }

  test("wide decimals decline full acceptance; in-range types still metadata-delete") {
    import graft.engine.Snapshots
    import org.apache.spark.sql.functions.{col, lit}
    val root = tmp() + "/t"
    // DecimalType(20,0): 20 significant digits exceed a double's 15 —
    // distinct values can collapse, so equality must scan, not drop
    Snapshots.commit(
      spark.range(0, 50)
        .select(lit(new java.math.BigDecimal("9007199254740993"))
          .cast("decimal(20,0)").as("d"), $"id").coalesce(1),
      root, statsCols = Seq("d"))
    val head = Snapshots.headVersion(spark, root)
    assert(Snapshots.deleteWhere(spark, root,
      col("d") === lit(new java.math.BigDecimal("9007199254740992"))
        .cast("decimal(20,0)")) === head)
    assert(Snapshots.read(spark, root).count() === 50L)
    // int columns are always double-exact: the aligned drop still fires
    val root2 = tmp() + "/t2"
    Snapshots.commit(
      spark.range(0, 200).select($"id".cast("int").as("k"))
        .repartitionByRange(2, col("k")),
      root2, statsCols = Seq("k"))
    val v = Snapshots.deleteWhere(spark, root2, col("k") < 100)
    val m = Snapshots.manifest(spark, root2, v)
    assert(m.files.size === 1 && m.dvs.isEmpty,
      "the int-keyed aligned delete must stay a pure metadata drop")
  }

  test("commit requireHead fences a read-modify-write against a racing commit") {
    // round-6 advice: Incremental.refresh could double-apply a delta when a
    // concurrent refresher advanced the state between its head read and its
    // commit. The fence: a commit carrying requireHead=v aborts loudly if
    // the head is no longer v.
    import graft.engine.Snapshots
    val root = tmp() + "/t"
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root) // v1
    val observed = Snapshots.headVersion(spark, root)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), root, append = true) // racer → v2
    val e = intercept[IllegalArgumentException](
      Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), root, append = true,
        requireHead = observed))
    assert(e.getMessage.contains("concurrent commit"))
    // the fenced commit left no new version behind
    assert(Snapshots.headVersion(spark, root) === 2L)
  }
}
