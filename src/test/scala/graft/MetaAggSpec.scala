package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Metadata-only aggregates — [[Snapshots.rowCount]], [[Snapshots.countWhere]],
  * [[Snapshots.statsRange]]: commits record per-file row counts (and per-file
  * null counts alongside min/max stats), so `count(*)`, banded counts, and
  * column min/max answer from the manifest in O(metadata). The load-bearing
  * pins: (1) the metadata path reads NO data files — proven by physically
  * deleting them; (2) a file is only counted from metadata when every
  * conjunct's column has zero recorded nulls in it — null rows fail a
  * predicate, so a nulls-bearing file must take the scan path; (3) every
  * answer ≡ the scan-based equivalent, boundary files included.
  */
class MetaAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("ma").toString + "/t"

  /** 800 rows range-clustered on id into 8 tight ~100-wide files. */
  private def build(): String = {
    val root = tmp()
    val df = spark.range(0, 800)
      .select($"id", ($"id" % 7).as("x"),
        concat(lit("s"), ($"id" % 3).cast("string")).as("s"))
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Snapshots.commit(df, root, statsCols = Seq("id", "x"))
    root
  }

  private def deleteDataFiles(root: String): Unit = {
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(s"$root/data"), true)
  }

  test("rowCount answers count(*) from the manifest alone") {
    val root = build()
    assert(Snapshots.rowCount(spark, root) === Some(800L))
    deleteDataFiles(root)
    assert(Snapshots.rowCount(spark, root) === Some(800L))
  }

  test("countWhere: interior files count from metadata, boundary files scan") {
    val root = build()
    val cond = col("id") >= 150 && col("id") < 450
    val want = Snapshots.read(spark, root).filter(cond).count()
    assert(Snapshots.countWhere(spark, root, cond) === want)
    // strict/non-strict boundary spellings all stay exact
    assert(Snapshots.countWhere(spark, root, col("id") > 99 && col("id") <= 700) ===
      Snapshots.read(spark, root).filter(col("id") > 99 && col("id") <= 700).count())
    // equality and IN
    assert(Snapshots.countWhere(spark, root, col("id") === 400) === 1L)
    assert(Snapshots.countWhere(spark, root, col("id").isin(5L, 305L, 605L)) === 3L)
  }

  test("a fully-metadata band answers with the data files gone") {
    val root = build()
    deleteDataFiles(root)
    // every file's [min, max] sits inside the band: zero data I/O
    assert(Snapshots.countWhere(spark, root, col("id") >= 0 && col("id") < 5000) === 800L)
    // a band beyond every file: zero, also without data
    assert(Snapshots.countWhere(spark, root, col("id") > 5000) === 0L)
  }

  test("an unminable conjunct forces the scan path and stays exact") {
    val root = build()
    val cond = col("id") >= 150 && col("id") < 450 && col("s") =!= "s1"
    assert(Snapshots.countWhere(spark, root, cond) ===
      Snapshots.read(spark, root).filter(cond).count())
    // no stats at all on the referenced column
    assert(Snapshots.countWhere(spark, root, col("s") === "s2") ===
      Snapshots.read(spark, root).filter(col("s") === "s2").count())
  }

  test("null rows never count from metadata: nulls-bearing files take the scan path") {
    val root = tmp()
    // v is null every 10th row; a naive metadata count of a fully-contained
    // file would overcount by its null rows
    val df = spark.range(0, 400)
      .select($"id", when($"id" % 10 === 0, lit(null)).otherwise($"id").cast("long").as("v"))
      .repartitionByRange(4, $"id").sortWithinPartitions("id")
    Snapshots.commit(df, root, statsCols = Seq("v"))
    val cond = col("v") >= 0 // true for all NON-NULL rows; nulls drop
    assert(Snapshots.countWhere(spark, root, cond) === 360L)
    assert(Snapshots.rowCount(spark, root) === Some(400L)) // rowCount counts rows, not values
  }

  test("statsRange answers min/max from the manifest alone") {
    val root = build()
    deleteDataFiles(root)
    assert(Snapshots.statsRange(spark, root, "id") === Some((0.0, 799.0)))
    assert(Snapshots.statsRange(spark, root, "x") === Some((0.0, 6.0)))
    assert(Snapshots.statsRange(spark, root, "s") === None) // no stats collected
  }

  test("counts survive the whole lifecycle: append, merge, delete, compactManifests") {
    val root = tmp()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select($"id", ($"id" * 2).as("v"))
      .repartitionByRange(2, $"id").sortWithinPartitions("id")
    Snapshots.commit(mk(0, 100), root, statsCols = Seq("id"))
    Snapshots.commit(mk(100, 200), root, append = true, statsCols = Seq("id"))
    assert(Snapshots.rowCount(spark, root) === Some(200L))
    // copy-on-write merge rewrites touched files; counts re-collect
    Snapshots.merge(mk(50, 60).withColumn("v", lit(0L)), root, "id", statsCols = Seq("id"))
    assert(Snapshots.rowCount(spark, root) === Some(200L))
    Snapshots.delete(Seq(10L, 110L).toDF("id"), root, "id", statsCols = Seq("id"))
    assert(Snapshots.rowCount(spark, root) === Some(198L))
    Snapshots.compactManifests(spark, root)
    assert(Snapshots.rowCount(spark, root) === Some(198L))
    assert(Snapshots.countWhere(spark, root, col("id") < 100) === 99L)
  }

  test("a statsCols-free commit still records counts (footer path)") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 50).toDF("id"), root) // no stats pass at all
    assert(Snapshots.rowCount(spark, root) === Some(50L))
    // no stats ⇒ no pruning, but countWhere still answers exactly via scan
    assert(Snapshots.countWhere(spark, root, col("id") < 10) === 10L)
  }

  test("randomized bands: countWhere ≡ read().filter().count, always") {
    val root = build()
    val rnd = new scala.util.Random(11)
    (1 to 12).foreach { _ =>
      val lo = rnd.nextInt(900).toLong
      val hi = lo + rnd.nextInt(300)
      val cond = rnd.nextInt(3) match {
        case 0 => col("id") >= lo && col("id") <= hi
        case 1 => col("id") > lo && col("x") <= rnd.nextInt(7)
        case 2 => col("id").isin(lo, hi, lo + 17)
      }
      assert(Snapshots.countWhere(spark, root, cond) ===
        Snapshots.read(spark, root).filter(cond).count(), s"drift for $cond")
    }
  }

  test("string predicates count from metadata: equality, band, IN, prefix") {
    val root = tmp()
    // per-lang commits: every file single-valued on lang with slo/shi stats
    Seq("de", "en", "fr").zipWithIndex.foreach { case (l, i) =>
      Snapshots.commit(
        spark.range(0, 100 * (i + 1)).select(lit(l).as("lang"), $"id")
          .repartition(2),
        root, append = i > 0, statsCols = Seq("lang", "id"))
    }
    deleteDataFiles(root) // the strongest pin: answers survive the bytes
    assert(Snapshots.countWhere(spark, root, col("lang") === "en") === 200L)
    assert(Snapshots.countWhere(spark, root, col("lang") >= "e") === 500L)
    assert(Snapshots.countWhere(spark, root, col("lang") < "e") === 100L)
    assert(Snapshots.countWhere(spark, root, col("lang").isin("de", "fr")) === 400L)
    assert(Snapshots.countWhere(spark, root, col("lang").startsWith("f")) === 300L)
    assert(Snapshots.countWhere(spark, root, col("lang") === "zz") === 0L)
  }

  test("string full-acceptance never fires on nulled or mixed files") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 100).select(
        when($"id" % 10 === 0, lit(null)).otherwise(lit("en")).as("lang"), $"id")
        .coalesce(1),
      root, statsCols = Seq("lang", "id"))
    // nulls in the file: metadata may not count it — scan path, exact
    assert(Snapshots.countWhere(spark, root, col("lang") === "en") === 90L)
    val root2 = tmp()
    Snapshots.commit(
      spark.range(0, 100).select(
        when($"id" % 2 === 0, "en").otherwise("fr").as("lang"), $"id").coalesce(1),
      root2, statsCols = Seq("lang", "id"))
    assert(Snapshots.countWhere(spark, root2, col("lang") === "en") === 50L)
  }
}
