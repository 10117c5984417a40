package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** METADATA DELETE (round 16): a `deleteWhere` predicate that provably
  * matches EVERY row of a file (the mined conjuncts' full-acceptance set —
  * recorded bounds inside the band, zero recorded nulls) drops that file
  * from the manifest without scanning, vectoring, or rewriting it. The
  * retention shape at 100 TB: `DELETE WHERE day < cutoff` over a
  * day-laid-out table touches O(manifest), not the expiring region's
  * bytes.
  *
  * Pins:
  *  - an aligned delete is PURELY metadata: zero data I/O, proven by
  *    physically deleting the doomed files' bytes FIRST — the delete
  *    still succeeds and reads stay exact;
  *  - a misaligned delete mixes: interior files drop, the boundary file
  *    vectors (or rewrites past the cap), results row-exact either way;
  *  - nulls in the predicate column block full acceptance (SQL DELETE
  *    keeps cond-NULL rows — dropping the file would erase them);
  *  - an existing DV does not block a drop (live rows ⊆ all rows);
  *  - time travel still sees dropped rows; the snapshot model holds.
  */
class MetadataDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("mdel").toString + "/t"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 8 range-disjoint 100-wide files over ids [0, 800). */
  private def build(): String = {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 800).select($"id",
        when($"id" % 5 === 0, lit(null)).otherwise($"id").as("v")),
      root, statsCols = Seq("id", "v"))
    root
  }

  private def ids(root: String): Set[Long] =
    Snapshots.read(spark, root).select("id").as[Long].collect().toSet

  test("an aligned retention delete drops files with zero data I/O") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 800).toDF("id").repartitionByRange(8, $"id"),
      root, statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1L)
    assert(m1.files.size === 8)
    // destroy the doomed region's BYTES first: a metadata delete never
    // opens them, so this only fails if something scans
    val doomed = m1.files.filter { u =>
      val s = m1.stats.find(x => x.file == new Path(u).getName && x.col == "id").get
      s.max < 300
    }
    assert(doomed.size === 3)
    doomed.foreach(u => assert(fs(root).delete(new Path(u), false)))
    val v2 = Snapshots.deleteWhere(spark, root, col("id") < 300)
    assert(v2 === 2L)
    val m2 = Snapshots.manifest(spark, root, v2)
    assert(m2.files.size === 5, "three fully-matching files must drop")
    assert(m2.dvs.isEmpty, "an aligned delete needs no vectors")
    assert(ids(root) === (300L until 800L).toSet)
  }

  test("a misaligned delete drops interior files and vectors the boundary") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 800).toDF("id").repartitionByRange(8, $"id"),
      root, statsCols = Seq("id"))
    val before = Snapshots.manifest(spark, root, 1L).files.toSet
    val v2 = Snapshots.deleteWhere(spark, root, col("id") < 250)
    val m2 = Snapshots.manifest(spark, root, v2)
    assert(m2.files.size === 6, "files [0,99] and [100,199] must drop")
    assert(m2.files.toSet.subsetOf(before), "no rewrite: no new files")
    assert(m2.dvs.map(_.deleted).sum === 50L, "boundary file vectors 50 rows")
    assert(ids(root) === (250L until 800L).toSet)
  }

  test("nulls in the predicate column block the drop; null rows survive") {
    val root = build() // v = null on multiples of 5, else id
    val v2 = Snapshots.deleteWhere(spark, root, col("v") < 300)
    val m2 = Snapshots.manifest(spark, root, v2)
    // no file may drop: every file holds cond-NULL rows that must survive
    assert(m2.files.size === Snapshots.manifest(spark, root, 1L).files.size)
    val got = Snapshots.read(spark, root).select("id").as[Long].collect().toSet
    val want = (0L until 800L).filterNot(i => i % 5 != 0 && i < 300).toSet
    assert(got === want)
  }

  test("an existing deletion vector does not block a full-match drop") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).toDF("id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    val v2 = Snapshots.deleteWhere(spark, root, col("id") % 10 === 7) // vectors
    assert(Snapshots.manifest(spark, root, v2).dvs.nonEmpty)
    val v3 = Snapshots.deleteWhere(spark, root, col("id") < 200)
    val m3 = Snapshots.manifest(spark, root, v3)
    assert(m3.files.size === 2, "both fully-covered files drop, DV'd or not")
    assert(m3.dvs.forall(d => m3.files.exists(u => new Path(u).getName == d.file)),
      "dropped files' vectors must not linger in the manifest")
    assert(ids(root) === (200L until 400L).filterNot(_ % 10 == 7).toSet)
  }

  test("a string-keyed partition drop is metadata-only (lang = 'de')") {
    val root = tmp()
    Seq("de", "en", "fr").zipWithIndex.foreach { case (l, i) =>
      Snapshots.commit(
        spark.range(0, 100).select(lit(l).as("lang"), ($"id" + i * 1000).as("id"))
          .repartition(2),
        root, append = i > 0, statsCols = Seq("lang", "id"))
    }
    val m1 = Snapshots.manifest(spark, root, 3L)
    // destroy the doomed partition's BYTES first: the drop must not scan
    val doomed = m1.files.filter { u =>
      m1.stats.exists(s => s.file == new Path(u).getName && s.col == "lang" &&
        s.slo == "de" && s.shi == "de")
    }
    assert(doomed.size === 2)
    doomed.foreach(u => assert(fs(root).delete(new Path(u), false)))
    val v = Snapshots.deleteWhere(spark, root, col("lang") === "de")
    val m = Snapshots.manifest(spark, root, v)
    assert(m.files.size === 4 && m.dvs.isEmpty,
      "the single-valued 'de' files must drop as metadata")
    assert(ids(root) === ((1000L until 1100L) ++ (2000L until 2100L)).toSet)
  }

  test("a LIKE-prefix delete drops whole single-prefix files") {
    val root = tmp()
    Seq("web-a", "web-b", "img-a").zipWithIndex.foreach { case (src, i) =>
      Snapshots.commit(
        spark.range(0, 50).select(lit(src).as("source"), ($"id" + i * 100).as("id"))
          .coalesce(1),
        root, append = i > 0, statsCols = Seq("source", "id"))
    }
    val v = Snapshots.deleteWhere(spark, root, col("source").startsWith("web-"))
    val m = Snapshots.manifest(spark, root, v)
    assert(m.files.size === 1 && m.dvs.isEmpty,
      s"both web-* files must drop as metadata, got ${m.files.size}")
    assert(ids(root) === (200L until 250L).toSet)
  }

  test("a file fully deleted by SCAN (stats can't prove it) drops instead of carrying a 100% vector") {
    val root = tmp()
    // one file per src value, stats on src ONLY — a predicate on id can
    // never full-accept from metadata, so the delete must scan and mark
    Seq("a" -> (0L, 100L), "b" -> (100L, 200L)).zipWithIndex.foreach {
      case ((s, (lo, hi)), i) =>
        Snapshots.commit(
          spark.range(lo, hi).select(lit(s).as("src"), $"id").coalesce(1),
          root, append = i > 0, statsCols = Seq("src"))
    }
    // every row of file 'b' matches; maxDvFraction=1.0 means the fraction
    // cap alone would KEEP a 100% vector — the fully-dead check must drop
    // the file from the manifest instead
    val v = Snapshots.deleteWhere(spark, root, col("id") >= 100L,
      maxDvFraction = 1.0)
    val m = Snapshots.manifest(spark, root, v)
    assert(m.files.size === 1, "the fully-deleted file must leave the manifest")
    assert(m.dvs.isEmpty, "no full-cardinality vector may linger")
    assert(ids(root) === (0L until 100L).toSet)
    // and the grouped metadata aggregate sees no phantom 'b' group
    val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
      .option("root", root).load()
      .groupBy("src").count()
    assert(q.as[(String, Long)].collect().toSeq === Seq(("a", 100L)))
  }

  test("a partially fully-dead delete drops only the dead file, vectors the rest") {
    val root = tmp()
    Seq("a" -> (0L, 100L), "b" -> (100L, 200L), "c" -> (200L, 300L))
      .zipWithIndex.foreach { case ((s, (lo, hi)), i) =>
        Snapshots.commit(
          spark.range(lo, hi).select(lit(s).as("src"), $"id").coalesce(1),
          root, append = i > 0, statsCols = Seq("src"))
      }
    // kills all of 'b', half of 'c', none of 'a' — scan path throughout
    val v = Snapshots.deleteWhere(spark, root,
      col("id") >= 100L && col("id") < 250L, maxDvFraction = 1.0)
    val m = Snapshots.manifest(spark, root, v)
    assert(m.files.size === 2, "only the fully-dead 'b' file drops")
    assert(m.dvs.map(_.deleted).sum === 50L, "'c' vectors its 50 dead rows")
    assert(ids(root) === ((0L until 100L) ++ (250L until 300L)).toSet)
  }

  test("a wide delete fans out: vectors written by the job as pure-DV shards, no driver bitmaps") {
    // above MarkedDeleteFanout the marking job classifies, merges, and
    // serializes the vectors itself (one pure-DV shard per partition,
    // committed by reference) — the driver never holds a bitmap. The spec
    // drops the threshold to force the path on a 12-file table and then
    // drives every later interaction a fan-out vector can have: a second
    // fan-out delete must SUPERSEDE the first shard's entries (no
    // duplicate vectors per file), a full-file kill must DROP the file
    // and retire its shard-held vector, and time travel still sees
    // everything.
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 1200).toDF("id").repartitionByRange(12, $"id"),
      root, statsCols = Seq("id"))
    val prev = Snapshots.MarkedDeleteFanout
    Snapshots.MarkedDeleteFanout = 4
    try {
      // % is opaque to the miner → every file scans → 12 > 4 → fan-out
      val v2 = Snapshots.deleteWhere(spark, root, col("id") % 10 === 7)
      val m2 = Snapshots.manifest(spark, root, v2)
      assert(m2.files.size === 12 && m2.dvs.size === 12)
      assert(m2.dvs.map(_.deleted).sum === 120L)
      val meta2 = Snapshots.manifestMeta(spark, root, v2)
      assert(meta2.shardRefs.exists(_.n == 0L),
        "fan-out vectors must land in pure-DV shards committed by reference")
      assert(ids(root) === (0L until 1200L).filterNot(_ % 10 == 7).toSet)
      // second fan-out delete: merged vectors, no duplicate entries
      val v3 = Snapshots.deleteWhere(spark, root, col("id") % 10 === 3)
      val m3 = Snapshots.manifest(spark, root, v3)
      assert(m3.dvs.map(_.deleted).sum === 240L)
      assert(m3.dvs.map(_.file).distinct.size === m3.dvs.size,
        "a superseded pure-DV shard entry must not coexist with its replacement")
      assert(ids(root) ===
        (0L until 1200L).filterNot(i => i % 10 == 7 || i % 10 == 3).toSet)
      // kill the last file entirely (80 live rows + 20 vectored = all 100):
      // the fan-out drop path — file leaves the manifest, vector retires
      val v4 = Snapshots.deleteWhere(spark, root, (col("id") >= 1100L) === lit(true))
      val m4 = Snapshots.manifest(spark, root, v4)
      assert(m4.files.size === 11, "the fully-dead file must drop under fan-out")
      assert(m4.dvs.forall(d => m4.files.exists(u => new Path(u).getName == d.file)),
        "a dropped file's shard-held vector must not linger")
      assert(ids(root) ===
        (0L until 1100L).filterNot(i => i % 10 == 7 || i % 10 == 3).toSet)
      // history: the pre-delete snapshot still reads complete
      assert(Snapshots.read(spark, root, 1).count() === 1200L)
    } finally Snapshots.MarkedDeleteFanout = prev
  }

  test("time travel still sees dropped rows; SQL DELETE routes the same path") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).toDF("id").repartitionByRange(4, $"id"),
      root, statsCols = Seq("id"))
    val v2 = Snapshots.deleteWhere(spark, root, col("id") < 100)
    assert(Snapshots.manifest(spark, root, v2).files.size === 3)
    assert(Snapshots.read(spark, root, 1).count() === 400L)
    // the SQL surface drops through the same metadata path
    spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
    spark.sql(s"DELETE FROM graft.`$root` WHERE id < 200")
    val h = Snapshots.headVersion(spark, root)
    val mh = Snapshots.manifest(spark, root, h)
    assert(mh.files.size === 2 && mh.dvs.isEmpty,
      s"SQL DELETE must drop the second file too, got ${mh.files.size} files")
    assert(ids(root) === (200L until 400L).toSet)
  }

  test("DELETE WHERE c IS NULL drops all-null files as metadata; countWhere answers") {
    // round 19 (the Catalyst face of null-ness mining): a null-partitioned
    // layout — all-null files tombstoned, populated files with exact
    // zero-null counts — makes `c IS NULL` fully decidable from metadata:
    // the delete drops the all-null files without opening them, and
    // countWhere answers without a scan.
    val root = tmp()
    Snapshots.commit(spark.range(0, 100)
      .select($"id", lit(null).cast("long").as("v")).coalesce(1),
      root, statsCols = Seq("id", "v"))
    Snapshots.commit(spark.range(100, 300)
      .select($"id", $"id".as("v")).coalesce(1),
      root, append = true, statsCols = Seq("id", "v"))
    val m2 = Snapshots.manifest(spark, root, 2L)
    assert(m2.tombs.exists(t => t.col == "v" && t.nulls == 100L),
      s"the all-null file must tombstone, tombs=${m2.tombs}")
    // countWhere: both sides answer from metadata — prove it by
    // destroying every data byte first
    m2.files.foreach(u => assert(fs(root).delete(new Path(u), false)))
    assert(Snapshots.countWhere(spark, root, col("v").isNull) === 100L)
    assert(Snapshots.countWhere(spark, root, col("v").isNotNull) === 200L)
    val v3 = Snapshots.deleteWhere(spark, root, col("v").isNull)
    assert(v3 === 3L)
    val m3 = Snapshots.manifest(spark, root, v3)
    assert(m3.files.size === 1 && m3.dvs.isEmpty,
      s"the all-null file must drop as metadata, got ${m3.files.size} files")
    // and the complement: IS NOT NULL fully accepts the zero-null file
    val v4 = Snapshots.deleteWhere(spark, root, col("v").isNotNull)
    assert(Snapshots.manifest(spark, root, v4).files.isEmpty,
      "IS NOT NULL must drop the zero-null file as metadata")
  }
}
