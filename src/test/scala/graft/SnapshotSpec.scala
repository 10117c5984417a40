package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.engine.Snapshots

/** Snapshot-manifest layer: atomic commits, time travel, optimistic
  * concurrency, reader-safe compaction, explicit vacuum.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("snap").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  test("commit/read round-trip; append and overwrite are distinct histories") {
    val root = tmp()
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    assert(v1 === 1L)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b")))

    val v2 = Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), root, append = true)
    assert(v2 === 2L)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b"), (3L, "c")))

    val v3 = Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), root) // overwrite
    assert(v3 === 3L)
    assert(rows(Snapshots.read(spark, root)) === Set((9L, "z")))

    // time travel: every prior version still reads its exact state
    assert(rows(Snapshots.read(spark, root, 1)) === Set((1L, "a"), (2L, "b")))
    assert(rows(Snapshots.read(spark, root, 2)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(Snapshots.history(spark, root).map(_.version) === Seq(1L, 2L, 3L))
    assert(Snapshots.history(spark, root).map(_.parent) === Seq(0L, 1L, 2L))
  }

  test("racing committers both land, on distinct consecutive versions") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "base")).toDF("id", "s"), root)
    // two appends race for version 2; the exclusive manifest create is the
    // arbiter — the loser must observe the winner and re-commit on top
    val a = Future(Snapshots.commit(Seq((2L, "a")).toDF("id", "s"), root, append = true))
    val b = Future(Snapshots.commit(Seq((3L, "b")).toDF("id", "s"), root, append = true))
    val got = Set(Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(got === Set(2L, 3L), s"racers took versions $got")
    // serialized history: head contains base + BOTH appends exactly once
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "base"), (2L, "a"), (3L, "b")))
  }

  test("compaction rewrites the head but never a pinned reader's files") {
    val root = tmp()
    Snapshots.commit(spark.range(0, 100).select($"id", $"id".cast("string").as("s"))
      .repartition(8), root)
    Snapshots.commit(spark.range(100, 200).select($"id", $"id".cast("string").as("s"))
      .repartition(8), root, append = true)
    val before = Snapshots.manifest(spark, root, 2)
    assert(before.files.size >= 16, "fixture should be fragmented")

    val v = Snapshots.compact(spark, root, targetFiles = 1)
    assert(v === 3L)
    val after = Snapshots.manifest(spark, root, v)
    assert(after.files.size === 1, "head not compacted to one file")
    assert(Snapshots.read(spark, root).count() === 200)
    // the pinned version's files are all still on disk and readable
    assert(Snapshots.read(spark, root, 2).count() === 200)
    assert(Snapshots.manifest(spark, root, 2).files === before.files)
  }

  test("manifest column stats prune the file list for range reads") {
    val root = tmp()
    // range-cluster id so each of the 8 files covers a tight disjoint band
    val df = spark.range(0, 800)
      .select($"id", ($"id" % 7).as("x"))
      .repartitionByRange(8, $"id")
      .sortWithinPartitions("id")
    Snapshots.commit(df, root, statsCols = Seq("id"))

    val m = Snapshots.manifest(spark, root, 1)
    assert(m.files.size === 8)
    assert(m.stats.count(_.col == "id") === 8, "one id range per file expected")

    // a 100-wide band overlaps 1-2 of the 8 range-clustered files
    val cand = Snapshots.candidateFiles(m, "id", 250, 349)
    assert(cand.size <= 2, s"pruning kept ${cand.size} of 8 files")
    // pruned read ≡ full-scan filter, exactly
    val pruned = Snapshots.readRange(spark, root, "id", 250, 349)
      .select("id").as[Long].collect().sorted
    assert(pruned.toSeq === (250L to 349L))
    // a band outside every file's range reads nothing (and plans no files)
    assert(Snapshots.candidateFiles(m, "id", 5000, 6000).isEmpty)
    assert(Snapshots.readRange(spark, root, "id", 5000, 6000).count() === 0)
    // stats survive the manifest round-trip through append and compaction
    Snapshots.commit(spark.range(800, 900).select($"id", ($"id" % 7).as("x")),
      root, append = true, statsCols = Seq("id"))
    val m2 = Snapshots.manifest(spark, root, 2)
    assert(m2.stats.size === m2.files.size, "append lost inherited or new stats")
    assert(m2.stats.size > m.stats.size)
    val v3 = Snapshots.compact(spark, root, targetFiles = 2, statsCols = Seq("id"))
    val m3 = Snapshots.manifest(spark, root, v3)
    assert(m3.stats.nonEmpty && m3.stats.forall(s => m3.files.exists(_.endsWith(s.file))),
      "compaction must re-collect stats for the rewritten files")
  }

  test("merge rewrites only the files the batch's key range can touch") {
    val root = tmp()
    val base = spark.range(0, 800)
      .select($"id", org.apache.spark.sql.functions.lit("old").as("s"))
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Snapshots.commit(base, root, statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1)
    assert(m1.files.size === 8)

    // upsert 10 contiguous keys: their range overlaps 1-2 of the 8
    // range-clustered files — everything else must carry over BY REFERENCE
    val batch = spark.range(100, 110)
      .select($"id", org.apache.spark.sql.functions.lit("new").as("s"))
    val v = Snapshots.merge(batch, root, "id", statsCols = Seq("id"))
    assert(v === 2L)
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6, s"only ${carried.size} of 8 files carried untouched")
    assert(carried.size < 8, "no file was rewritten — upsert lost?")

    val got = Snapshots.read(spark, root).as[(Long, String)].collect()
    assert(got.length === 800, "merge changed the row count")
    assert(got.filter(_._2 == "new").map(_._1).toSet === (100L to 109L).toSet)
    // pinned history: the pre-merge state is untouched
    assert(Snapshots.read(spark, root, 1).filter($"s" === "new").count() === 0)
    // the stats index survives: every head file (carried + rewritten) has a range
    val statFiles = m2.stats.map(_.file).toSet
    val headFiles = m2.files.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(statFiles === headFiles, "merge dropped or orphaned file stats")
  }

  test("delete rewrites only overlapping files; misses are true no-ops; CDC sees D rows") {
    val root = tmp()
    val base = spark.range(0, 800)
      .select($"id", ($"id" % 5).as("g"))
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Snapshots.commit(base, root, statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1)
    assert(m1.files.size === 8)

    // delete 10 contiguous keys: their range overlaps 1-2 of the 8
    // range-clustered files — everything else must carry over BY REFERENCE
    val v2 = Snapshots.delete(
      spark.range(100, 110).select($"id"), root, "id", statsCols = Seq("id"))
    assert(v2 === 2L)
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6, s"only ${carried.size} of 8 files carried untouched")
    assert(carried.size < 8, "no file was rewritten — delete lost?")
    val ids = Snapshots.read(spark, root).select("id").as[Long].collect().toSet
    assert(ids.size === 790 && (100L to 109L).forall(!ids.contains(_)))
    // history pins the pre-delete state (erasure completes at vacuum time)
    assert(Snapshots.read(spark, root, 1).count() === 800)
    // stats index stays consistent across carried + rewritten files
    val statFiles = m2.stats.map(_.file).toSet
    val headFiles = m2.files.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(statFiles === headFiles, "delete dropped or orphaned file stats")

    // CDC between the two versions: exactly the deleted rows, all 'D'
    val ch = Snapshots.changes(spark, root, 1, 2)
      .select($"_op", $"id").as[(String, Long)].collect().toSet
    assert(ch === (100L until 110L).map(("D", _)).toSet)

    // a delete whose key range overlaps no file: no new version at all
    assert(Snapshots.delete(
      spark.range(5000, 5010).select($"id"), root, "id") === 2L)
    // and an empty key set likewise
    assert(Snapshots.delete(
      spark.range(0, 0).select($"id"), root, "id") === 2L)
  }

  test("changesTyped: NULL keys never pair — plain insert/delete, not update") {
    val root = tmp()
    // v1 and v2 each hold one null-key row and one key-1 row; the overwrite
    // puts both on both sides of the diff. Key 1 pairs (update_pre/post);
    // the NULL key must NOT pair — the CDC contract is key-join algebra,
    // where NULL matches nothing — so its rows stay plain delete/insert.
    Snapshots.commit(Seq((Option.empty[Long], "a"), (Some(1L), "x")).toDF("k", "s"), root)
    Snapshots.commit(Seq((Option.empty[Long], "b"), (Some(1L), "y")).toDF("k", "s"), root)
    val ch = Snapshots.changesTyped(spark, root, 1, 2, "k")
      .select($"k", $"s", $"_change").as[(Option[Long], String, String)]
      .collect().toSet
    assert(ch === Set(
      (None, "a", "delete"), (None, "b", "insert"),
      (Some(1L), "x", "update_pre"), (Some(1L), "y", "update_post")))
  }

  test("schema evolution: appended columns surface as nulls on old files, everywhere") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root, statsCols = Seq("id"))
    // the appending batch introduces column q — the manifest schema evolves,
    // old files fill q with null (no rewrite of v1's data)
    val v2 = Snapshots.commit(Seq((2L, "b", 9L)).toDF("id", "s", "q"), root,
      append = true, statsCols = Seq("id"))
    val head = Snapshots.read(spark, root)
    assert(head.columns.toSeq === Seq("id", "s", "q"))
    assert(head.select("id", "q").as[(Long, Option[Long])].collect().toSet ===
      Set((1L, None), (2L, Some(9L))))
    // time travel: v1 predates q and must NOT show it
    assert(Snapshots.read(spark, root, 1).columns.toSeq === Seq("id", "s"))

    // CDC across the evolution compares in the TARGET version's shape
    assert(Snapshots.changes(spark, root, 1, v2)
      .select($"_op", $"id", $"q").as[(String, Long, Option[Long])]
      .collect().toSet === Set(("I", 2L, Some(9L))))

    // merge with an evolving batch: survivors fill the new column
    Snapshots.merge(Seq((1L, "a2", 7L, true)).toDF("id", "s", "q", "flag"),
      root, key = "id", statsCols = Seq("id"))
    val afterMerge = Snapshots.read(spark, root)
      .select("id", "s", "q", "flag")
      .as[(Long, String, Option[Long], Option[Boolean])].collect().toSet
    assert(afterMerge === Set(
      (1L, "a2", Some(7L), Some(true)), (2L, "b", Some(9L), None)))

    // a same-name column with a DIFFERENT type is a hard error
    intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((3L, 5.5)).toDF("id", "s"), root, append = true)
    }
  }

  test("z-order compaction tightens the stats index: band reads prune to a sliver") {
    val root = tmp()
    // four appends, EACH spanning the full (x, y) range — the worst-case
    // accumulated layout: every file's recorded range covers everything,
    // so a band read can prune nothing
    (0 until 4).foreach { i =>
      val batch = spark.range(i * 1000, (i + 1) * 1000)
        .select($"id", ($"id" % 100).as("x"), (($"id" * 7) % 100).as("y"))
      Snapshots.commit(batch, root, append = true, statsCols = Seq("x", "y"))
    }
    val m1 = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(Snapshots.candidateFiles(m1, "x", 10, 19).size === m1.files.size,
      "pre-compaction: every file should span the band")
    val before = Snapshots.readRange(spark, root, "x", 10, 19)
      .select("id").as[Long].collect().toSet

    val v = Snapshots.compactZOrder(spark, root, dims = Seq("x", "y"), targetFiles = 8)
    val m2 = Snapshots.manifest(spark, root, v)
    assert(m2.files.size === 8)
    val cand = Snapshots.candidateFiles(m2, "x", 10, 19)
    assert(cand.size < m2.files.size,
      s"z-order compaction did not tighten x ranges (${cand.size} of ${m2.files.size} files)")
    // the rewrite is layout-only: the band read returns identical rows
    assert(Snapshots.readRange(spark, root, "x", 10, 19)
      .select("id").as[Long].collect().toSet === before)
    assert(Snapshots.read(spark, root).count() === 4000)
  }

  test("streaming snapshot sink: one atomic commit per batch, replays are no-ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = Files.createTempDirectory("snapsink").toString
    val root = s"file:$base/table"
    val q = graft.streaming.SnapshotSink.start(
      input.toDF().toDF("id", "s"), root, s"$base/ckpt")
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val hist = Snapshots.history(spark, root)
    assert(hist.map(_.tag) === Seq("batch-0", "batch-1"), s"got ${hist.map(_.tag)}")
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel: the table's states are exactly the batch boundaries
    assert(rows(Snapshots.read(spark, root, 1)) === Set((1L, "a"), (2L, "b")))

    // a restart replaying batch 1 (at-least-once delivery) must not
    // double-ingest: the tag makes the replay an observable no-op
    val replay = Snapshots.commitIfAbsent(
      Seq((3L, "c")).toDF("id", "s"), root, tag = "batch-1")
    assert(replay.isEmpty, "replayed batch was committed twice")
    assert(Snapshots.headVersion(spark, root) === 2L)
    assert(Snapshots.read(spark, root).count() === 3)
  }

  test("scattered keys prune by per-file membership, not the global key range") {
    val root = tmp()
    // 8 range-clustered files, each covering ~100 contiguous ids
    Snapshots.commit(
      spark.range(0, 800).select($"id", ($"id" % 9).as("x"))
        .repartitionByRange(8, $"id").sortWithinPartitions("id"),
      root, statsCols = Seq("id"))
    // three ids scattered across the table: their global range [50, 650]
    // overlaps ~7 of the 8 files, but each id lives in exactly one file —
    // per-file set membership must touch only those 3
    val v = Snapshots.delete(Seq(50L, 350L, 650L).toDF("id"), root, "id",
      statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1)
    val m2 = Snapshots.manifest(spark, root, v)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size === 5,
      s"expected exactly 3 of 8 files rewritten, carried ${carried.size}")
    assert(Snapshots.read(spark, root).count() === 797)
    assert(Snapshots.read(spark, root).filter($"id".isin(50L, 350L, 650L)).isEmpty)
  }

  test("restore rolls back as history: new head = old files, CDC inverts the bad commit") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    Snapshots.commit(Seq((3L, "bad")).toDF("id", "s"), root, append = true) // v2: regretted
    val v3 = Snapshots.restore(spark, root, 1)
    assert(v3 === 3L)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b")))
    // the rollback is itself history: v2 still reads, and CDC v2→v3 is the
    // exact inverse of the bad append
    assert(rows(Snapshots.read(spark, root, 2)) === Set((1L, "a"), (2L, "b"), (3L, "bad")))
    assert(Snapshots.changes(spark, root, 2, 3)
      .select($"_op", $"id").as[(String, Long)].collect().toSet === Set(("D", 3L)))
    // appends continue on the restored line
    Snapshots.commit(Seq((4L, "c")).toDF("id", "s"), root, append = true)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b"), (4L, "c")))
  }

  test("vacuumOrphans removes aborted-commit debris, never live or in-flight files") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an aborted commit: files landed under data/, manifest never
    // published — invisible to readers, but leaked on disk
    val orphanDir = s"$root/data/c-orphan1"
    Seq((9L, "z")).toDF("id", "s").write.parquet(orphanDir)
    // age the orphan past the grace window
    f.listStatus(new org.apache.hadoop.fs.Path(orphanDir)).foreach { st =>
      f.setTimes(st.getPath, System.currentTimeMillis() - 7200000L, -1)
    }
    // a second, FRESH orphan models a commit in flight right now
    Seq((8L, "y")).toDF("id", "s").write.parquet(s"$root/data/c-orphan2")

    val n = Snapshots.vacuumOrphans(spark, root, graceMs = 3600000L)
    assert(n >= 1, "aged orphan files not removed")
    assert(!f.exists(new org.apache.hadoop.fs.Path(orphanDir)),
      "emptied orphan commit dir should be removed")
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/data/c-orphan2")),
      "in-flight (fresh) files must survive the grace window")
    // the committed table is untouched and still reads
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
  }

  test("vacuum deletes only what no retained manifest references") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "old")).toDF("id", "s"), root)
    Snapshots.commit(Seq((2L, "new")).toDF("id", "s"), root) // overwrite: v1 files now head-unreferenced
    Snapshots.commit(Seq((3L, "newer")).toDF("id", "s"), root, append = true) // v3 shares v2's files
    val v1Files = Snapshots.manifest(spark, root, 1).files
    val v3Files = Snapshots.manifest(spark, root, 3).files

    Snapshots.vacuum(spark, root, keepLast = 1)
    assert(Snapshots.history(spark, root).map(_.version) === Seq(3L))
    // v1's data is gone, v3's (including the files it inherited from v2) intact
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    v1Files.foreach(f =>
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(f)), s"vacuum left $f"))
    v3Files.foreach(f =>
      assert(fsys.exists(new org.apache.hadoop.fs.Path(f)), s"vacuum destroyed live $f"))
    assert(rows(Snapshots.read(spark, root)) === Set((2L, "new"), (3L, "newer")))
    // destroyed history reads fail loudly, not with a half-dataset
    intercept[IllegalArgumentException](Snapshots.read(spark, root, 1))
  }

  // ---- sharded-manifest scale pins: commit metadata is O(batch), never ----
  // ---- O(table files) — the property that keeps the driver alive at    ----
  // ---- 1M-file tables (a ~100 MB inline json per commit otherwise)     ----

  private def snapDirFiles(root: String): Map[String, Long] = {
    val dir = new java.io.File(root.stripPrefix("file:") + "/_snapshots")
    dir.listFiles().filter(_.isFile).map(f => f.getName -> f.length()).toMap
  }

  private def readMeta(root: String, v: Long): String =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(root.stripPrefix("file:") + s"/_snapshots/manifest-$v.json")),
      "UTF-8")

  test("append commit writes O(batch) metadata: one shard + a ref-only manifest") {
    val root = tmp()
    val nCommits = 25
    (1 to nCommits).foreach { i =>
      Snapshots.commit(
        spark.range(i * 100L, i * 100L + 100L).select($"id", ($"id" % 7).as("x"))
          .repartition(2),
        root, append = true, statsCols = Seq("id"))
    }
    val metas = snapDirFiles(root)
    // the manifest inlines NO data-file URI and NO stats — refs only
    val lastManifest = readMeta(root, nCommits)
    assert(!lastManifest.contains(".parquet"), "manifest inlines data-file URIs")
    assert(!lastManifest.contains("\"min\""), "manifest inlines ColStats")
    // per-commit manifest growth is one ~60-byte shard ref, not a file list
    val growth = readMeta(root, nCommits).length - readMeta(root, nCommits - 1).length
    assert(growth < 150, s"manifest grew $growth bytes for a 2-file append")
    // the commit's metadata write (its manifest + its one new shard) is a
    // sliver of the table's total metadata — the O(batch) vs O(table) pin.
    // Resolve the new shard as the ref in manifest N but not manifest N-1.
    val refRe = """shard-[0-9a-f]+\.json""".r
    val prevRefs = refRe.findAllIn(readMeta(root, nCommits - 1)).toSet
    val newRefs = refRe.findAllIn(lastManifest).toSet -- prevRefs
    assert(newRefs.size === 1, s"append should add exactly one shard, got $newRefs")
    val commitBytes = lastManifest.length + metas(newRefs.head)
    val tableMetaBytes = metas.filterKeys(_.startsWith("shard-")).values.sum
    assert(commitBytes < tableMetaBytes / 5,
      s"commit wrote $commitBytes metadata bytes vs table total $tableMetaBytes — not O(batch)")
    // resolution is unchanged: full read sees every row
    assert(Snapshots.read(spark, root).count() === nCommits * 100L)
    val m = Snapshots.manifest(spark, root, nCommits.toLong)
    assert(m.files.size === nCommits * 2)
    assert(m.stats.size === nCommits * 2, "per-file stats survive sharding")
  }

  test("merge carries untouched shards by reference; only overlapping shards rewrite") {
    val root = tmp()
    // 10 range-disjoint appends, 1 file each — tight per-shard key ranges
    (0 until 10).foreach { i =>
      Snapshots.commit(
        spark.range(i * 100L, i * 100L + 100L)
          .select($"id", org.apache.spark.sql.functions.lit("old").as("s"))
          .coalesce(1),
        root, append = true, statsCols = Seq("id"))
    }
    val refRe = """shard-[0-9a-f]+\.json""".r
    val beforeRefs = refRe.findAllIn(readMeta(root, 10)).toSet
    assert(beforeRefs.size === 10)
    // merge touches only the [300, 310) sliver: 1 shard overlaps
    val batch = spark.range(300L, 310L)
      .select($"id", org.apache.spark.sql.functions.lit("new").as("s"))
    Snapshots.merge(batch, root, key = "id", statsCols = Seq("id"))
    val afterRefs = refRe.findAllIn(readMeta(root, 11)).toSet
    val carried = beforeRefs.intersect(afterRefs)
    assert(carried.size === 9,
      s"expected 9 of 10 shards carried by reference, got ${carried.size}")
    // and the data is right
    val got = Snapshots.read(spark, root)
    assert(got.count() === 1000L)
    assert(got.filter($"s" === "new").count() === 10L)
  }

  test("compactManifests consolidates shards metadata-only: same files, same stats") {
    val root = tmp()
    (0 until 8).foreach { i =>
      Snapshots.commit(spark.range(i * 10L, i * 10L + 10L).select($"id", ($"id" * 2).as("x")),
        root, append = true, statsCols = Seq("id"))
    }
    val before = Snapshots.manifest(spark, root, 8)
    val v = Snapshots.compactManifests(spark, root)
    assert(v === 9L)
    val after = Snapshots.manifest(spark, root, v)
    // exactly the same table — file list, stats, schema — under one shard
    assert(after.files === before.files, "compactManifests must not move data")
    assert(after.stats.toSet === before.stats.toSet)
    assert(after.schema === before.schema)
    val refRe = """shard-[0-9a-f]+\.json""".r
    assert(refRe.findAllIn(readMeta(root, v)).toSet.size === 1)
    // idempotent: a single-shard head no-ops
    assert(Snapshots.compactManifests(spark, root) === v)
  }

  test("vacuum reclaims metadata shards no retained manifest references") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "old")).toDF("id", "s"), root)
    Snapshots.commit(Seq((2L, "new")).toDF("id", "s"), root) // overwrite
    Snapshots.commit(Seq((3L, "newer")).toDF("id", "s"), root, append = true)
    assert(snapDirFiles(root).keys.count(_.startsWith("shard-")) === 3)
    // an IN-FLIGHT commit's shard: written, manifest not yet published.
    // vacuum must scope its reclaim to the DROPPED manifests' refs — an
    // unreferenced shard in the directory may be about to be published,
    // and deleting it would corrupt that commit the moment it lands
    val inflight = new java.io.File(
      root.stripPrefix("file:") + "/_snapshots/shard-00inflight00.json")
    Files.write(inflight.toPath, """{"stats":[],"files":[]}""".getBytes("UTF-8"))
    Snapshots.vacuum(spark, root, keepLast = 1)
    // v1's shard is unreferenced debris; v2's and v3's shards stay (head
    // references both — shard sharing across the append)
    assert(snapDirFiles(root).keys.count(_.startsWith("shard-")) === 3,
      "vacuum must keep the head's 2 shards AND the in-flight shard")
    assert(inflight.exists(), "vacuum destroyed an in-flight commit's shard")
    assert(rows(Snapshots.read(spark, root)) === Set((2L, "new"), (3L, "newer")))
  }

  test("shard-ref growth is bounded by default-on auto-compaction across a long commit lifecycle") {
    // no manual compactManifests call anywhere: the batch commit path's own
    // policy must keep every manifest's ref list bounded. 140 appends cross
    // the 64-ref threshold twice.
    val root = tmp()
    val n = 140
    (1 to n).foreach { i =>
      Snapshots.commit(Seq((i.toLong, s"r$i")).toDF("id", "s"), root, append = true)
    }
    val maxRefs = Snapshots.historyMeta(spark, root).map(_.shardRefs.size).max
    assert(maxRefs <= Snapshots.AutoCompactShardRefs + 1,
      s"manifest ref list reached $maxRefs — auto-compaction did not bound it")
    // compaction commits interleave with the appends in history
    assert(Snapshots.headVersion(spark, root) > n,
      "expected auto-compaction commits in the history")
    // and nothing was lost
    assert(Snapshots.read(spark, root).count() === n.toLong)
  }

  test("maintain() under one policy is equivalent to the manual verb sequence") {
    import graft.engine.{Maintain, MaintenancePolicy}
    def build(): String = {
      val root = tmp()
      Snapshots.commit(
        spark.range(0, 60).select($"id", ($"id" % 7).as("k")), root,
        statsCols = Seq("k"))
      Snapshots.commit(
        spark.range(60, 120).select($"id", ($"id" % 7).as("k")), root,
        append = true, statsCols = Seq("k"))
      root
    }
    val a = build(); val b = build()
    val policy = MaintenancePolicy(
      compactTargetFiles = 2, zorderDims = Seq("k"),
      vacuumKeepLast = 1, orphanGraceMs = 0L)
    val headA = Maintain.maintain(spark, a, policy)
    // the manual sequence maintain documents itself as equal to
    Snapshots.compactZOrder(spark, b, Seq("k"), targetFiles = 2)
    Snapshots.compactManifests(spark, b)
    Snapshots.vacuum(spark, b, keepLast = 1)
    Snapshots.vacuumOrphans(spark, b, graceMs = 0L)
    val headB = Snapshots.headVersion(spark, b)
    assert(headA === Snapshots.headVersion(spark, a))
    assert(headA === headB, "maintain took a different number of commits")
    // same retained history shape, same head content, same layout size
    def retained(r: String) = Snapshots.history(spark, r).map(_.version)
    assert(retained(a) === retained(b))
    val rowsA = Snapshots.read(spark, a).select("id").as[Long].collect().toSet
    assert(rowsA === Snapshots.read(spark, b).select("id").as[Long].collect().toSet)
    assert(Snapshots.manifest(spark, a, headA).files.size ===
      Snapshots.manifest(spark, b, headB).files.size)
  }

  test("row TTL policy: expired rows leave under maintain, fresh rows stay") {
    import graft.engine.{Maintain, MaintenancePolicy}
    val root = tmp()
    val now = System.currentTimeMillis()
    val old = now - 10 * 86400000L  // 10 days ago
    Snapshots.commit(
      Seq((1L, old), (2L, old + 1000L), (3L, now), (4L, now - 1000L))
        .toDF("id", "ts").repartitionByRange(2, $"ts"),
      root, statsCols = Seq("ts"))
    // 7-day retention: the two 10-day-old rows leave; the sweep is the
    // merge-on-read deleteWhere, so this is a metadata-sized commit
    Maintain.maintain(spark, root,
      MaintenancePolicy(rowTtlCol = "ts", rowTtlMs = 7 * 86400000L,
        statsCols = Seq("ts")))
    assert(Snapshots.read(spark, root).select("id").as[Long].collect().toSet ===
      Set(3L, 4L))
    // idempotent: nothing newly expired → no-op re-run
    val head = Snapshots.headVersion(spark, root)
    Maintain.maintain(spark, root,
      MaintenancePolicy(rowTtlCol = "ts", rowTtlMs = 7 * 86400000L,
        statsCols = Seq("ts")))
    assert(Snapshots.headVersion(spark, root) === head,
      "a TTL pass with nothing expired must not mint a version")
    // a non-temporal column type refuses loudly
    val root2 = tmp()
    Snapshots.commit(Seq((1L, "x")).toDF("id", "s"), root2)
    intercept[RuntimeException] {
      Maintain.maintain(spark, root2,
        MaintenancePolicy(rowTtlCol = "s", rowTtlMs = 0L))
    }
  }
}
