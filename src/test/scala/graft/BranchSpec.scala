package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.engine.{Branches, Snapshots}
import graft.operators.Expect
import org.apache.spark.sql.functions._

/** Write-audit-publish branches: zero-copy fork, isolated writes, audited
  * fast-forward publish, fencing against concurrent main commits, and
  * reference-safe vacuum across chains.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("branch").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def dataFiles(root: String): Set[String] = {
    val p = new Path(s"$root/data")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Set.empty
    else {
      val it = f.listFiles(p, true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(_.isFile).map(_.getPath.toString).toSet
    }
  }

  test("fork is zero-copy; branch and main are isolated; publish fast-forwards") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root,
      statsCols = Seq("id"))
    val before = dataFiles(root)

    assert(Branches.fork(spark, root, "staging") === 1L)
    // fork wrote manifests only — not one data file
    assert(dataFiles(root) === before)
    val bRoot = Branches.root(root, "staging")
    assert(rows(Snapshots.read(spark, bRoot)) === Set((1L, "a"), (2L, "b")))
    assert(Branches.list(spark, root) === Seq("staging"))
    assert(Branches.forkBase(spark, root, "staging") === 1L)

    // write on the branch: invisible to main
    Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), bRoot, append = true,
      statsCols = Seq("id"))
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b")))
    assert(rows(Snapshots.read(spark, bRoot)) === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // the full verb set works on the branch root: merge by key
    Snapshots.merge(Seq((2L, "B!")).toDF("id", "s"), bRoot, "id")
    assert(rows(Snapshots.read(spark, bRoot)) === Set((1L, "a"), (2L, "B!"), (3L, "c")))
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "b")))

    // publish: main atomically becomes the branch state, as a new version
    val filesBefore = dataFiles(root)
    val v = Branches.publish(spark, root, "staging")
    assert(v === 2L)
    assert(dataFiles(root) === filesBefore) // publish is metadata-only too
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "B!"), (3L, "c")))
    // history records the publish; time travel to the pre-publish state works
    assert(Snapshots.manifestMeta(spark, root, v).tag === "publish:staging")
    assert(rows(Snapshots.read(spark, root, 1)) === Set((1L, "a"), (2L, "b")))

    Branches.drop(spark, root, "staging")
    assert(Branches.list(spark, root) === Seq.empty)
    // main still reads fine after the drop (files are shared, not branch-owned)
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "B!"), (3L, "c")))
  }

  test("publishRebase lands an append-only branch onto an advanced main") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root, statsCols = Seq("id"))
    Branches.fork(spark, root, "feed")
    val bRoot = Branches.root(root, "feed")
    Snapshots.commit(Seq((2L, "branch")).toDF("id", "s"), bRoot, append = true,
      statsCols = Seq("id"))
    // main advances concurrently: an append AND a row merge on base data
    Snapshots.commit(Seq((3L, "main")).toDF("id", "s"), root, append = true,
      statsCols = Seq("id"))
    Snapshots.merge(Seq((1L, "A!")).toDF("id", "s"), root, "id")

    val v = Branches.publishRebase(spark, root, "feed")
    assert(v === Snapshots.headVersion(spark, root))
    // result = main's current state + the branch's additions
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "A!"), (2L, "branch"), (3L, "main")))

    // a replayed rebase adds nothing twice
    Branches.publishRebase(spark, root, "feed")
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "A!"), (2L, "branch"), (3L, "main")))

    // a branch that MODIFIED base data cannot rebase over a main that
    // ADDED rows (serial replay of the branch's merge might have touched
    // them — file identity cannot decide, so it refuses)
    Branches.fork(spark, root, "mut")
    Snapshots.merge(Seq((3L, "MUT")).toDF("id", "s"),
      Branches.root(root, "mut"), "id")
    Snapshots.commit(Seq((9L, "x")).toDF("id", "s"), root, append = true,
      statsCols = Seq("id"))
    val e = intercept[IllegalArgumentException](
      Branches.publishRebase(spark, root, "mut"))
    assert(e.getMessage.contains("re-fork and replay"))
  }

  // ---- round 10: rebase beyond append-only (file-level disjointness) ----

  /** ids 1..40 in two range files [1..20][21..40], v = id*10. */
  private def rangeTable(): String = {
    val root = tmp()
    Snapshots.commit(
      spark.range(1, 41).select($"id", ($"id" * 10L).as("v"))
        .repartitionByRange(2, $"id"),
      root, statsCols = Seq("id"))
    root
  }

  private def kv(root: String): Map[Long, Long] =
    Snapshots.read(spark, root).as[(Long, Long)].collect().toMap

  test("a branch that MERGED base data rebases over main layout maintenance") {
    val root = rangeTable()
    Branches.fork(spark, root, "upd")
    val bRoot = Branches.root(root, "upd")
    // branch rewrites the LOW file (merge key 5) — no longer append-only
    Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), bRoot, "id",
      statsCols = Seq("id"))
    // main meanwhile compacts the HIGH file: row-preserving, file-disjoint
    Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)

    val v = Branches.publishRebase(spark, root, "upd")
    assert(v === Snapshots.headVersion(spark, root))
    val got = kv(root)
    assert(got(5L) === -50L, "the branch's merge was lost")
    assert(got(30L) === 300L && got.size === 40,
      "main's compacted rows must survive the rebase")
  }

  test("a branch merge refuses to rebase over a main ROW change, even disjoint") {
    val root = rangeTable()
    Branches.fork(spark, root, "upd")
    Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"),
      Branches.root(root, "upd"), "id", statsCols = Seq("id"))
    // main merges a key in the OTHER file — files disjoint, but replaying
    // the branch's merge serially might have seen main's new rows
    Snapshots.merge(Seq((30L, -300L)).toDF("id", "v"), root, "id",
      statsCols = Seq("id"))
    val e = intercept[IllegalArgumentException](
      Branches.publishRebase(spark, root, "upd"))
    assert(e.getMessage.contains("row-preserving"))
  }

  test("both sides rewriting the SAME base file refuses the rebase") {
    val root = rangeTable()
    Branches.fork(spark, root, "upd")
    Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"),
      Branches.root(root, "upd"), "id", statsCols = Seq("id"))
    Snapshots.compactWhere(spark, root, $"id" <= 10L, targetFiles = 1)
    val e = intercept[IllegalArgumentException](
      Branches.publishRebase(spark, root, "upd"))
    assert(e.getMessage.contains("same base file"))
  }

  test("a branch that compacted + appended rebases over main row changes") {
    val root = rangeTable()
    Branches.fork(spark, root, "layout")
    val bRoot = Branches.root(root, "layout")
    // branch: row-preserving compaction of the high file, plus an append
    Snapshots.compactWhere(spark, bRoot, $"id" >= 25L, targetFiles = 1)
    Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), bRoot, append = true,
      statsCols = Seq("id"))
    // main: a genuine row change — on the file the branch did NOT touch
    Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
      statsCols = Seq("id"))

    Branches.publishRebase(spark, root, "layout")
    val got = kv(root)
    assert(got(5L) === -50L, "main's merge was lost")
    assert(got(100L) === 1000L, "the branch's append was lost")
    assert(got(30L) === 300L && got.size === 41)
  }

  test("branch deletion vectors carry onto the rebased head") {
    val root = rangeTable()
    Branches.fork(spark, root, "del")
    val bRoot = Branches.root(root, "del")
    // branch vector-deletes a high-file row (row-changing, metadata-only)
    Snapshots.deleteWhere(spark, root = bRoot, cond = $"id" === 30L)
    assert(Snapshots.manifest(spark, bRoot,
      Snapshots.headVersion(spark, bRoot)).dvs.nonEmpty)
    // main compacts the LOW file — row-preserving, disjoint
    Snapshots.compactWhere(spark, root, $"id" <= 10L, targetFiles = 1)

    Branches.publishRebase(spark, root, "del")
    val got = kv(root)
    assert(!got.contains(30L), "the branch's vectored delete was lost")
    assert(got.size === 39 && got(5L) === 50L)
    // the vector itself is carried in the rebased manifest
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.dvs.exists(_.deleted === 1L))
  }

  test("publish is fast-forward-only: a main commit after the fork fences it") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    Branches.fork(spark, root, "wap")
    Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), root, append = true) // main moves
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"),
      Branches.root(root, "wap"), append = true)
    val e = intercept[IllegalArgumentException](Branches.publish(spark, root, "wap"))
    assert(e.getMessage.contains("re-fork"))
    // nothing changed on main
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (9L, "z")))
    assert(Snapshots.headVersion(spark, root) === 2L)
  }

  test("publishIf: failing audit blocks the publish and reports; passing publishes") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    Branches.fork(spark, root, "wap")
    val bRoot = Branches.root(root, "wap")
    Snapshots.commit(Seq((2L, null.asInstanceOf[String])).toDF("id", "s"),
      bRoot, append = true)

    val gate = Seq(Expect.Rule("s_not_null", col("s").isNotNull))
    Branches.publishIf(spark, root, "wap", gate) match {
      case Left(report) =>
        val r = report.collect()
        assert(r.length === 1 && r(0).getAs[String]("rule") === "s_not_null"
          && r(0).getAs[Long]("n_violations") === 1L)
      case Right(v) => fail(s"published v$v past a failing audit")
    }
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"))) // untouched

    // repair on the branch, re-audit, publish
    Snapshots.merge(Seq((2L, "fixed")).toDF("id", "s"), bRoot, "id")
    Branches.publishIf(spark, root, "wap", gate) match {
      case Right(v) => assert(v === 2L)
      case Left(_) => fail("clean branch failed its audit")
    }
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "a"), (2L, "fixed")))
  }

  test("vacuum on main never destroys what a live branch references") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "old")).toDF("id", "s"), root)
    Branches.fork(spark, root, "keeper") // branch pins the v1 state
    Snapshots.commit(Seq((2L, "new")).toDF("id", "s"), root) // overwrite: v1 files dead on main
    Snapshots.vacuum(spark, root, keepLast = 1)
    // v1 is gone from main's history…
    assert(Snapshots.history(spark, root).map(_.version) === Seq(2L))
    // …but the branch still reads its full state: files AND shards survived
    assert(rows(Snapshots.read(spark, Branches.root(root, "keeper"))) ===
      Set((1L, "old")))

    // drop the branch: its files become orphans and only then get reclaimed
    Branches.drop(spark, root, "keeper")
    val n = Snapshots.vacuumOrphans(spark, root, graceMs = 0L)
    assert(n > 0, "dropped branch's files should be reclaimable")
    assert(rows(Snapshots.read(spark, root)) === Set((2L, "new")))
  }

  test("pendingChanges: the exact row diff a publish would make visible") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root,
      statsCols = Seq("id"))
    Branches.fork(spark, root, "wap")
    val bRoot = Branches.root(root, "wap")
    Snapshots.merge(Seq((2L, "B!"), (3L, "c")).toDF("id", "s"), bRoot, "id")

    val pend = Branches.pendingChanges(spark, root, "wap")
      .select("id", "s", "_op").as[(Long, String, String)].collect().toSet
    assert(pend === Set((2L, "b", "D"), (2L, "B!", "I"), (3L, "c", "I")))
    val typed = Branches.pendingChangesTyped(spark, root, "wap", "id")
      .select("id", "s", "_change").as[(Long, String, String)].collect().toSet
    assert(typed === Set((2L, "b", "update_pre"), (2L, "B!", "update_post"),
      (3L, "c", "insert")))
    // the diff is exactly what publish then makes visible
    Branches.publish(spark, root, "wap")
    assert(rows(Snapshots.read(spark, root)) ===
      Set((1L, "a"), (2L, "B!"), (3L, "c")))
  }

  test("the streaming layer composes with branch roots: sink in, stream out") {
    val base = java.nio.file.Files.createTempDirectory("branchstream").toString
    val root = s"file:$base/t"
    Snapshots.commit(Seq((1L, "seed")).toDF("id", "s"), root)
    Branches.fork(spark, root, "feed")
    val bRoot = Branches.root(root, "feed")

    // SnapshotSink lands a stream ON THE BRANCH — main never moves
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.SnapshotSink.start(
      input.toDF().toDF("id", "s"), bRoot, s"$base/ckpt_in")
    try {
      input.addData((2L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "seed")))

    // the DSv2 source tails the BRANCH's commit log
    val out = s"$base/out"
    val sq = spark.readStream.format("graft.streaming.SnapshotSourceProvider")
      .option("root", bRoot).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$base/ckpt_out").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(rows(spark.read.parquet(out)) === Set((1L, "seed"), (2L, "b")))

    // audited publish brings the streamed rows to main atomically
    Branches.publish(spark, root, "feed")
    assert(rows(Snapshots.read(spark, root)) === Set((1L, "seed"), (2L, "b")))
  }

  test("multi-table WAP through the catalog: readers flip atomically across tables") {
    import graft.engine.Catalog
    val base = java.nio.file.Files.createTempDirectory("catwap").toString
    val (tA, tB, cat) = (s"file:$base/a", s"file:$base/b", s"file:$base/cat")
    val vA0 = Snapshots.commit(Seq((1L, "a1")).toDF("id", "s"), tA)
    val vB0 = Snapshots.commit(Seq((1L, "b1")).toDF("id", "s"), tB)
    Catalog.publish(spark, cat, Map("a" -> (tA, vA0), "b" -> (tB, vB0)))
    val pin0 = Catalog.pin(spark, cat)

    // a cross-table change staged on branches of BOTH tables
    Branches.fork(spark, tA, "rel")
    Branches.fork(spark, tB, "rel")
    Snapshots.merge(Seq((1L, "a2")).toDF("id", "s"), Branches.root(tA, "rel"), "id")
    Snapshots.merge(Seq((1L, "b2")).toDF("id", "s"), Branches.root(tB, "rel"), "id")
    val gate = Seq(Expect.Rule("s_not_null", col("s").isNotNull))
    val vA = Branches.publishIf(spark, tA, "rel", gate).toOption.get
    // between the two table publishes, a CATALOG reader still sees the
    // OLD versions of both — per-table flips don't leak halfway states
    assert(Catalog.read(spark, Catalog.pin(spark, cat), "a")
      .as[(Long, String)].head() === ((1L, "a1")))
    val vB = Branches.publishIf(spark, tB, "rel", gate).toOption.get
    Catalog.publish(spark, cat, Map("a" -> (tA, vA), "b" -> (tB, vB)))

    // the pre-flip pin still reads the consistent OLD pair; a fresh pin
    // reads the consistent NEW pair — never a1/b2 or a2/b1
    assert(Catalog.read(spark, pin0, "a").as[(Long, String)].head() === ((1L, "a1")))
    assert(Catalog.read(spark, pin0, "b").as[(Long, String)].head() === ((1L, "b1")))
    val pin1 = Catalog.pin(spark, cat)
    assert(Catalog.read(spark, pin1, "a").as[(Long, String)].head() === ((1L, "a2")))
    assert(Catalog.read(spark, pin1, "b").as[(Long, String)].head() === ((1L, "b2")))
  }

  test("branch TTL: maintenance drops stale branches, fresh ones survive") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    Branches.fork(spark, root, "stale")
    Thread.sleep(5)
    assert(Branches.dropExpired(spark, root, ttlMs = 3600000L) === Seq.empty)
    assert(Branches.list(spark, root) === Seq("stale"))
    // via the consolidated policy, TTL 0: anything older than "now" goes
    import graft.engine.{Maintain, MaintenancePolicy}
    Maintain.maintain(spark, root, MaintenancePolicy(branchTtlMs = 0L))
    assert(Branches.list(spark, root) === Seq.empty)
  }

  test("schema evolution on a branch publishes with the evolved schema") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root, statsCols = Seq("id"))
    Branches.fork(spark, root, "evo")
    val bRoot = Branches.root(root, "evo")
    Snapshots.renameColumn(spark, bRoot, "s", "label")
    Snapshots.commit(Seq((2L, "b")).toDF("id", "label"), bRoot, append = true,
      statsCols = Seq("id"))
    // main is untouched by the branch's rename until publish
    assert(Snapshots.read(spark, root).columns.toSeq === Seq("id", "s"))
    Branches.publish(spark, root, "evo")
    val got = Snapshots.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "label"))
    // both file generations read under the renamed schema
    assert(rows(got) === Set((1L, "a"), (2L, "b")))
    // and stats pruning still works across the rename on main
    assert(rows(Snapshots.readRange(spark, root, "id", 2, 2)) === Set((2L, "b")))
  }
}
