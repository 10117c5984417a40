package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Branches, Incremental, Snapshots}

/** Round-11 hardening, pinned. The `optimize:` tag is a PROOF TOKEN — "this
  * commit's added files hold exactly the live rows of its removed files" —
  * consumed by the merge-rebase validator, the branch classifier, and the
  * Incremental parent walk. These specs pin the three places that keep the
  * token sound: (1) full-table compact/compactZOrder publish through the
  * rebase-validated committer (a racing append rebases, a racing row change
  * refuses — never a silent lost update under a row-preserving tag);
  * (2) external writers cannot mint the token (`commit` rejects the
  * reserved prefix); (3) content-CHANGING commits never wear it — restore
  * to an optimize-tagged version republishes the content ancestor's tag,
  * so every tag-skipping walker stays truthful.
  */
class OptimizeFenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("optfence").toString + "/t"

  /** id 1..40 in two range files, stats on id. */
  private def freshTable(): String = {
    val root = tmp()
    Snapshots.commit(
      spark.range(1, 41).select($"id", ($"id" * 10L).as("v"))
        .repartitionByRange(2, $"id"),
      root, statsCols = Seq("id"))
    root
  }

  /** Self-clearing pre-publish hook (the racing op may itself hit the seam). */
  private def race(op: => Unit): Unit =
    Snapshots.testPrePublishHook = () => {
      Snapshots.testPrePublishHook = () => ()
      op
    }

  private def resetHook(): Unit = Snapshots.testPrePublishHook = () => ()

  // ---- (2) the reserved prefix cannot be minted from outside ----

  test("commit refuses a caller-supplied optimize: tag") {
    val root = tmp()
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((1L, 1L)).toDF("id", "v"), root, tag = "optimize:evil")
    }
    assert(e.getMessage.contains("optimize:"))
    assert(Snapshots.headVersion(spark, root) === 0L, "nothing may have landed")
  }

  // ---- (1) full-table compact races through the fenced committer ----

  test("compact racing an append rebases: appended rows survive, old files compacted") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      val v = Snapshots.compact(spark, root, targetFiles = 1)
      // v1 base, v2 racer's append, v3 the rebased compact
      assert(v === 3L && Snapshots.headVersion(spark, root) === 3L)
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(100L) === 1000L, "the interim append's row was lost")
      assert(got.size === 41 && got(5L) === 50L)
      // the compact's selected files (v1's) are gone; the racer's file carries
      val v1Files = Snapshots.manifest(spark, root, 1L).files.toSet
      val head = Snapshots.manifest(spark, root, 3L)
      assert(v1Files.intersect(head.files.toSet).isEmpty,
        "originally-selected files must be compacted away")
      assert(Snapshots.manifestMeta(spark, root, 3L).tag
        .startsWith("optimize:"), "a compact commit carries the optimize tag")
    } finally resetHook()
  }

  test("an interim DV delete on a compacted file refuses the compact rebase") {
    val root = freshTable()
    try {
      race {
        Snapshots.deleteWhere(spark, root, $"id" === 5L, mergeOnRead = true)
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.compact(spark, root, targetFiles = 1)
      }
      assert(e.getMessage.contains("deletion vector"))
      // the racer's delete stands; the aborted compact left no version
      assert(Snapshots.headVersion(spark, root) === 2L)
      assert(Snapshots.read(spark, root).filter($"id" === 5L).count() === 0L)
    } finally resetHook()
  }

  test("an interim merge rewrite of a compacted file refuses the compact rebase") {
    val root = freshTable()
    try {
      race {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.compactZOrder(spark, root, dims = Seq("id"), targetFiles = 1)
      }
      assert(e.getMessage.contains("rewrote or removed"))
      assert(Snapshots.read(spark, root).filter($"id" === 5L)
        .select("v").as[Long].head() === -50L, "the racer's update was lost")
    } finally resetHook()
  }

  // ---- (3) walkers: optimize commits invisible, restores never disguised ----

  /** Source table + incrementally-maintained count state over it. */
  private def freshIncremental(): (String, String) = {
    val src = tmp()
    val agg = tmp()
    Snapshots.commit(
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "x"), src)
    Incremental.refresh(spark, src, agg, groupCols = Seq("k"), sumCols = Seq("x"))
    (src, agg)
  }

  test("restore to an optimize-tagged version republishes the content ancestor's tag") {
    val (src, agg) = freshIncremental()
    // state v1: src-v1. Maintenance on the state: v2, optimize-tagged.
    val v2 = Snapshots.compact(spark, agg, targetFiles = 1)
    assert(Snapshots.manifestMeta(spark, agg, v2).tag.startsWith("optimize:"))
    // second refresh: state v3, src-v2
    Snapshots.commit(Seq(("b", 4L)).toDF("k", "x"), src, append = true)
    Incremental.refresh(spark, src, agg, Seq("k"), Seq("x"))
    assert(Incremental.reflectedVersion(spark, agg) === 2L)

    // restore the state to the maintenance commit: content == refresh 1,
    // so the restored head must carry src-v1 — NOT the optimize marker
    // (which would make the walk skip it and report the stale src-v2)
    val v4 = Snapshots.restore(spark, agg, v2)
    assert(Snapshots.manifestMeta(spark, agg, v4).tag === "src-v1",
      "restore must republish the optimize target's content ancestor's tag")
    assert(Incremental.reflectedVersion(spark, agg) === 1L)

    // and the next refresh re-applies the missed delta onto the restored base
    Incremental.refresh(spark, src, agg, Seq("k"), Seq("x"))
    val got = Snapshots.read(spark, agg)
      .select("k", "sum_x").as[(String, java.math.BigDecimal)].collect()
      .map { case (k, s) => k -> s.longValueExact() }.toMap
    assert(got === Map("a" -> 3L, "b" -> 7L))
  }

  test("reflectedVersion walks through stacked maintenance commits") {
    val (_, agg) = freshIncremental()
    Snapshots.compact(spark, agg, targetFiles = 2)
    Snapshots.compactZOrder(spark, agg, dims = Seq("n_rows"), targetFiles = 1)
    assert(Incremental.reflectedVersion(spark, agg) === 1L,
      "two stacked optimize commits must be transparent to the walk")
  }

  test("a compacted branch (optimize-only) still rebase-publishes over a main append") {
    val root = freshTable()
    Branches.fork(spark, root, "maint")
    val bRoot = Branches.root(root, "maint")
    // branch does pure maintenance: rewrite every base file
    Snapshots.compact(spark, bRoot, targetFiles = 1)
    // main advances with an append meanwhile
    Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
      append = true, statsCols = Seq("id"))
    // the branch's only row-affecting commit is optimize-tagged — the
    // classifier must recognize it as row-preserving and rebase
    Branches.publishRebase(spark, root, "maint")
    val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size === 41 && got(100L) === 1000L && got(5L) === 50L)
  }
}
