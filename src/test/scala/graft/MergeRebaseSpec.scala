package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Conflict-validated merge publish (snapshot isolation): a keyed merge
  * that loses the head race no longer always aborts — when every interim
  * commit is provably disjoint from the merge's read/write set, the
  * pre-written output re-points at the new head (metadata only); anything
  * less provable aborts exactly as before. Races are injected
  * deterministically through the engine's pre-publish test seam.
  */
class MergeRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("mrb").toString + "/t"

  /** id 1..40 in two range files, stats on id. */
  private def freshTable(): String = {
    val root = tmp()
    Snapshots.commit(
      spark.range(1, 41).select($"id", ($"id" * 10L).as("v"))
        .repartitionByRange(2, $"id"),
      root, statsCols = Seq("id"))
    root
  }

  /** Install a SELF-CLEARING pre-publish hook (the racing op itself may run
    * a merge, which would otherwise re-enter the seam forever). */
  private def race(op: => Unit): Unit =
    Snapshots.testPrePublishHook = () => {
      Snapshots.testPrePublishHook = () => ()
      op
    }

  private def resetHook(): Unit = Snapshots.testPrePublishHook = () => ()

  test("a disjoint interim append rebases: no abort, no lost update") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      // the merge was computed at v1; the racer publishes v2 mid-flight
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      assert(Snapshots.headVersion(spark, root) === 3L,
        "merge must land ON TOP of the interim append")
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L, "the merge's update was lost")
      assert(got(100L) === 1000L, "the interim append's row was lost")
      assert(got.size === 41)
    } finally resetHook()
  }

  test("an interim append that may hold a merge key refuses the rebase") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((5L, 5555L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("rebase refused"))
      assert(e.getMessage.contains("may hold merge keys"))
      // the aborted merge left no version; the racer's append stands alone
      assert(Snapshots.headVersion(spark, root) === 2L)
      assert(Snapshots.read(spark, root).filter($"id" === 5L)
        .count() === 2L) // base row + racer's append, untouched by the abort
    } finally resetHook()
  }

  test("an interim rewrite of a touched file refuses the rebase") {
    val root = freshTable()
    try {
      race {
        // racer merges key 7 — same file our merge of key 5 rewrote
        Snapshots.merge(Seq((7L, 7777L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("rebase refused"))
      assert(e.getMessage.contains("rewrote or removed"))
      // the racer's update must not be lost
      assert(Snapshots.read(spark, root).filter($"id" === 7L)
        .select("v").as[Long].head() === 7777L)
    } finally resetHook()
  }

  test("an interim append with an unknowable key range is conservatively a conflict") {
    val root = freshTable()
    try {
      race {
        // round 17: a statsCols-free append INHERITS the head's index
        // declaration (so a plain statless racer now records key stats and
        // rebases cleanly — the improved behavior). An unknowable range
        // still exists: an all-null key file records no stats entry, and
        // the rebase must refuse it.
        Snapshots.commit(Seq((Option.empty[Long], 3L)).toDF("id", "v"),
          root, append = true)
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("rebase refused"))
    } finally resetHook()
  }

  test("a statless disjoint racer now rebases: the append inherited the key index") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((300L, 3L)).toDF("id", "v"), root, append = true)
      }
      // disjoint keys, provable from the inherited stats: the merge lands
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      assert(Snapshots.read(spark, root).filter(col("id") === 5L)
        .select("v").as[Long].collect().toSeq === Seq(-50L))
      assert(Snapshots.read(spark, root).filter(col("id") === 300L)
        .select("v").as[Long].collect().toSeq === Seq(3L))
    } finally resetHook()
  }

  test("an explicit requireHead fence never rebases") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      // caller computed its batch FROM v1 state (the keyed-refresh shape):
      // even a provably-disjoint interim commit must abort
      intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"), requireHead = 1L)
      }
      assert(Snapshots.headVersion(spark, root) === 2L)
    } finally resetHook()
  }

  test("an interim compaction refuses the rebase (every file moved)") {
    val root = freshTable()
    try {
      race { Snapshots.compact(spark, root, targetFiles = 1) }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("rebase refused"))
      // recompute-and-retry against the compacted head lands cleanly
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      assert(Snapshots.read(spark, root).filter($"id" === 5L)
        .select("v").as[Long].head() === -50L)
    } finally resetHook()
  }

  test("MERGE INTO rebases on a disjoint racer; by-source clauses never do") {
    import graft.engine.MergeClause
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      Snapshots.mergeInto(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        Seq(MergeClause.Update(Map("v" -> col("s.v"))),
          MergeClause.Insert()),
        statsCols = Seq("id"))
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L && got(100L) === 1000L)

      // a NOT MATCHED BY SOURCE clause makes row fates depend on EVERY
      // target row — no interim commit can commute, even a disjoint one
      race {
        Snapshots.commit(Seq((200L, 2000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.mergeInto(Seq((6L, -60L)).toDF("id", "v"), root, "id",
          Seq(MergeClause.Update(Map("v" -> col("s.v"))),
            MergeClause.BySourceDelete(Some(col("t.id") > 1000L))),
          statsCols = Seq("id"))
      }
    } finally resetHook()
  }

  test("a keyed delete rebases on a disjoint racer and refuses an overlapping one") {
    val root = freshTable()
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      Snapshots.delete(Seq(5L).toDF("id"), root, "id", statsCols = Seq("id"))
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(!got.contains(5L) && got(100L) === 1000L && got.size === 40)

      // racer re-inserts the key being deleted: the delete must abort, or
      // the racer's row would silently survive a delete that "succeeded"
      race {
        Snapshots.commit(Seq((6L, 666L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.delete(Seq(6L).toDF("id"), root, "id", statsCols = Seq("id"))
      }
    } finally resetHook()
  }

  test("chained disjoint racers rebase repeatedly within the attempt bound") {
    val root = freshTable()
    try {
      // two interim appends, the second installed by the first racer
      race {
        Snapshots.commit(Seq((100L, 1L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
        Snapshots.commit(Seq((101L, 2L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L && got(100L) === 1L && got(101L) === 2L)
    } finally resetHook()
  }

  // ---- round 10: compaction ↔ merge races rebase when file-disjoint ----

  test("a merge racing a compaction of DISJOINT files rebases (round 10)") {
    val root = freshTable() // ids 1..40 in two range files [1..20][21..40]
    try {
      // racer compacts the HIGH file only; our merge touches key 5 (low)
      race { Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1) }
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      assert(Snapshots.headVersion(spark, root) === 3L,
        "merge must REBASE on top of the disjoint compaction, not abort")
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L)
      assert(got.size === 40 && got(30L) === 300L,
        "compacted rows must survive the rebased merge")
    } finally resetHook()
  }

  test("a merge racing a compaction of its OWN touched file still refuses") {
    val root = freshTable()
    try {
      race { Snapshots.compactWhere(spark, root, $"id" <= 10L, targetFiles = 1) }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("rebase refused"))
    } finally resetHook()
  }

  test("a compaction racing a merge of DISJOINT files rebases (round 10)") {
    val root = freshTable()
    try {
      // racer merges key 5 (low file); the compaction rewrites the high file
      race {
        Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      assert(Snapshots.headVersion(spark, root) === 3L,
        "compaction must REBASE on top of the disjoint merge, not abort")
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L, "the interim merge's update was lost")
      assert(got.size === 40)
    } finally resetHook()
  }

  test("a compaction racing a rewrite of its selected files refuses") {
    val root = freshTable()
    try {
      race {
        Snapshots.merge(Seq((30L, -1L)).toDF("id", "v"), root, "id",
          statsCols = Seq("id"))
      }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      }
      assert(e.getMessage.contains("rebase refused"))
      // nothing lost: the racer's merge stands, retry compacts cleanly
      Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(30L) === -1L && got.size === 40)
    } finally resetHook()
  }

  test("a compaction racing a DV delete on its selected files refuses") {
    val root = freshTable()
    try {
      race { Snapshots.deleteWhere(spark, root, $"id" === 30L) }
      val e = intercept[Snapshots.ConcurrentCommitException] {
        Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      }
      assert(e.getMessage.contains("deletion vector"))
      // the interim delete stands; a fresh compaction materializes it
      Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      assert(Snapshots.read(spark, root).count() === 39L)
    } finally resetHook()
  }

  test("DV materialization racing a disjoint append rebases") {
    val root = freshTable()
    Snapshots.deleteWhere(spark, root, $"id" === 30L)
    try {
      race {
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
      }
      Snapshots.materializeDvs(spark, root)
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      assert(m.dvs.isEmpty, "materialization must have cleared the vectors")
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(!got.contains(30L) && got(100L) === 1000L && got.size === 40)
    } finally resetHook()
  }

  test("a merge racing an interim compaction CHAINED after an append rebases") {
    val root = freshTable()
    try {
      race {
        // append a key-disjoint row, then compact the high band — the
        // walk must exonerate the compaction outputs through the chain
        Snapshots.commit(Seq((100L, 1000L)).toDF("id", "v"), root,
          append = true, statsCols = Seq("id"))
        Snapshots.compactWhere(spark, root, $"id" >= 25L, targetFiles = 1)
      }
      Snapshots.merge(Seq((5L, -50L)).toDF("id", "v"), root, "id",
        statsCols = Seq("id"))
      val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(5L) === -50L && got(100L) === 1000L && got.size === 41)
    } finally resetHook()
  }
}
