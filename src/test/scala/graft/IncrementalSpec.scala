package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.engine.{Incremental, Snapshots}

/** Snapshot CDC (`Snapshots.changes` / `signedDelta`) and the incremental
  * aggregate refresh built on it (`Incremental`): the refresh whose cost is
  * the changed files, property-checked bit-identical to a from-scratch
  * recompute across append, copy-on-write merge, overwrite, compaction,
  * and vacuumed-history fallback.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("incr").toString + "/t"

  private def docs(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "grp", "chars")

  /** Full recompute in the exact shape Incremental stores. */
  private def recompute(root: String): Set[(String, Long, BigDecimal)] =
    Snapshots.read(spark, root)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("chars").cast("decimal(38,6)")).cast("decimal(38,6)").as("sum_chars"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def state(aggRoot: String): Set[(String, Long, BigDecimal)] =
    Snapshots.read(spark, aggRoot)
      .select("grp", "n_rows", "sum_chars")
      .as[(String, Long, BigDecimal)].collect().toSet

  private def changeSet(root: String, from: Long, to: Long): Set[(String, Long, String)] =
    Snapshots.changes(spark, root, from, to)
      .select("grp", "id", "_op")
      .as[(String, Long, String)].collect().toSet

  test("changes: append yields only inserts; compaction yields zero changes") {
    val root = tmp()
    val v1 = Snapshots.commit(docs((1, "a", 10), (2, "b", 20)), root)
    val v2 = Snapshots.commit(docs((3, "a", 30)), root, append = true)
    assert(changeSet(root, v1, v2) === Set(("a", 3L, "I")))
    // from the empty base: everything is an insert
    assert(changeSet(root, 0, v2) ===
      Set(("a", 1L, "I"), ("b", 2L, "I"), ("a", 3L, "I")))
    // compaction rewrites every file but carries the same rows — the
    // carried rows appear +1 in the new files and -1 in the old ones and
    // cancel under exceptAll: net CDC is empty
    val v3 = Snapshots.compact(spark, root, targetFiles = 1)
    assert(Snapshots.changes(spark, root, v2, v3).isEmpty)
    // but the file diff itself is total (every file rewritten)
    val (added, removed) = Snapshots.diffFiles(spark, root, v2, v3)
    assert(added.nonEmpty && removed.nonEmpty)
  }

  test("changes: copy-on-write merge emits D for old images, I for new") {
    val root = tmp()
    val v1 = Snapshots.commit(docs((1, "a", 10), (2, "b", 20), (3, "b", 30)), root,
      statsCols = Seq("id"))
    // update id=2, insert id=9
    Snapshots.merge(docs((2, "b", 25), (9, "c", 90)), root, key = "id",
      statsCols = Seq("id"))
    val v2 = Snapshots.headVersion(spark, root)
    assert(changeSet(root, v1, v2) ===
      Set(("b", 2L, "D"), ("b", 2L, "I"), ("c", 9L, "I")))
    // row-level detail: the D row carries the OLD measure, the I the new
    val byOp = Snapshots.changes(spark, root, v1, v2)
      .filter(col("id") === 2).select("_op", "chars")
      .as[(String, Long)].collect().toMap
    assert(byOp === Map("D" -> 20L, "I" -> 25L))
  }

  test("incremental refresh is bit-identical to recompute across the full lifecycle") {
    val root = tmp()
    val agg = tmp()
    def check(): Unit = {
      Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
      assert(state(agg) === recompute(root))
    }
    Snapshots.commit(docs((1, "a", 10), (2, "b", 20)), root, statsCols = Seq("id"))
    check() // initial build = delta from the empty base
    Snapshots.commit(docs((3, "a", 30), (4, "c", 40)), root, append = true,
      statsCols = Seq("id"))
    check() // append
    Snapshots.merge(docs((2, "b", 99), (5, "d", 50)), root, key = "id",
      statsCols = Seq("id"))
    check() // update + insert via copy-on-write merge
    Snapshots.compact(spark, root)
    val before = state(agg)
    val v = Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(state(agg) === before, "compaction must leave the state unchanged")
    assert(v === Snapshots.headVersion(spark, root))
    Snapshots.commit(docs((9, "z", 1)), root) // overwrite: table is replaced
    check()
    assert(state(agg).map(_._1) === Set("z"),
      "groups deleted by the overwrite must leave the state (n_rows hit 0)")
  }

  test("refresh is a no-op when current, idempotent on replay, and survives vacuum") {
    val root = tmp()
    val agg = tmp()
    Snapshots.commit(docs((1, "a", 10)), root)
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    val aggHead = Snapshots.headVersion(spark, agg)
    // current → no new state version
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(Snapshots.headVersion(spark, agg) === aggHead)
    assert(Incremental.reflectedVersion(spark, agg) === 1L)

    // two more source commits, then vacuum away the reflected manifest —
    // the refresh must fall back to a full recompute and still be exact
    Snapshots.commit(docs((2, "b", 20)), root, append = true)
    Snapshots.commit(docs((3, "b", 30)), root, append = true)
    Snapshots.vacuum(spark, root, keepLast = 1)
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(state(agg) === recompute(root))
  }

  test("expand: vocabulary counts maintain incrementally through doc updates") {
    // the exploded-statistic case: each doc contributes one row per token;
    // a deleted doc's tokens arrive with -1 and cancel their +1 twins, so
    // vocab counts stay exact through updates without re-reading the corpus
    val root = tmp()
    val agg = tmp()
    def texts(rows: (Long, String)*) = rows.toDF("id", "text")
    val tokenize: DataFrame => DataFrame =
      d => d.select(explode(split(col("text"), " ")).as("token"), col("_sign"))
    def check(): Unit = {
      Incremental.refresh(spark, root, agg, Seq("token"), Seq.empty, tokenize)
      val got = Snapshots.read(spark, agg).select("token", "n_rows")
        .as[(String, Long)].collect().toSet
      val want = Snapshots.read(spark, root)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").count()
        .as[(String, Long)].collect().toSet
      assert(got === want)
    }
    Snapshots.commit(texts((1, "a b b"), (2, "b c")), root, statsCols = Seq("id"))
    check()
    Snapshots.commit(texts((3, "c d")), root, append = true, statsCols = Seq("id"))
    check()
    // update doc 1: "a b b" out (a-1, b-2), "e" in — 'a' must drop to 0
    // and leave the state entirely
    Snapshots.merge(texts((1, "e")), root, key = "id", statsCols = Seq("id"))
    check()
    assert(!Snapshots.read(spark, agg).select("token").as[String]
      .collect().contains("a"), "token 'a' net count hit 0 — must leave the state")
  }

  test("readAsOf time-travels by publish timestamp") {
    val root = tmp()
    Snapshots.commit(docs((1, "a", 10)), root)
    val t1 = Snapshots.manifest(spark, root, 1).ts
    assert(t1 > 0)
    Snapshots.commit(docs((2, "b", 20)), root, append = true)
    val t2 = Snapshots.manifest(spark, root, 2).ts
    assert(t2 >= t1)
    assert(Snapshots.readAsOf(spark, root, t1).count() ===
      (if (t2 <= t1) 2L else 1L)) // same-millisecond commits tie to the newer
    assert(Snapshots.readAsOf(spark, root, t2).count() === 2L)
    assert(Snapshots.readAsOf(spark, root, System.currentTimeMillis()).count() === 2L)
    intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, root, t1 - 1000)
    }
  }

  test("min/max state: appends fold, deletes recompute only the touched groups") {
    val root = tmp()
    val agg = tmp()
    def check(): Unit = {
      Incremental.refreshMinMax(spark, root, agg, Seq("grp"), Seq("chars"))
      val got = Snapshots.read(spark, agg)
        .select("grp", "n_rows", "min_chars", "max_chars")
        .as[(String, Long, Long, Long)].collect().toSet
      val want = Snapshots.read(spark, root)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), min("chars").as("lo"), max("chars").as("hi"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === want)
    }
    Snapshots.commit(docs((1, "a", 10), (2, "a", 50), (3, "b", 20)), root,
      statsCols = Seq("id"))
    check() // initial build
    Snapshots.commit(docs((4, "a", 5), (5, "c", 7)), root, append = true,
      statsCols = Seq("id"))
    check() // append-only: mergeable fold (new min for 'a', new group 'c')
    // delete the row holding 'a's max — only a recompute can discover the
    // new max; 'b'/'c' must carry forward from stored state
    Snapshots.delete(Seq(2L).toDF("id"), root, "id", statsCols = Seq("id"))
    check()
    // update via merge (delete+insert images): 'b' recomputes to the new value
    Snapshots.merge(docs((3, "b", 99)), root, key = "id", statsCols = Seq("id"))
    check()
    // group 'c' vanishes entirely → leaves the state
    Snapshots.delete(Seq(5L).toDF("id"), root, "id", statsCols = Seq("id"))
    check()
    assert(!Snapshots.read(spark, agg).select("grp").as[String]
      .collect().contains("c"))
  }

  test("approx-distinct state: appended sketches union to the from-scratch sketch exactly") {
    val root = tmp()
    val agg = tmp()
    def check(): Unit = {
      Incremental.refreshApproxDistinct(spark, root, agg, Seq("grp"), Seq("chars"))
      val got = Incremental.readApproxDistinct(spark, agg, Seq("chars"))
        .select("grp", "n_rows", "approx_distinct_chars")
        .as[(String, Long, Long)].collect().toSet
      // HLL union is register-wise max — associative, commutative,
      // idempotent — so the maintained sketch is bit-identical to a
      // rebuild and the ESTIMATES must match exactly, not approximately
      val want = Snapshots.read(spark, root)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          hll_sketch_estimate(hll_sketch_agg(col("chars"))).as("d"))
        .as[(String, Long, Long)].collect().toSet
      assert(got === want)
    }
    // values repeat across rows (ids 1/2 share chars=10): distinct < count
    Snapshots.commit(docs((1, "a", 10), (2, "a", 10), (3, "b", 20)), root,
      statsCols = Seq("id"))
    check()
    Snapshots.commit(docs((4, "a", 30), (5, "b", 20), (6, "b", 40)), root,
      append = true, statsCols = Seq("id"))
    check() // append-only: sketch union path
    val exact = Snapshots.read(spark, root).filter($"grp" === "a")
      .select("chars").distinct().count()
    val est = Incremental.readApproxDistinct(spark, agg, Seq("chars"))
      .filter($"grp" === "a").select("approx_distinct_chars").as[Long].head()
    assert(est === exact, "tiny cardinalities estimate exactly")
    // delete forces the touched-group recompute (sketches can't un-merge)
    Snapshots.delete(Seq(4L).toDF("id"), root, "id", statsCols = Seq("id"))
    check()
  }

  test("streaming materialized view: per-trigger maintenance ≡ batch recompute, replay-safe") {
    import graft.streaming.IncrementalView
    val root = tmp()
    val agg = tmp()
    // three triggers through the file-per-batch harness
    val batches = Seq(
      docs((1, "a", 10), (2, "b", 20)),
      docs((3, "a", 30)),
      docs((4, "c", 40), (5, "b", 50)))
    val srcDir = Files.createTempDirectory("ivsrc").toFile
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmpd = Files.createTempDirectory("ivpart").toFile
      df.coalesce(1).write.mode("overwrite").parquet("file:" + tmpd)
      val part = tmpd.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(srcDir, s"b$i.parquet")
      Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + srcDir)
    val q = IncrementalView.start(stream, root, agg,
      "file:" + Files.createTempDirectory("ivchk"), Seq("grp"), Seq("chars"))
    try q.processAllAvailable() finally q.stop()

    assert(state(agg) === recompute(root), "view state diverged from recompute")
    assert(Snapshots.read(spark, root).count() === 5)
    // replaying the last trigger (restart shape): both sides no-op
    val srcHead = Snapshots.headVersion(spark, root)
    val aggHead = Snapshots.headVersion(spark, agg)
    IncrementalView.ingest(batches.last, 2L, root, agg, Seq("grp"), Seq("chars"))
    assert(Snapshots.headVersion(spark, root) === srcHead, "replayed batch re-committed")
    assert(Snapshots.headVersion(spark, agg) === aggHead, "replayed refresh re-ran")
    // a maintenance compaction interleaves; the next refresh stays exact
    Snapshots.compact(spark, root)
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(state(agg) === recompute(root))
  }

  test("keyed streaming view: per-trigger keyed refresh ≡ recompute, replay-safe") {
    import graft.streaming.IncrementalView
    val root = tmp()
    val agg = tmp()
    val batches = Seq(
      docs((1, "a", 10), (2, "b", 20)),
      docs((3, "a", 30)),
      docs((4, "c", 40), (5, "b", 50)))
    val srcDir = Files.createTempDirectory("ivksrc").toFile
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmpd = Files.createTempDirectory("ivkpart").toFile
      df.coalesce(1).write.mode("overwrite").parquet("file:" + tmpd)
      val part = tmpd.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(srcDir, s"b$i.parquet")
      Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + srcDir)
    val q = IncrementalView.start(stream, root, agg,
      "file:" + Files.createTempDirectory("ivkchk"), Seq("grp"), Seq("chars"),
      keyed = true)
    try q.processAllAvailable() finally q.stop()

    // keyed path: state ≡ recompute at the trigger boundary, and the state
    // lives in the keyed (__gh-hashed, tombstone-aware) layout
    assert(keyedState(agg) === recompute(root), "keyed view state diverged")
    assert(Snapshots.read(spark, agg).columns.contains("__gh"),
      "keyed=true must route through the keyed state layout")
    // replaying the last trigger: both sides no-op
    val srcHead = Snapshots.headVersion(spark, root)
    val aggHead = Snapshots.headVersion(spark, agg)
    IncrementalView.ingest(batches.last, 2L, root, agg, Seq("grp"), Seq("chars"),
      keyed = true)
    assert(Snapshots.headVersion(spark, root) === srcHead, "replayed batch re-committed")
    assert(Snapshots.headVersion(spark, agg) === aggHead, "replayed keyed refresh re-ran")
  }

  test("streaming approx-distinct view: sketch state = exact recompute, replay-safe, rewrite-ready") {
    import graft.streaming.IncrementalView
    import graft.plans.ViewRewrite
    val root = tmp()
    val agg = tmp()
    // bounded distinct domain keeps every sketch in its exact sparse
    // regime, so "approx" is checked with EQUALITY throughout; batch 2
    // repeats a value the state already holds (idempotent union)
    val batches = Seq(
      docs((1, "a", 10), (2, "b", 20)),
      docs((3, "a", 10)),
      docs((4, "c", 40), (5, "b", 50)))
    val srcDir = Files.createTempDirectory("ivdsrc").toFile
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmpd = Files.createTempDirectory("ivdpart").toFile
      df.coalesce(1).write.mode("overwrite").parquet("file:" + tmpd)
      val part = tmpd.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(srcDir, s"b$i.parquet")
      Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + srcDir)
    val q = IncrementalView.startApproxDistinct(stream, root, agg,
      "file:" + Files.createTempDirectory("ivdchk"), Seq("grp"), Seq("chars"))
    try q.processAllAvailable() finally q.stop()

    def exact(): Map[String, Long] = Snapshots.read(spark, root).groupBy("grp")
      .agg(count_distinct(col("chars")).as("nd"))
      .as[(String, Long)].collect().toMap
    def est(): Map[String, Long] =
      Incremental.readApproxDistinct(spark, agg, Seq("chars"))
        .select(col("grp"), col("approx_distinct_chars").cast("long"))
        .as[(String, Long)].collect().toMap
    assert(est() === exact(), "stream-maintained sketches diverged from exact")
    assert(est() === Map("a" -> 1L, "b" -> 2L, "c" -> 1L))

    // replaying the last trigger (restart shape): both sides no-op
    val srcHead = Snapshots.headVersion(spark, root)
    val aggHead = Snapshots.headVersion(spark, agg)
    IncrementalView.ingestApproxDistinct(batches.last, 2L, root, agg,
      Seq("grp"), Seq("chars"))
    assert(Snapshots.headVersion(spark, root) === srcHead, "replayed batch re-committed")
    assert(Snapshots.headVersion(spark, agg) === aggHead, "replayed refresh re-ran")

    // the optimizer answers analyst estimates from the stream-built state
    ViewRewrite.install(spark)
    ViewRewrite.clear()
    ViewRewrite.registerView(ViewRewrite.SumView("snd", root, agg, Seq("grp"),
      Set.empty, distincts = Set("chars")))
    val aq = Snapshots.read(spark, root).groupBy("grp")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("chars"))).as("nd"))
    assert(ViewRewrite.avoidedScan(aq, root),
      "sketch rewrite must fire over streaming-maintained state")
    assert(aq.as[(String, Long)].collect().toMap === exact())
    ViewRewrite.clear()
  }

  test("the delta plan scans only the changed files") {
    val root = tmp()
    val v1 = Snapshots.commit(docs((1, "a", 10), (2, "b", 20)), root)
    val v2 = Snapshots.commit(docs((3, "a", 30)), root, append = true)
    val (added, _) = Snapshots.diffFiles(spark, root, v1, v2)
    val delta = Snapshots.signedDelta(spark, root, v1, v2)
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val scanned = delta.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.toSeq
    }.flatten.map(base).toSet
    assert(scanned.nonEmpty)
    assert(scanned === added.map(base).toSet,
      s"delta scanned $scanned but the manifest diff added only $added")
  }

  // ---- refreshKeyed: the vocab-sized-state path — state as a keyed ----
  // ---- Snapshots table, refresh via stats-pruned merge             ----

  private def keyedState(aggRoot: String): Set[(String, Long, BigDecimal)] =
    Incremental.readKeyed(spark, aggRoot, Seq("chars"))
      .select("grp", "n_rows", "sum_chars")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, s) => (g, n, BigDecimal(s).setScale(6)) }.toSet

  test("refreshKeyed: a refresh touching few groups rewrites few state files") {
    val root = tmp(); val agg = tmp()
    // 400 groups spread over 8 hash-range-clustered state files
    Snapshots.commit(
      spark.range(0, 800).select($"id",
        concat(lit("w"), $"id" % 400).as("grp"), ($"id" % 97).as("chars")),
      root, statsCols = Seq("id"))
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"),
      stateFiles = 8)
    val m1 = Snapshots.manifest(spark, agg, Snapshots.headVersion(spark, agg))
    assert(m1.files.size === 8, "initial build should range-cluster into 8 files")
    assert(keyedState(agg) === recompute(root))

    // append touching ONE group
    Snapshots.commit(docs((9001, "w7", 50), (9002, "w7", 60)), root,
      append = true, statsCols = Seq("id"))
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"),
      stateFiles = 8)
    val m2 = Snapshots.manifest(spark, agg, Snapshots.headVersion(spark, agg))
    // the sliver pin: untouched state files carry forward by reference —
    // only the file(s) whose hash range holds w7 rewrite
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6,
      s"expected ≥6 of 8 state files carried by reference, got ${carried.size}")
    assert(keyedState(agg) === recompute(root), "keyed state diverged from recompute")
  }

  test("refreshKeyed: replay no-ops; net-zero groups tombstone out of reads") {
    val root = tmp(); val agg = tmp()
    Snapshots.commit(docs((1, "a", 10), (2, "a", 20), (3, "b", 30)), root,
      statsCols = Seq("id"))
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"))
    // replay (at-least-once caller): version unchanged
    val h1 = Snapshots.headVersion(spark, agg)
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(Snapshots.headVersion(spark, agg) === h1, "replayed refresh re-ran")
    // delete every 'b' row from the source; group b must leave reads.
    // tombstoneCompactAt disabled here: this test pins the RAW tombstone
    // mechanics (the policy that reclaims them is pinned separately below)
    Snapshots.delete(Seq(3L).toDF("id"), root, key = "id")
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"),
      tombstoneCompactAt = 2.0)
    assert(keyedState(agg) === recompute(root))
    assert(!keyedState(agg).exists(_._1 == "b"), "net-zero group visible in read")
    // the tombstone row exists in storage (merge cannot remove keys) but
    // carries n_rows = 0
    val raw = Snapshots.read(spark, agg).filter($"grp" === "b")
      .select("n_rows").as[Long].collect()
    assert(raw.toSeq === Seq(0L), "expected an n_rows=0 tombstone for b")
  }

  test("tombstones reclaim automatically once their fraction crosses the default-on threshold") {
    val root = tmp(); val agg = tmp()
    Snapshots.commit(docs((1, "a", 10), (2, "b", 20), (3, "c", 30)), root,
      statsCols = Seq("id"))
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"))
    // delete b and c entirely: 2 of 3 state groups go net-zero (0.67 > 0.3)
    Snapshots.delete(Seq(2L, 3L).toDF("id"), root, key = "id")
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"))
    // NO manual maintenance call: the refresh itself must have reclaimed
    // the tombstones with an untagged maintenance commit
    val rawRows = Snapshots.read(spark, agg).select("grp", "n_rows")
      .as[(String, Long)].collect().toSet
    assert(rawRows === Set(("a", 1L)),
      s"expected tombstones reclaimed without a manual call, raw state = $rawRows")
    // the untagged maintenance head must not wedge the refresh chain
    assert(Incremental.reflectedVersion(spark, agg) ===
      Snapshots.headVersion(spark, root))
    Snapshots.commit(docs((4, "d", 40)), root, append = true, statsCols = Seq("id"))
    Incremental.refreshKeyed(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(keyedState(agg) === recompute(root))
  }

  test("restoring a state table lands the walk on the restored refresh's source version") {
    val root = tmp(); val agg = tmp()
    val srcV1 = Snapshots.commit(docs((1, "a", 10), (2, "b", 20)), root,
      statsCols = Seq("id"))
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    val aggV1 = Snapshots.headVersion(spark, agg)
    val stateAtV1 = state(agg)
    Snapshots.commit(docs((3, "a", 30), (4, "c", 40)), root, append = true,
      statsCols = Seq("id"))
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))

    // roll the STATE back to the v1 refresh: restore changes content, so it
    // must carry the target's src-v tag — the walk has to report srcV1, not
    // the pre-restore head's newer tag (which would make the next refresh
    // a silent no-op against the wrong base)
    Snapshots.restore(spark, agg, aggV1)
    assert(state(agg) === stateAtV1)
    assert(Incremental.reflectedVersion(spark, agg) === srcV1,
      "restored state must reflect the RESTORED refresh's source version")
    // the next refresh applies the v1→head delta on the restored base
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    assert(state(agg) === recompute(root))
  }

  test("maintenance on the STATE table itself does not wedge the refresh chain") {
    // compact/compactZOrder/restore commit untagged; the reflected-version
    // walk must skip them to the newest tagged ancestor instead of erroring
    // (round-7 audit: previously any state-table compaction made every
    // later refresh fail with 'not an Incremental state table')
    val root = tmp(); val agg = tmp(); val aggK = tmp()
    Snapshots.commit(docs((1, "a", 10), (2, "b", 20)), root, statsCols = Seq("id"))
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    Incremental.refreshKeyed(spark, root, aggK, Seq("grp"), Seq("chars"))
    // maintenance: untagged commits on top of BOTH state tables — a plain
    // compaction and the keyed form's documented re-cluster (range on the
    // hash key, tombstones filtered)
    Snapshots.compact(spark, agg)
    Snapshots.commit(
      Snapshots.read(spark, aggK).filter($"n_rows" > 0)
        .repartitionByRange(2, $"__gh").sortWithinPartitions("__gh"),
      aggK, append = false, statsCols = Seq("__gh"))
    // the reflected version survives the untagged head
    assert(Incremental.reflectedVersion(spark, agg) === 1L)
    assert(Incremental.reflectedVersion(spark, aggK) === 1L)
    // and the next refresh still folds the next delta exactly
    Snapshots.commit(docs((3, "a", 30)), root, append = true, statsCols = Seq("id"))
    Incremental.refresh(spark, root, agg, Seq("grp"), Seq("chars"))
    Incremental.refreshKeyed(spark, root, aggK, Seq("grp"), Seq("chars"))
    assert(state(agg) === recompute(root))
    assert(keyedState(aggK) === recompute(root))
    // a table with commits but NO tag anywhere is refused, not clobbered
    val plain = tmp()
    Snapshots.commit(docs((9, "x", 1)), plain)
    val e = intercept[IllegalArgumentException](
      Incremental.refresh(spark, root, plain, Seq("grp"), Seq("chars")))
    assert(e.getMessage.contains("no src-v tag"))
  }

  test("refreshKeyed ≡ refresh across a mixed lifecycle (same math, keyed layout)") {
    val root = tmp(); val aggK = tmp(); val aggW = tmp()
    def both(): Unit = {
      Incremental.refreshKeyed(spark, root, aggK, Seq("grp"), Seq("chars"),
        stateFiles = 4)
      Incremental.refresh(spark, root, aggW, Seq("grp"), Seq("chars"))
    }
    Snapshots.commit(docs((1, "a", 10), (2, "b", 20), (3, "c", 30)), root,
      statsCols = Seq("id"))
    both()
    Snapshots.commit(docs((4, "a", 40), (5, "d", 50)), root,
      append = true, statsCols = Seq("id"))
    both()
    Snapshots.merge(docs((2, "b", 99)), root, key = "id", statsCols = Seq("id"))
    both()
    Snapshots.delete(Seq(3L).toDF("id"), root, key = "id")
    both()
    val whole = Snapshots.read(spark, aggW)
      .select("grp", "n_rows", "sum_chars").as[(String, Long, BigDecimal)]
      .collect().toSet
    assert(keyedState(aggK) === whole, "keyed and whole-state refresh diverged")
    assert(whole === recompute(root))
  }

  test("histogram state maintains EXACTLY under deletes — no recompute path") {
    val root = tmp(); val agg = tmp()
    // values spread over bins of width 10: ids 1..40, value = id
    Snapshots.commit((1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("id", "grp", "v"), root, statsCols = Seq("id"))
    Incremental.refreshHistogram(spark, root, agg, Seq("grp"), "v", 10.0)

    // delete a scattered third; the -1 delta rows must cancel bin counts
    Snapshots.delete((1L to 40L).filter(_ % 3 == 0).toDF("id"), root, key = "id")
    Incremental.refreshHistogram(spark, root, agg, Seq("grp"), "v", 10.0)

    // merge that MOVES rows across bins: value 5 -> 35 relocates a bin count
    Snapshots.merge(Seq((5L, "b", 35L)).toDF("id", "grp", "v"), root, key = "id")
    Incremental.refreshHistogram(spark, root, agg, Seq("grp"), "v", 10.0)

    val maintained = Snapshots.read(spark, agg)
      .select("grp", "__bin", "n_rows").as[(String, Long, Long)].collect().toSet
    // from-scratch rebuild on a FRESH state root: one refresh from the
    // empty base over the same head — must be bit-identical, not close
    val fresh = tmp()
    Incremental.refreshHistogram(spark, root, fresh, Seq("grp"), "v", 10.0)
    val rebuilt = Snapshots.read(spark, fresh)
      .select("grp", "__bin", "n_rows").as[(String, Long, Long)].collect().toSet
    assert(maintained === rebuilt, "maintained histogram diverged from rebuild")
    // and equals the direct groupBy of the head
    val direct = Snapshots.read(spark, root)
      .withColumn("__bin", floor(col("v").cast("double") / 10.0).cast("long"))
      .groupBy("grp", "__bin").agg(count(lit(1)).as("n_rows"))
      .as[(String, Long, Long)].collect().toSet
    assert(maintained === direct)
  }

  test("streaming histogram view: per-trigger quantile maintenance ≡ recompute") {
    import graft.streaming.IncrementalView
    // a standing distribution dashboard is just IncrementalView with the
    // bin as a derived group column — refreshHistogram's composition works
    // unchanged through the streaming path because it IS refresh()
    val root = tmp(); val agg = tmp()
    val binned: DataFrame => DataFrame = d => d.filter(col("chars").isNotNull)
      .withColumn("__bin", floor(col("chars").cast("double") / 10.0).cast("long"))
    val batches = Seq(
      docs((1, "a", 5), (2, "a", 15), (3, "b", 25)),
      docs((4, "a", 17), (5, "b", 5)),
      docs((6, "a", 35)))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalView.ingest(b, i.toLong, root, agg,
        Seq("grp", "__bin"), Seq.empty, expand = binned)
      val got = Snapshots.read(spark, agg)
        .select("grp", "__bin", "n_rows").as[(String, Long, Long)].collect().toSet
      val want = binned(Snapshots.read(spark, root))
        .groupBy("grp", "__bin").agg(count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(got === want, s"diverged at trigger $i")
    }
    // quantiles read straight off the maintained state
    val q = Incremental.readQuantiles(spark, agg, Seq("grp"), Seq(0.5), 10.0)
      .select("grp", "q_est").as[(String, Double)].collect().toMap
    assert(q === Map("a" -> 10.0, "b" -> 0.0))
  }

  test("readQuantiles: rank rule on known bins; null values carry no weight") {
    val root = tmp(); val agg = tmp()
    // grp a: 10 values in [0,10), 10 in [20,30) → p50 rank 10 lands in bin
    // 0 (cum 10 >= 10), p90 rank 18 in bin 2; nulls must be ignored
    val rows = (1L to 10L).map(i => (i, "a", Some(i - 1))) ++
      (11L to 20L).map(i => (i, "a", Some(i + 9))) ++
      Seq((21L, "a", Option.empty[Long]))
    Snapshots.commit(rows.toDF("id", "grp", "v"), root, statsCols = Seq("id"))
    Incremental.refreshHistogram(spark, root, agg, Seq("grp"), "v", 10.0)
    val q = Incremental.readQuantiles(spark, agg, Seq("grp"), Seq(0.5, 0.9), 10.0)
      .select("grp", "p", "q_est").as[(String, Double, Double)].collect().toSet
    assert(q === Set(("a", 0.5, 0.0), ("a", 0.9, 20.0)))
  }
}
