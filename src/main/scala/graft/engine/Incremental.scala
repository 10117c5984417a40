package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incrementally-maintained grouped aggregates over a [[Snapshots]] table —
  * the materialized-view refresh whose cost is the CHANGES, not the corpus.
  *
  * Why this exists at 100 TB: corpus-level dashboards (docs per source,
  * tokens per lang, bytes per shard) are recomputed constantly, but between
  * two snapshot versions only a sliver of files differ. The manifest diff
  * names that sliver exactly, and [[Snapshots.signedDelta]] turns it into
  * rows tagged +1 (in added files) / -1 (in removed files). For ADDITIVE
  * aggregates — count, sum, and anything derived from them (avg, ratios) —
  * rows a rewrite merely carried forward cancel inside the aggregate, so the
  * refresh is: one pass over changed files → per-group signed partial →
  * merge with the stored state by group key → drop groups whose net row
  * count hits zero. An append folds in the appended files only; a point-ish
  * copy-on-write merge the overlapping sliver; a compaction (same rows, new
  * layout) is pure cancellation — the state is left bit-identical without
  * reading a single unchanged file twice.
  *
  * Non-additive aggregates (min/max/distinct) are NOT maintainable under
  * deletes from a signed delta alone — a deleted extremum needs the group
  * re-scanned; that is a different operator (recompute the touched groups)
  * and out of scope here.
  *
  * Exactness: measures aggregate as DECIMAL(38,6) — associative,
  * order-independent, engine-exact (the Det.dsum stance) — so an
  * incremental state is bit-identical to a from-scratch recompute, which is
  * exactly what IncrementalSpec pins, and task retries at cluster scale
  * cannot produce a different state.
  *
  * The state itself lives as a Snapshots table at `aggRoot`: each refresh
  * commits the new state tagged `src-v<N>`, so (a) the state names the
  * source version it reflects, (b) a replayed refresh is an observable
  * no-op (the reflected-version walk short-circuits), and (c) state history time-travels
  * like any other table. If the source's reflected manifest has been
  * vacuumed away, the refresh transparently falls back to a full recompute
  * (same result, full-scan cost) — retention is a policy decision, not a
  * correctness hazard.
  */
object Incremental {

  private val Measure = DecimalType(38, 6)

  /** The default no-op expansion, as a stable reference: [[cancelledDelta]]
    * only pays its netting shuffle when a real (fan-out) expansion follows —
    * with no expansion the additive aggregate cancels signs for free. */
  private val NoExpand: DataFrame => DataFrame = identity
  private def srcTag(v: Long) = s"src-v$v"
  private val SrcTagRe = "src-v(\\d+)".r

  /** The source version the stored state reflects; 0 when no state exists. */
  def reflectedVersion(spark: SparkSession, aggRoot: String): Long =
    reflectedAt(spark, aggRoot, Snapshots.headVersion(spark, aggRoot))

  /** Walk the parent chain from `head` to the newest `src-v` tag.
    * UNTAGGED and `optimize:`-tagged commits are skipped: CONTENT-
    * PRESERVING maintenance on the state table itself (compact /
    * compactZOrder / DV materialization — [[Snapshots.OptimizeTag]]) must
    * not make the state unreadable; the maintenance commit reflects
    * whatever source version its newest tagged ancestor did.
    * [[Snapshots.restore]] is NOT
    * in that family — it changes content back to an older refresh — and
    * correctly republishes the target's own `src-v` tag, so the walk lands
    * on the restored refresh's source version, not the pre-restore head's.
    * A FOREIGN non-empty tag still fails loudly — that is some other
    * writer's table. */
  private def reflectedAt(spark: SparkSession, aggRoot: String, head: Long): Long = {
    var v = head
    while (v > 0) {
      require(Snapshots.manifestExists(spark, aggRoot, v),
        s"$aggRoot v$v was vacuumed away beneath maintenance commits (untagged " +
          "or optimize:-tagged) — cannot determine the reflected source " +
          "version; vacuum state tables with keepLast reaching a src-v-tagged " +
          "commit, or rebuild the state")
      // metadata-level read: the tag lives in the commit record, no shard I/O
      val m = Snapshots.manifestMeta(spark, aggRoot, v)
      m.tag match {
        case SrcTagRe(x) => return x.toLong
        case "" => v = m.parent
        // optimize:<uuid> marks a ROW-PRESERVING layout rewrite (compact /
        // z-order / DV materialization, [[Snapshots.OptimizeTag]]) — same
        // content, new files. Maintenance on the state table itself must
        // not wedge the refresh chain: walk to the parent exactly like an
        // untagged commit.
        case t if t.startsWith(Snapshots.OptimizeTag) => v = m.parent
        case other => sys.error(
          s"$aggRoot v$v carries tag '$other', not an Incremental src-v tag — " +
            "is this really an Incremental state table?")
      }
    }
    // head == 0 (no state), or only untagged commits above the base: for a
    // non-empty table that means NO refresh ever ran here — refuse to treat
    // an arbitrary table as a rebuildable state (an overwrite would clobber
    // it silently)
    require(head == 0,
      s"$aggRoot has commits but no src-v tag anywhere in its history — " +
        "not an Incremental state table")
    0L
  }

  /** Bring the state at `aggRoot` up to the source head; returns the source
    * version now reflected. No-op when already current. State schema:
    * `groupCols`, `n_rows` (BIGINT), and `sum_<c>` DECIMAL(38,6) per
    * measure column.
    *
    * `expand` is an optional ROW-LOCAL expansion applied to the signed
    * delta before aggregation — tokenize/explode/derive, anything where
    * each output row descends from one input row and CARRIES ITS `_sign`
    * through. That turns any exploded additive statistic into an
    * incrementally-maintained one: vocabulary counts (explode tokens —
    * each deleted doc's tokens arrive with −1 and cancel their +1 twins),
    * n-gram frequencies, per-label token totals. Cross-row expansions
    * (joins, windows) would let one changed row affect another's
    * contribution and are NOT maintainable this way.
    *
    * Cost honesty: the COMMIT rewrites the whole state table (append=false)
    * — reading the delta is ∝ changed files, but writing is ∝ group count.
    * Right for dashboard-sized states (10²–10⁵ groups); for a vocab-sized
    * state where writing the groups dwarfs the delta, use [[refreshKeyed]],
    * which merges only the touched groups' state files. */
  def refresh(
      spark: SparkSession,
      srcRoot: String,
      aggRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      expand: DataFrame => DataFrame = NoExpand): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    val srcHead = Snapshots.headVersion(spark, srcRoot)
    require(srcHead > 0, s"no snapshot committed at $srcRoot yet")
    val aggHead = Snapshots.headVersion(spark, aggRoot)
    val reflected = reflectedAt(spark, aggRoot, aggHead)
    if (reflected == srcHead) return srcHead

    // vacuumed-away base manifest → full recompute (delta base = empty)
    val fromV =
      if (reflected > 0 && !Snapshots.manifestExists(spark, srcRoot, reflected)) 0L
      else reflected
    val delta =
      if (expand eq NoExpand) NoExpand(Snapshots.signedDelta(spark, srcRoot, fromV, srcHead))
      else expand(cancelledDelta(spark, srcRoot, fromV, srcHead))
    require(delta.columns.contains("_sign"),
      "expand must carry the _sign column through (row-local expansions only)")
    val deltaState = aggregate(delta, groupCols, sumCols, col("_sign").cast("long"))

    val merged =
      if (fromV == 0) deltaState
      else
        Snapshots.read(spark, aggRoot)
          .unionByName(deltaState)
          .groupBy(groupCols.map(col): _*)
          .agg(
            sum(col("n_rows")).as("n_rows"),
            sumCols.map(c =>
              sum(col(s"sum_$c")).cast(Measure).as(s"sum_$c")): _*)
    // requireHead fences the read-modify-write: if a concurrent refresher
    // advanced the state between our reflectedAt read and this commit, the
    // commit aborts loudly instead of double-applying the delta on top of
    // the racer's already-reflecting state. A plain TAGGED commit, not
    // commitIfAbsent: replay protection is already the reflected==srcHead
    // early return (the parent-chain walk), and a global history-tag scan
    // would wrongly no-op the legitimate re-refresh after a state RESTORE —
    // the restored fork's old src-v commits are retained history but no
    // longer ancestors of the head
    Snapshots.commit(
      merged.filter(col("n_rows") > 0), aggRoot,
      append = false, tag = srcTag(srcHead), requireHead = aggHead)
    srcHead
  }

  /** Keyed incremental refresh — the vocab-sized-state composition the
    * [[refresh]] cost-honesty note names. [[refresh]] rewrites the WHOLE
    * state table per refresh (cost ∝ group count): right for dashboard
    * states, wrong for a vocabulary/n-gram state with 10⁸ groups where a
    * batch touches 10⁴ of them. Here the state lives as a KEYED
    * [[Snapshots]] table — one row per group, merge-keyed on
    * `__gh = xxhash64(groupCols)` with per-file `__gh` ColStats — and a
    * refresh is:
    *
    *  1. signed delta over the source's changed files (as [[refresh]]),
    *     aggregated to per-group partials — the TOUCHED groups;
    *  2. a stats-pruned state read of exactly those groups
    *     ([[Snapshots.readForKeys]] on the hash: per-file set membership,
    *     so only state files holding a touched group are opened);
    *  3. fold partials into the read rows (sum n_rows / sum_<c> by group);
    *  4. [[Snapshots.merge]] of the folded rows back, keyed on `__gh` —
    *     untouched state FILES carry forward by reference, so the rewrite
    *     is ∝ touched groups' file footprint, never the state.
    *
    * The numeric hash key is what keeps the pruning machinery (ColStats
    * are numeric-only) effective for STRING group keys — the vocabulary
    * case. A hash collision merely co-locates two groups in the rewrite
    * set (both are read, folded and rewritten correctly — the fold is by
    * the real groupCols, the hash only selects files). A group whose net
    * n_rows reaches zero stays as a tombstone row (merge cannot express
    * key removal); [[readKeyed]] filters them out. Merge rewrites blur the
    * per-file hash ranges over time: periodic maintenance — an UNTAGGED
    * overwrite commit of the (optionally tombstone-filtered) state
    * re-clustered by `repartitionByRange` on `__gh`, exactly the initial
    * build's layout (not [[Snapshots.compactZOrder]]: full-range xxhash64
    * values overflow the z-grid scaling, and one dimension needs no
    * interleaving anyway) — re-tightens them; [[reflectedVersion]] skips
    * untagged maintenance commits by walking to the newest tagged
    * ancestor, so maintenance never wedges the refresh chain. Initial build
    * range-clusters the state on `__gh` into `stateFiles` files so
    * per-file hash ranges start tight. Same `src-v<N>` tagging, replay
    * no-ops, vacuumed-base full rebuild, and concurrent-refresher fencing
    * as [[refresh]]. */
  /** @param tombstoneCompactAt tombstone fraction (net-zero groups / all
    *   state rows) past which a refresh finishes with an automatic untagged
    *   maintenance commit: tombstones dropped, state re-range-clustered on
    *   `__gh` into `stateFiles` files. DEFAULT-ON policy — without it,
    *   net-zero groups persist until someone remembers manual maintenance
    *   and the state carries unbounded dead rows. The check is one
    *   column-pruned count over the state (cheap next to the maintenance
    *   itself, amortized by only firing past the threshold); set > 1.0 to
    *   disable. */
  def refreshKeyed(
      spark: SparkSession,
      srcRoot: String,
      aggRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      expand: DataFrame => DataFrame = NoExpand,
      stateFiles: Int = 32,
      tombstoneCompactAt: Double = 0.3): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    val srcHead = Snapshots.headVersion(spark, srcRoot)
    require(srcHead > 0, s"no snapshot committed at $srcRoot yet")
    val aggHead = Snapshots.headVersion(spark, aggRoot)
    val reflected = reflectedAt(spark, aggRoot, aggHead)
    if (reflected == srcHead) return srcHead
    val fromV =
      if (reflected > 0 && !Snapshots.manifestExists(spark, srcRoot, reflected)) 0L
      else reflected
    val delta =
      if (expand eq NoExpand) NoExpand(Snapshots.signedDelta(spark, srcRoot, fromV, srcHead))
      else expand(cancelledDelta(spark, srcRoot, fromV, srcHead))
    require(delta.columns.contains("_sign"),
      "expand must carry the _sign column through (row-local expansions only)")
    val gh = xxhash64(groupCols.map(col): _*)
    val deltaState = aggregate(delta, groupCols, sumCols, col("_sign").cast("long"))

    if (fromV == 0) {
      // full (re)build: range-cluster on the hash so per-file __gh ranges
      // are tight from the start — what makes every later refresh prune.
      // Plain tagged commit (not commitIfAbsent) for the same reason as
      // [[refresh]]: reflected==srcHead is the replay guard, and a global
      // tag scan would wrongly no-op a post-restore re-refresh
      Snapshots.commit(
        deltaState.filter(col("n_rows") > 0).withColumn("__gh", gh)
          .repartitionByRange(stateFiles, col("__gh"))
          .sortWithinPartitions("__gh"),
        aggRoot, append = false, tag = srcTag(srcHead),
        statsCols = Seq("__gh"), requireHead = aggHead)
      return srcHead
    }
    // the delta partials feed the pruning probe, the state read's semi
    // join, AND the fold — persist so the changed-files scan + aggregation
    // runs once, not once per consumer job
    val keyed = deltaState.withColumn("__gh", gh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE probe of the delta's group-hash set serves emptiness detection,
    // the state read's pruning, AND the merge's pruning (the fold's keys
    // are a subset of the delta's — a superset probe prunes soundly).
    // Before round 9 this was three separate passes: a limit-count, the
    // readForKeys probe, and the merge probe — each a full materialization
    // of a deep plan.
    val probe = Snapshots.probeKeys(keyed.select("__gh"), "__gh")
    // a FILE-identical source change (a restore republishing the exact
    // prior file list) yields a ZERO-ROW delta: the state content is
    // already right, and merge cannot take a key-less batch. Skip the
    // fold; the reflected tag stays at the older version, which names
    // content identical to srcHead, so the next real delta still computes
    // from a correct base.
    if (probe == Snapshots.KeysEmpty) { keyed.unpersist(); return srcHead }
    try {
      // stats-pruned read of the touched FILES' state rows, whole files
      // (tombstones included — they are real state for the fold). No exact
      // key filter: a group from a touched file that the delta didn't
      // touch folds to its identical self and is rewritten in place —
      // content-preserving, and one semi join + broadcast cheaper per
      // refresh than filtering to the key set first.
      val touched = Snapshots.readTouched(spark, aggRoot, "__gh", probe)
      // folded is consumed by merge's own probe, write, and survivors anti
      // join — persist for the same reason (its plan reads state files)
      val folded = touched.unionByName(keyed)
        .groupBy(groupCols.map(col): _*)
        .agg(
          sum(col("n_rows")).as("n_rows"),
          sumCols.map(c =>
            sum(col(s"sum_$c")).cast(Measure).as(s"sum_$c")): _*)
        .withColumn("__gh", gh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // batchReplacesTouched: the fold consumed the touched files WHOLE,
        // so `folded` carries every key those files hold — the merge can
        // write it directly, no survivors re-read/anti-join of state files
        Snapshots.mergeProbed(folded, aggRoot, key = "__gh", probe = probe,
          statsCols = Seq("__gh"), tag = srcTag(srcHead), requireHead = aggHead,
          batchReplacesTouched = true)
        // cheap gate on the (persisted, touched-groups-sized) fold: only a
        // refresh that CREATED tombstones can push the fraction over the
        // threshold, so the common append-shaped refresh skips the
        // state-wide policy count entirely
        if (folded.filter(col("n_rows") === 0).limit(1).count() > 0)
          maybeCompactTombstones(spark, aggRoot, stateFiles, tombstoneCompactAt)
      } finally folded.unpersist()
    } finally keyed.unpersist()
    srcHead
  }

  /** Default-on tombstone reclamation for keyed states: when the net-zero
    * fraction exceeds the threshold, republish the state tombstone-filtered
    * and re-range-clustered on `__gh` — exactly the initial build's layout,
    * as an UNTAGGED maintenance commit (content-preserving for readers:
    * [[readKeyed]] already filters tombstones; [[reflectedAt]] walks past
    * untagged commits, so the refresh chain survives). Best-effort: losing
    * a race to a concurrent refresher must not fail the refresh that
    * already committed — the next refresh past the threshold retries. */
  private def maybeCompactTombstones(
      spark: SparkSession,
      aggRoot: String,
      stateFiles: Int,
      threshold: Double): Unit =
    if (threshold <= 1.0) {
      try {
        val r = Snapshots.read(spark, aggRoot)
          .agg(count(lit(1)).as("n"),
            count(when(col("n_rows") === 0, lit(1))).as("t")).head()
        val (n, t) = (r.getLong(0), r.getLong(1))
        if (n > 0 && t.toDouble / n > threshold)
          Snapshots.commit(
            Snapshots.read(spark, aggRoot).filter(col("n_rows") > 0)
              .repartitionByRange(stateFiles, col("__gh"))
              .sortWithinPartitions("__gh"),
            aggRoot, append = false, statsCols = Seq("__gh"))
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Keyed state rendered for reading: tombstoned groups (net n_rows = 0)
    * dropped, hash key dropped, measures as exact-decimal-cast doubles. */
  def readKeyed(spark: SparkSession, aggRoot: String, sumCols: Seq[String]): DataFrame =
    read(spark, aggRoot, sumCols).filter(col("n_rows") > 0).drop("__gh")

  /** Grouped MIN/MAX maintained incrementally — the non-additive family,
    * where a delete can remove the extremum and no signed cancellation can
    * recover it. Two regimes, chosen per refresh from the delta itself:
    *
    *  - **append-only delta** (no −1 rows): min/max ARE mergeable — fold
    *    the delta's per-group extremes into the stored state
    *    (min-of-mins / max-of-maxes). Cost = the appended files, exactly
    *    like the additive refresh; the dominant regime for ingest-shaped
    *    tables.
    *  - **delta contains deletes**: the delta names the TOUCHED groups;
    *    only their rows re-scan from the head (semi join on the
    *    delta-bounded group list) and recompute, while every untouched
    *    group's state carries forward untouched. A group whose rows all
    *    vanished leaves the state (it is in the touched list and yields
    *    no recomputed row). The re-scan prunes to the touched groups'
    *    data wherever the layout supports it (group-key partitioning /
    *    stats); the state-merge work is ∝ touched groups either way.
    *
    * State schema: `groupCols`, `n_rows`, and `min_<c>`/`max_<c>` per
    * measure column (source-typed). Same `src-v<N>` tagging, replay
    * no-ops, and vacuum fallback as [[refresh]]. */
  def refreshMinMax(
      spark: SparkSession,
      srcRoot: String,
      aggRoot: String,
      groupCols: Seq[String],
      minMaxCols: Seq[String]): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(minMaxCols.nonEmpty, "need at least one min/max column")
    val srcHead = Snapshots.headVersion(spark, srcRoot)
    require(srcHead > 0, s"no snapshot committed at $srcRoot yet")
    val aggHead = Snapshots.headVersion(spark, aggRoot)
    val reflected = reflectedAt(spark, aggRoot, aggHead)
    if (reflected == srcHead) return srcHead
    val fromV =
      if (reflected > 0 && !Snapshots.manifestExists(spark, srcRoot, reflected)) 0L
      else reflected
    val delta = Snapshots.signedDelta(spark, srcRoot, fromV, srcHead)

    def extremes(rows: DataFrame) =
      rows.groupBy(groupCols.map(col): _*)
        .agg(
          count(lit(1)).as("n_rows"),
          minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

    val hasDeletes = !delta.filter(col("_sign") === -1).isEmpty
    val merged =
      if (fromV == 0) extremes(delta.drop("_sign"))
      else if (!hasDeletes) {
        // mergeable regime: re-aggregate stored state ∪ delta extremes
        // (n_rows sums across the two; min/max fold associatively)
        val deltaState = extremes(delta.drop("_sign"))
        Snapshots.read(spark, aggRoot).unionByName(deltaState)
          .groupBy(groupCols.map(col): _*)
          .agg(
            sum(col("n_rows")).as("n_rows"),
            minMaxCols.flatMap(c => Seq(
              min(col(s"min_$c")).as(s"min_$c"),
              max(col(s"max_$c")).as(s"max_$c"))): _*)
      } else {
        // delete regime: recompute exactly the touched groups from the head
        val touched = delta.select(groupCols.map(col): _*).distinct()
        val recomputed = extremes(
          Snapshots.read(spark, srcRoot).join(touched, groupCols, "left_semi"))
        Snapshots.read(spark, aggRoot).join(touched, groupCols, "left_anti")
          .unionByName(recomputed)
      }
    // plain tagged commit — see refresh() for why not commitIfAbsent
    Snapshots.commit(merged, aggRoot, append = false, tag = srcTag(srcHead),
      requireHead = aggHead)
    srcHead
  }

  /** Grouped approximate distinct counts maintained incrementally via
    * mergeable HLL sketches — the third aggregate family: sums cancel
    * (additive), min/max fold-or-recompute, DISTINCT is sketchable. The
    * state stores one HLL sketch per group (`hll_sketch_agg`); an
    * append-only delta UNIONS its sketches into the stored ones
    * (`hll_union_agg` — register-wise max, associative, commutative and
    * idempotent, so the incremental sketch is BIT-IDENTICAL to one built
    * from scratch, and the spec pins estimate equality, not tolerance).
    * Deletes cannot be un-merged from a sketch, so a delta with deletes
    * recomputes exactly the touched groups — the [[refreshMinMax]] split.
    * Reads surface `approx_distinct_<c>` via `hll_sketch_estimate`.
    * The 100 TB use: distinct users/domains/fingerprints per source over a
    * growing corpus at a few KB of state per group, refresh cost = the
    * appended files. */
  def refreshApproxDistinct(
      spark: SparkSession,
      srcRoot: String,
      aggRoot: String,
      groupCols: Seq[String],
      distinctCols: Seq[String]): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(distinctCols.nonEmpty, "need at least one distinct-count column")
    val srcHead = Snapshots.headVersion(spark, srcRoot)
    require(srcHead > 0, s"no snapshot committed at $srcRoot yet")
    val aggHead = Snapshots.headVersion(spark, aggRoot)
    val reflected = reflectedAt(spark, aggRoot, aggHead)
    if (reflected == srcHead) return srcHead
    val fromV =
      if (reflected > 0 && !Snapshots.manifestExists(spark, srcRoot, reflected)) 0L
      else reflected
    val delta = Snapshots.signedDelta(spark, srcRoot, fromV, srcHead)

    def sketches(rows: DataFrame) =
      rows.groupBy(groupCols.map(col): _*)
        .agg(
          count(lit(1)).as("n_rows"),
          distinctCols.map(c => hll_sketch_agg(col(c)).as(s"hll_$c")): _*)

    val hasDeletes = !delta.filter(col("_sign") === -1).isEmpty
    val merged =
      if (fromV == 0) sketches(delta.drop("_sign"))
      else if (!hasDeletes) {
        val deltaState = sketches(delta.drop("_sign"))
        Snapshots.read(spark, aggRoot).unionByName(deltaState)
          .groupBy(groupCols.map(col): _*)
          .agg(
            sum(col("n_rows")).as("n_rows"),
            distinctCols.map(c => hll_union_agg(col(s"hll_$c")).as(s"hll_$c")): _*)
      } else {
        val touched = delta.select(groupCols.map(col): _*).distinct()
        val recomputed = sketches(
          Snapshots.read(spark, srcRoot).join(touched, groupCols, "left_semi"))
        Snapshots.read(spark, aggRoot).join(touched, groupCols, "left_anti")
          .unionByName(recomputed)
      }
    // plain tagged commit — see refresh() for why not commitIfAbsent
    Snapshots.commit(merged, aggRoot, append = false, tag = srcTag(srcHead),
      requireHead = aggHead)
    srcHead
  }

  /** Distinct-count state rendered as estimates: groupCols, n_rows, and
    * `approx_distinct_<c>` per sketched column. */
  def readApproxDistinct(
      spark: SparkSession, aggRoot: String, distinctCols: Seq[String]): DataFrame =
    distinctCols.foldLeft(Snapshots.read(spark, aggRoot)) { (d, c) =>
      d.withColumn(s"approx_distinct_$c", hll_sketch_estimate(col(s"hll_$c")))
        .drop(s"hll_$c")
    }

  /** HISTOGRAM family: per-group fixed-width bin counts of `valueCol` —
    * the distribution sketch behind incrementally-maintained quantiles
    * (corpus quality-score drift, length distributions: the summaries a
    * curation pipeline watches per ingest batch, where re-scanning 100 TB
    * per refresh is the thing being avoided).
    *
    * The theory pull: a histogram is FULLY ADDITIVE — bin counts are sums,
    * so the signed delta maintains it EXACTLY under every change shape.
    * Deletes just subtract (a −1 row cancels its +1 twin's bin count),
    * where the HLL family ([[refreshApproxDistinct]]) must recompute
    * touched groups because a sketch cannot un-merge. The maintained state
    * is bit-identical to a from-scratch rebuild after ANY lifecycle —
    * approximation lives only in the read-side estimator's bin resolution
    * (`binWidth`), never in the maintenance. State schema: groupCols,
    * `__bin` (BIGINT, floor(value / binWidth); the null-valued rows are
    * excluded — they carry no distribution information), `n_rows`.
    *
    * Composition, not new machinery: this IS [[refresh]] with the bin as a
    * derived group column (the expand hook's row-local contract holds —
    * each row's bin is a function of that row alone), so it inherits the
    * src-v tagging, replay protection, restore handling, and
    * vacuumed-base recompute path unchanged. Bin count per group is
    * bounded by value range / binWidth — dashboard-sized, the [[refresh]]
    * whole-state-rewrite cost model's sweet spot. */
  def refreshHistogram(
      spark: SparkSession,
      srcRoot: String,
      aggRoot: String,
      groupCols: Seq[String],
      valueCol: String,
      binWidth: Double): Long = {
    require(binWidth > 0, "binWidth must be positive")
    refresh(spark, srcRoot, aggRoot, groupCols :+ "__bin", Seq.empty,
      expand = d => d.filter(col(valueCol).isNotNull)
        .withColumn("__bin",
          floor(col(valueCol).cast(DoubleType) / binWidth).cast("long")))
  }

  /** Quantile estimates from a maintained histogram state: for each group
    * and each p in `ps`, the LOWER BOUND of the first bin (ascending) whose
    * cumulative count reaches rank ⌈p·total⌉. Resolution is binWidth — the
    * histogram's honest precision — and every step is exact integer/double
    * arithmetic (rank and cumulative are BIGINTs, the bound is bin·width),
    * so the estimate is bit-identical in any engine: no interpolation
    * division whose rounding could differ. Output: groupCols, `p`,
    * `q_est` (DOUBLE), one row per group × p. */
  def readQuantiles(
      spark: SparkSession,
      aggRoot: String,
      groupCols: Seq[String],
      ps: Seq[Double],
      binWidth: Double): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile point")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val cum = Snapshots.read(spark, aggRoot)
      .withColumn("cum",
        sum(col("n_rows")).over(Window.partitionBy(gcols: _*).orderBy(col("__bin"))))
      .withColumn("total",
        sum(col("n_rows")).over(Window.partitionBy(gcols: _*)))
    // small literal explode: |ps| rows per (group, bin) — the state is
    // dashboard-sized by the histogram contract, this is not a data join
    cum.withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("cum") >= greatest(lit(1L), ceil(col("p") * col("total"))))
      .groupBy(gcols :+ col("p"): _*)
      .agg(min(col("__bin")).as("__qbin"))
      .withColumn("q_est", col("__qbin") * lit(binWidth))
      .drop("__qbin")
  }

  /** One signed grouped pass: n_rows = Σ sign, sum_<c> = Σ sign·c — the
    * shape both the delta and a from-scratch build share (a full build is
    * the delta from the empty base). */
  /** The signed delta with carried-forward rows cancelled BEFORE any
    * expansion. A copy-on-write rewrite re-emits every SURVIVING row of a
    * touched file with both signs — for a scattered-key merge that can be
    * 10-100× more rows than actually changed — and an expand-heavy refresh
    * (tokenization fans each row into hundreds) pays the expansion and two
    * shuffles for rows that algebraically cancel anyway. One groupBy over
    * the delta's own rows (cost ∝ changed files — the delta's own bound,
    * never the table) nets the signs per full-row value first: net-zero
    * rows vanish, net-±k rows carry `_sign = ±k`, exact because every
    * consumer multiplies by `_sign` rather than counting rows. Pure
    * appends (no removed files) and full rebuilds skip the pass — nothing
    * can cancel; a map-typed column disables it (maps aren't groupable) —
    * cancellation is an optimization, the algebra is correct without it. */
  private def cancelledDelta(
      spark: SparkSession,
      srcRoot: String,
      fromV: Long,
      toV: Long): DataFrame = {
    val raw = Snapshots.signedDelta(spark, srcRoot, fromV, toV)
    if (fromV == 0) return raw
    val (_, removed) = Snapshots.diffFiles(spark, srcRoot, fromV, toV)
    if (removed.isEmpty) return raw
    val dataCols = raw.schema.fields.filterNot(_.name == "_sign")
    if (dataCols.exists(f => hasMap(f.dataType))) return raw
    raw.groupBy(dataCols.map(f => col(f.name)).toSeq: _*)
      .agg(sum(col("_sign")).cast("int").as("_sign"))
      .filter(col("_sign") =!= 0)
  }

  private def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
    case _ => false
  }

  private def aggregate(
      rows: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      sign: Column): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(
        sum(sign).as("n_rows"),
        sumCols.map(c =>
          sum(sign * col(c).cast(Measure)).cast(Measure).as(s"sum_$c")): _*)

  /** Current state, measures presented as exact-decimal-cast doubles (the
    * Det.dsum rendering). */
  def read(spark: SparkSession, aggRoot: String, sumCols: Seq[String]): DataFrame = {
    val st = Snapshots.read(spark, aggRoot)
    sumCols.foldLeft(st)((d, c) =>
      d.withColumn(s"sum_$c", col(s"sum_$c").cast(DoubleType)))
  }
}
