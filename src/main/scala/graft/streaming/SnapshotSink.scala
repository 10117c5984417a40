package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.engine.Snapshots

/** Streaming ingest into a snapshot-manifested table: each micro-batch is
  * ONE atomic append commit, tagged with its batch id.
  *
  * Contract vs the plain parquet `lakeSink` (EventStream.scala): the file
  * sink makes rows visible file by file as tasks finish — a reader during a
  * trigger sees a torn batch. Here a batch's files exist but are invisible
  * until its manifest publishes, so readers only ever observe whole-batch
  * states, and time travel walks the ingest history batch by batch.
  * Exactly-once: foreachBatch replays a batch after a restart; the batch-id
  * tag makes the replay a observable no-op (`Snapshots.commitIfAbsent`), so
  * the table never absorbs a batch twice. Maintenance (compact/vacuum) can
  * run concurrently — commits are optimistic, the loser retries on the
  * refreshed head.
  */
object SnapshotSink {

  /** @param compactManifestsEvery consolidate the table's accumulated
    *   metadata shards every N batches (0 = never). Streaming ingest
    *   creates one shard per trigger; after 10k triggers every read
    *   resolves 10k small files. [[Snapshots.compactManifests]] is
    *   metadata-only (same files, same stats, one commit) and idempotent
    *   on replay (a single-shard head no-ops), so folding it into the
    *   ingest loop keeps resolution O(1)-ish forever at O(table
    *   metadata / N) amortized cost.
    * @param clusterBy hash-cluster every batch commit on (column, buckets)
    *   ([[Snapshots.Clustering]]): the streamed-into table keeps its
    *   storage-partitioned-join layout, so downstream joins/aggs on the
    *   key never shuffle it. Each trigger adds ≤ buckets files per batch;
    *   pair with `compactClusteredEvery` to fold them back to one per
    *   bucket WITHOUT dropping the spec (plain compaction would).
    * @param compactClusteredEvery run [[Snapshots.compactClustered]]
    *   every N batches (0 = never) — the clustered twin of
    *   `compactManifestsEvery`, same best-effort semantics: a concurrent
    *   commit aborts the maintenance, never the query. */
  def start(
      source: DataFrame,
      root: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq.empty,
      compactManifestsEvery: Int = 0,
      clusterBy: Option[(Seq[String], Int)] = None,
      compactClusteredEvery: Int = 0): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        try Snapshots.commitIfAbsent(batch, root, tag = s"batch-$id",
          append = true, statsCols = statsCols, clusterBy = clusterBy)
        catch {
          // a batch commit's only fence is the clustering-spec
          // re-validation: a concurrent commit dropped or changed the
          // head's spec beneath this clustered ingest. Swallowing would
          // DROP the batch (the replay tag is per-trigger), so the query
          // must stop — but with an actionable terminal error instead of
          // a bare requirement trace
          case e: Snapshots.ConcurrentCommitException =>
            throw new IllegalStateException(
              s"clustered streaming ingest into $root halted: a concurrent " +
                "commit changed the table's clustering spec beneath the " +
                "stream. Re-cluster the table (overwrite commit with the " +
                "sink's clusterBy) and restart from the checkpoint, or " +
                "restart the sink without clusterBy. Cause: " + e.getMessage, e)
        }
        // optional maintenance, best-effort: a concurrent commit between
        // the maintenance op's head read and its publish throws its
        // requireHead fence — that must not kill the whole streaming
        // query; the next eligible trigger retries
        if (compactManifestsEvery > 0 && id % compactManifestsEvery == compactManifestsEvery - 1)
          try Snapshots.compactManifests(batch.sparkSession, root)
          catch { case scala.util.control.NonFatal(_) => () }
        if (compactClusteredEvery > 0 && id % compactClusteredEvery == compactClusteredEvery - 1)
          try Snapshots.compactClustered(batch.sparkSession, root,
            statsCols = statsCols)
          catch { case scala.util.control.NonFatal(_) => () }
        ()
      }
      .start()

  /** Streaming QUALITY GATE: every trigger's rows are audited row-by-row
    * ([[graft.operators.Expect.annotate]]); clean rows append to the table,
    * violating rows append — with their `_failed` rule names — to a
    * QUARANTINE snapshot table. Nothing is dropped: triage reads the
    * quarantine, repairs, and re-ingests. Both commits carry the batch-id
    * tag, so a replayed trigger no-ops on both tables (exactly-once in
    * effect), and the decision is deterministic per batch, so replay and
    * first run always agree. One annotate pass per trigger — the audit is
    * a conditional projection, not a second scan. */
  def startGated(
      source: DataFrame,
      root: String,
      quarantineRoot: String,
      checkpointDir: String,
      rules: Seq[graft.operators.Expect.Rule],
      statsCols: Seq[String] = Seq.empty): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, size}
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val annotated = graft.operators.Expect.annotate(batch, rules)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val clean = annotated.filter(size(col("_failed")) === 0).drop("_failed")
          val bad = annotated.filter(size(col("_failed")) > 0)
          // main commits every trigger (time travel stays batch-aligned);
          // the quarantine commits only when there is something to hold
          Snapshots.commitIfAbsent(clean, root, tag = s"batch-$id",
            append = true, statsCols = statsCols)
          if (!bad.isEmpty)
            Snapshots.commitIfAbsent(bad, quarantineRoot, tag = s"batch-$id",
              append = true)
        } finally annotated.unpersist()
        ()
      }
      .start()
  }

  /** [[startGated]] for a CONSTRAINED table: the gate IS the table's
    * persisted [[graft.engine.Checks]] rules, re-read each trigger (a
    * check added or dropped mid-stream applies from the next trigger).
    * The operational gap this closes: on a checked table a plain sink is
    * one poison pill from a crash loop — the write-path enforcement
    * aborts the whole batch, the trigger replays, and the stream fails
    * forever. Here the violating rows quarantine with the rule names they
    * failed (`_failed`), the clean rows land, both exactly-once under the
    * batch tag; a check-less table degrades to a plain append sink (still
    * recording its split decision). Rule evaluation uses CHECK semantics
    * (TRUE or NULL passes), and a batch omitting a checked column
    * evaluates it as null per the schema-merging read.
    *
    * Replay protocol — the subtlety a mutable gate adds: startGated's
    * batch-tag scheme assumes the clean/bad split is DETERMINISTIC per
    * batch, and a rule set that changed between a crash and its replay
    * breaks that (a row clean under the old rules but bad under the new
    * ones would be re-quarantined after already landing — or worse, a
    * formerly-bad row would be re-classified clean, see the root tag, and
    * be written NOWHERE). So the split decision itself is made durable:
    * the QUARANTINE commit happens first and ALWAYS (empty included), and
    * a replay that finds it re-derives the clean set from the RECORDED
    * bad rows (batch ∖ quarantined, multiset semantics) instead of
    * re-gating — the first attempt's decision wins, whatever the rules
    * say now. */
  def startChecked(
      source: DataFrame,
      root: String,
      quarantineRoot: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq.empty): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestChecked(batch, id, root, quarantineRoot, statsCols)
      }
      .start()
  }

  /** One [[startChecked]] trigger — public as the replay-safe building
    * block (and so the replay protocol is directly testable). */
  def ingestChecked(
      batch: DataFrame,
      id: Long,
      root: String,
      quarantineRoot: String,
      statsCols: Seq[String] = Seq.empty): Unit = {
    import org.apache.spark.sql.functions.{array, col, size}
    val spark = batch.sparkSession
    val tag = s"batch-$id"
    val keep = batch.columns.toSeq.map(col)
    val decided = Snapshots.headVersion(spark, quarantineRoot) > 0 &&
      Snapshots.historyMeta(spark, quarantineRoot).exists(_.tag == tag)
    if (decided) {
      // the split was already recorded — honor it verbatim, even if the
      // rule set changed since (determinism is what the tag scheme needs)
      val v = Snapshots.historyMeta(spark, quarantineRoot)
        .find(_.tag == tag).get.version
      val bad = Snapshots.changes(spark, quarantineRoot, v - 1, v)
        .select(keep: _*)
      Snapshots.commitIfAbsent(batch.exceptAll(bad), root, tag,
        append = true, statsCols = statsCols)
    } else {
      val (aug, rules) = graft.engine.Checks.gate(spark, root, batch)
      val annotated =
        if (rules.isEmpty) batch.withColumn("_failed", array().cast("array<string>"))
        else graft.operators.Expect.annotate(aug, rules)
          .select(keep :+ col("_failed"): _*)
      val cached = annotated
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val clean = cached.filter(size(col("_failed")) === 0).select(keep: _*)
        val bad = cached.filter(size(col("_failed")) > 0)
        // quarantine FIRST and ALWAYS: its tagged version IS the durable
        // split decision a replay re-derives from (an empty one is the
        // record that everything was clean)
        Snapshots.commitIfAbsent(bad, quarantineRoot, tag, append = true)
        Snapshots.commitIfAbsent(clean, root, tag, append = true,
          statsCols = statsCols)
      } finally cached.unpersist()
    }
    ()
  }

  /** Apply an upsert/delete CHANGE FEED to a snapshot table — the "CDC
    * apply" sink (Delta's foreachBatch-merge pattern as a first-class
    * verb): rows carry the target's columns plus `opCol` ('U' upsert /
    * 'D' delete) and `seqCol` (intra-batch ordering). Per trigger the
    * batch compacts to the LATEST op per key (a CDC feed legitimately
    * flips one key several times inside a trigger; MERGE's cardinality
    * contract wants exactly one), then ONE `mergeInto` applies it:
    * matched+D deletes, matched updates every non-key column, unmatched
    * non-D inserts — and an unmatched D is correctly a no-op. Cost per
    * trigger is the batch's keys' files (stats/bloom-pruned copy-on-write),
    * never the table. Exactly-once: the merge commit carries the batch-id
    * tag and a replayed trigger observes it and no-ops. */
  def startCdcApply(
      source: DataFrame,
      root: String,
      key: String,
      opCol: String,
      seqCol: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    import graft.engine.MergeClause
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val tag = s"cdc-batch-$id"
        val applied = Snapshots.historyMeta(spark, root).exists(_.tag == tag)
        if (!applied && !batch.isEmpty) {
          val w = Window.partitionBy(key)
            .orderBy(col(seqCol).desc, col(opCol).desc)
          val latest = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn", seqCol)
          val attrs = latest.columns.filterNot(c => c == key || c == opCol)
          Snapshots.mergeInto(latest, root, key,
            Seq(
              MergeClause.Delete(Some(col(s"s.$opCol") === "D")),
              MergeClause.Update(attrs.map(c => c -> col(s"s.$c")).toMap),
              MergeClause.Insert(
                (key +: attrs).map(c => c -> col(s"s.$c")).toMap,
                cond = Some(col(s"s.$opCol") =!= "D"))),
            statsCols = statsCols, tag = tag, bloomCols = bloomCols)
        }
        ()
      }
      .start()
  }

  /** Streaming WRITE-AUDIT-PUBLISH: each trigger lands on a fresh BRANCH
    * of the table, the audit runs against the candidate table state (base
    * rows + batch — the view table-level invariants need), and only a
    * clean candidate fast-forwards main ([[graft.engine.Branches]]). A
    * failing batch is committed WHOLE to the quarantine table and main
    * never moves — readers observe only audited states, ever.
    *
    * Use [[startGated]] when rules are per-row properties of the batch;
    * use this when a rule must see batch and table together (referential
    * shapes, distribution bounds) — and note an audit over the candidate
    * STATE means a pre-existing violation blocks every subsequent batch,
    * which is the honest reading of a table-level invariant.
    *
    * Exactly-once: the publish commit carries `publish:batch-<id>` and the
    * quarantine commit `batch-<id>`; a replayed trigger observes either
    * tag and no-ops. Single-writer on main is assumed (the streaming
    * norm); if maintenance slips a commit between fork and publish, the
    * fast-forward fence throws, the query restarts, and the replay retries
    * against the fresh head — nothing is lost or doubled. */
  def startWap(
      source: DataFrame,
      root: String,
      quarantineRoot: String,
      checkpointDir: String,
      rules: Seq[graft.operators.Expect.Rule],
      statsCols: Seq[String] = Seq.empty): StreamingQuery = {
    import graft.engine.Branches
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val name = s"batch-$id"
        val published =
          Snapshots.historyMeta(spark, root).exists(_.tag == s"publish:$name")
        val quarantined = Snapshots.headVersion(spark, quarantineRoot) > 0 &&
          Snapshots.historyMeta(spark, quarantineRoot).exists(_.tag == name)
        if (!published && !quarantined) {
          // bootstrap: a branch needs a base to fork — a fresh table gets
          // an empty v1 with the stream's schema (tagged, so a crash-and-
          // replay between this and the fork is a plain re-entry)
          if (Snapshots.headVersion(spark, root) == 0)
            Snapshots.commit(batch.limit(0), root, tag = "wap-base")
          Branches.drop(spark, root, name) // debris of a crashed attempt
          Branches.fork(spark, root, name)
          Snapshots.commit(batch, Branches.root(root, name), append = true,
            statsCols = statsCols)
          Branches.publishIf(spark, root, name, rules) match {
            case Right(_) => ()
            case Left(_) =>
              Snapshots.commitIfAbsent(batch, quarantineRoot, tag = name,
                append = true)
          }
          Branches.drop(spark, root, name)
        }
        ()
      }
      .start()
  }
}
