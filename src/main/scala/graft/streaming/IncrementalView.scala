package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.engine.{Incremental, Snapshots}

/** Streaming materialized view over a snapshot table — ingest and exact
  * aggregate maintenance in one trigger, both sides idempotent.
  *
  * Per micro-batch: (1) the batch commits atomically to the snapshot table
  * under its `batch-<id>` tag ([[SnapshotSink]]'s contract — a replayed
  * trigger is an observable no-op); (2) [[Incremental.refresh]] brings the
  * stored per-group state up to the new head, reading ONLY the files the
  * commit added (the manifest diff), and itself no-ops on replay via the
  * `src-v<N>` state tag. The view is therefore exactly-once in effect end
  * to end, and the per-trigger maintenance cost is the batch — never the
  * accumulated table — which is the property that keeps a standing
  * corpus-stats dashboard (docs/tokens per source, bytes per shard) alive
  * at 100 TB. Unlike EventStream's upsert-based warehouse view (update-mode
  * deltas converging per key), this state is bit-identical to a
  * from-scratch recompute at every trigger boundary, including through
  * compaction/merge/delete commits that interleave from maintenance jobs.
  */
object IncrementalView {

  /** @param keyed route the per-trigger refresh through
    *   [[Incremental.refreshKeyed]] instead of [[Incremental.refresh]]:
    *   the state lives as a `__gh`-keyed snapshot and each trigger merges
    *   ONLY the touched groups' state files instead of rewriting the whole
    *   state. Same exactly-once tags; the right mode the moment the state
    *   is vocab-sized (trigger cost must be ∝ the batch's groups, not the
    *   group universe). */
  def start(
      source: DataFrame,
      root: String,
      aggRoot: String,
      checkpointDir: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      expand: DataFrame => DataFrame = identity,
      statsCols: Seq[String] = Seq.empty,
      keyed: Boolean = false): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingest(batch, id, root, aggRoot, groupCols, sumCols, expand, statsCols, keyed)
      }
      .start()

  /** [[start]] for the SKETCHABLE family: per-trigger
    * [[Incremental.refreshApproxDistinct]] maintains per-group HLL
    * sketches — each arriving batch unions register-wise into the stored
    * sketches (append deltas are the streaming regime, so every trigger
    * takes the mergeable path and the maintained sketch stays
    * bit-identical to a rebuild); a delete commit interleaved by a
    * maintenance job routes its touched groups through the recompute path
    * at the next trigger. Same exactly-once tags both sides, so a
    * replayed trigger is an observable no-op. The standing
    * distinct-users/domains-per-source dashboard at a few KB of state per
    * group — and [[graft.plans.ViewRewrite]] answers analyst
    * `hll_sketch_estimate` queries from this state with zero extra wiring. */
  def startApproxDistinct(
      source: DataFrame,
      root: String,
      aggRoot: String,
      checkpointDir: String,
      groupCols: Seq[String],
      distinctCols: Seq[String],
      statsCols: Seq[String] = Seq.empty): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestApproxDistinct(batch, id, root, aggRoot, groupCols, distinctCols,
          statsCols)
      }
      .start()

  /** One [[startApproxDistinct]] trigger, public as the replay-safe
    * building block. */
  def ingestApproxDistinct(
      batch: DataFrame,
      batchId: Long,
      root: String,
      aggRoot: String,
      groupCols: Seq[String],
      distinctCols: Seq[String],
      statsCols: Seq[String] = Seq.empty): Unit = {
    Snapshots.commitIfAbsent(batch, root, tag = s"batch-$batchId",
      append = true, statsCols = statsCols)
    Incremental.refreshApproxDistinct(batch.sparkSession, root, aggRoot,
      groupCols, distinctCols)
    ()
  }

  /** One trigger: atomic tagged commit + incremental refresh. Public as the
    * replay-safe building block (and for direct batch-mode catch-up). */
  def ingest(
      batch: DataFrame,
      batchId: Long,
      root: String,
      aggRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      expand: DataFrame => DataFrame = identity,
      statsCols: Seq[String] = Seq.empty,
      keyed: Boolean = false): Unit = {
    Snapshots.commitIfAbsent(batch, root, tag = s"batch-$batchId",
      append = true, statsCols = statsCols)
    if (keyed)
      Incremental.refreshKeyed(batch.sparkSession, root, aggRoot, groupCols, sumCols, expand)
    else
      Incremental.refresh(batch.sparkSession, root, aggRoot, groupCols, sumCols, expand)
    ()
  }
}
