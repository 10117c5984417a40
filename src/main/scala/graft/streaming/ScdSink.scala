package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Scd

/** Streaming SCD2 maintenance: a dimension FEED (key + attributes + a
  * BIGINT event-time column) rides Structured Streaming straight into a
  * versioned [[graft.engine.Scd]] dimension — each micro-batch is one
  * close-and-insert fold, so as-of joins ([[Scd.enrich]]) serve the history
  * while the feed is still running.
  *
  * Batch semantics: within a trigger, each key's LATEST observation (by the
  * event-time column) wins — SCD2 at micro-batch granularity records one
  * version per key per trigger, not one per intra-batch flicker; feeds
  * carrying at most one observation per (key, ts) get deterministic folds.
  * The whole batch applies at ONE effective time, the batch's max event
  * time ([[Scd.merge]]'s interval algebra needs a single monotone ts; a
  * watermark-ordered feed satisfies it naturally). Unchanged observations
  * are no-ops by construction.
  *
  * Exactly-once across restarts: foreachBatch replays the last uncommitted
  * batch after a crash; a replayed fold sees every row equal to its current
  * version, the changed set comes out empty, and no commit happens — the
  * [[Scd]] no-op-replay contract, now carrying a per-batch tag for audit.
  * Combined with the file source's checkpoint, the dimension history is
  * exactly-once across kill/restart at any point (ScdSinkSpec drives the
  * boundary). At 100 TB: the fold's cost is the CHANGED KEYS' files only
  * (the [[graft.engine.Snapshots]] copy-on-write path), so a trickle feed
  * against a billion-row dimension touches slivers per trigger, never the
  * table.
  */
object ScdSink {

  def start(
      source: DataFrame,
      root: String,
      key: String,
      tsCol: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq.empty): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, root, key, tsCol, id, statsCols)
        ()
      }
      .start()

  /** One trigger's fold, exposed for tests. */
  private[graft] def applyBatch(
      batch: DataFrame,
      root: String,
      key: String,
      tsCol: String,
      batchId: Long,
      statsCols: Seq[String]): Unit = {
    require(batch.columns.contains(key), s"feed carries no '$key' column")
    require(batch.columns.contains(tsCol), s"feed carries no '$tsCol' column")
    // one small agg decides emptiness AND the batch's effective time
    val r = batch.agg(count(lit(1)).as("n"), max(col(tsCol)).as("m")).head
    if (r.getLong(0) == 0) return // empty trigger: nothing to fold
    val ts = r.getAs[Number]("m").longValue()
    val latest = batch
      .withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(col(tsCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn", tsCol)
    Scd.merge(latest, root, key, ts = ts, statsCols = statsCols,
      tag = s"batch-$batchId")
    ()
  }
}
