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
    *   metadata / N) amortized cost. */
  def start(
      source: DataFrame,
      root: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq.empty,
      compactManifestsEvery: Int = 0): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Snapshots.commitIfAbsent(batch, root, tag = s"batch-$id",
          append = true, statsCols = statsCols)
        if (compactManifestsEvery > 0 && id % compactManifestsEvery == compactManifestsEvery - 1)
          // optional maintenance, best-effort: a concurrent commit between
          // compactManifests' head read and its publish throws its
          // requireHead fence — that must not kill the whole streaming
          // query; the next eligible trigger retries
          try Snapshots.compactManifests(batch.sparkSession, root)
          catch { case scala.util.control.NonFatal(_) => () }
        ()
      }
      .start()
}
