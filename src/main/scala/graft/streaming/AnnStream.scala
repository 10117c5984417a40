package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.plans.GraftExtensions

/** Streaming IVF index maintenance — the standing-pipeline form of the
  * q43/q52 ANN queries. A batch IVF build re-assigns the ENTIRE corpus to
  * cells on every refresh; here each arriving embedding pays its
  * nearest-centroid assignment exactly once, and the accumulated index is
  * only ever READ cell-pruned at query time.
  *
  * The coarse quantizer (centroid set) is trained once and FIXED across
  * triggers — the standard IVF deployment contract (re-training means
  * re-indexing, a batch operation by nature). Per trigger:
  *  1. the fresh batch is assigned to its nearest cell (centroids broadcast
  *     — the one deliberately O(batch × centroids) step, exactly k-means
  *     assignment; centroid count grows ~√N, batch size is bounded by the
  *     trigger, so this never touches the corpus);
  *  2. rows land under `batch=<id>` partitioned by `cell` — a replayed
  *     trigger overwrites its own directory, so at-least-once delivery
  *     cannot duplicate index rows (exactly-once in effect).
  *
  * [[search]] probes like the batch queries: assign each query vector to
  * its top-`nprobe` cells, read ONLY those cells' directories (the `cell`
  * partition column prunes at plan time — AnnStreamSpec pins the
  * `PartitionFilters`), exact-cosine re-rank of the candidates. At 100 TB
  * the probe cost is the probed cells' files, never the index.
  *
  * Scoring runs on the native codegen [[graft.plans.DotF32]] — the
  * production float path (same IEEE left-to-right fold everywhere), while
  * the oracle-checked q43/q52 keep the exact-decimal exploded form for
  * cross-engine bit-equality. Streamed-vs-batch agreement is spec-pinned
  * instead: the same search over an index built in one shot equals one
  * built by triggers (AnnStreamSpec).
  */
object AnnStream {

  /** Deterministic seed centroids (the q43 seed rule): every `stride`-th
    * vector, keyed by its own id. */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String, stride: Long): DataFrame =
    emb.filter(col(idCol) % stride === 1)
      .select(col(idCol).as("c_id"), col(vecCol).as("cvec"))

  /** Top-`nprobe` cells per vector by cosine against the broadcast
    * centroids (query-side norm is rank-invariant and skipped; ties break
    * on c_id). Returns the input columns plus (cell, rn). */
  private def assignCells(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    GraftExtensions.register(df.sparkSession)
    val score = call_function("dot_f32", col(vecCol), col("cvec")) /
      sqrt(call_function("dot_f32", col("cvec"), col("cvec")))
    val w = Window.partitionBy(col(idCol)).orderBy(score.desc, col("c_id"))
    df.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .withColumnRenamed("c_id", "cell")
      .drop("cvec")
  }

  /** Maintain the cell index over a stream of embeddings. */
  def maintain(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, indexDir: String, checkpointDir: String): StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) ingestBatch(batch, idCol, vecCol, centroids, indexDir, batchId)
      }
      .start()

  /** One trigger's ingest: assign the batch to cells, land it under its own
    * idempotent `batch=<id>` directory, partitioned by cell. Public because
    * it doubles as the one-shot batch build (a batch index IS a single
    * trigger's ingest). */
  def ingestBatch(
      batch: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, indexDir: String, batchId: Long): Unit =
    assignCells(batch, idCol, vecCol, centroids, nprobe = 1)
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"), col("cell"))
      .write.mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$indexDir/batch=$batchId")

  /** Probe the index: top-`k` nearest neighbors (exact cosine, ties on
    * cand_id) for each query vector, searching only the query's top-
    * `nprobe` cells. The probed cell ids are collected to the driver — a
    * ≤ nprobe × |queries| list bounded by the centroid count (the standard
    * build-side pattern) — so the index scan is partition-pruned at plan
    * time. */
  def search(
      queries: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, indexDir: String, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    GraftExtensions.register(spark)
    val probes = assignCells(queries, idCol, vecCol, centroids, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("cell"))
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    // fused: dot + both norms in ONE pass over the arrays (CosineF32) —
    // the composed dot_f32 form would walk each pair three times
    val cos = call_function("cosine_f32", col("qvec"), col("vec")).cast(DoubleType)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    index.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"), cos.as("cosine"))
      // nprobe>1 probes distinct cells, so (query, candidate) pairs are
      // already unique — no distinct needed
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cosine")
  }
}
