package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum — the two-level scan that replaces a
  * single giant window partition.
  *
  * `Window.partitionBy(group).orderBy(key)` funnels every row of one group
  * through ONE task; with few groups (e.g. per-language scans over a corpus)
  * that is a serial bottleneck at 100 TB no matter how many executors exist.
  * The classic fix is the parallel scan: chunk each group into order-
  * contiguous ranges, prefix-sum locally per chunk, prefix-sum the tiny
  * per-chunk totals, and add the chunk offset back. All three passes are
  * data-parallel; the only serial structure left is the per-group chunk-
  * total scan, whose size is the chunk COUNT, not the row count.
  *
  * Chunks come from `repartitionByRange` over (group, key), so each Spark
  * partition holds an order-contiguous slice and `spark_partition_id()` is
  * the chunk id. Range boundaries are sampled and may vary run-to-run, but
  * the RESULT is boundary-independent (a prefix sum doesn't care where the
  * chunks were cut) — so outputs stay bit-deterministic and oracle-checkable.
  *
  * Requires `key` to be unique within each group (ties straddling a chunk
  * boundary would make "rows before me" ambiguous — same caveat as any
  * ordered scan).
  */
object PrefixSum {

  /** Loan-pattern form: compute the prefix sum, hand the result to `f`, and
    * unpersist the internal chunked relation afterwards — self-contained
    * cache hygiene for library callers outside a per-query clearCache
    * contract. The release happens only after `f` returns because the chunk
    * ids come from SAMPLED range boundaries: unpersisting while a consumer
    * could still recompute the lineage would let the local-prefix and offset
    * sides see different boundaries (torn sums). Consume the result fully
    * inside `f` (count/collect/write); a DataFrame that lazily escapes `f`
    * stays correct but may recompute the whole lineage per action. */
  def withExclusive[A](
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      valueCol: String,
      chunks: Int,
      out: String)(f: DataFrame => A): A = {
    val (result, chunked) = build(df, groupCols, keyCol, valueCol, chunks, out)
    try f(result)
    finally chunked.unpersist(blocking = false)
  }

  /** Append `out` = exclusive prefix sum of `valueCol` ordered by `keyCol`
    * within each `groupCols` group, computed as a two-level parallel scan
    * over `chunks` range partitions.
    *
    * Persists an internal relation for the duration of the result's
    * consumption; callers under a per-query `clearCache` contract (every
    * SparkEntry query) get release for free. Library callers should prefer
    * [[withExclusive]], which unpersists in an epilogue. */
  def exclusive(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      valueCol: String,
      chunks: Int,
      out: String): DataFrame =
    build(df, groupCols, keyCol, valueCol, chunks, out)._1

  /** Returns (result, the persisted chunked relation backing it). */
  private def build(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      valueCol: String,
      chunks: Int,
      out: String): (DataFrame, DataFrame) = {
    require(chunks > 0, "chunks must be > 0")
    val grp = groupCols.map(col)
    // persisted, NOT recomputed per consumer: the chunk id comes from the
    // sampled range boundaries, and the local-prefix side and the offset
    // side must see the SAME boundaries. Without materialization that
    // agreement would hang on runtime exchange reuse (fragile), and the
    // upstream expression work would run twice besides.
    val chunked = df
      .repartitionByRange(chunks, (groupCols :+ keyCol).map(col): _*)
      .withColumn("__chunk", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val localW = Window.partitionBy(grp :+ col("__chunk"): _*).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = chunked
      .withColumn("__local", coalesce(sum(valueCol).over(localW), lit(0)))
    // per-(group, chunk) totals: ~`chunks` rows per group — the only scan
    // that still runs within one task per group, now over chunk counts
    val offW = Window.partitionBy(grp: _*).orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked
      .groupBy(grp :+ col("__chunk"): _*).agg(sum(valueCol).as("__ctot"))
      .withColumn("__off", coalesce(sum("__ctot").over(offW), lit(0)))
      .select((groupCols :+ "__chunk").map(c => col(c).as(s"__o_$c")) :+ col("__off"): _*)
    // null-SAFE equi keys (<=>): a plain equi join would silently drop rows
    // whose group column is null, but Window.partitionBy (the contract this
    // operator replaces) keeps null groups as their own partition
    val cond = (groupCols :+ "__chunk")
      .map(c => col(c) <=> col(s"__o_$c"))
      .reduce(_ && _)
    val result = local
      .join(offsets, cond)
      .withColumn(out, col("__local") + col("__off"))
      .drop((groupCols :+ "__chunk").map(c => s"__o_$c"): _*)
      .drop("__local", "__off", "__chunk")
    (result, chunked)
  }
}
