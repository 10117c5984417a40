package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) tables — SHUFFLE-FREE co-located joins.
  *
  * The biggest recurring cost of a 100 TB star join is the shuffle: every
  * fact⋈fact or fact⋈large-dim join hash-exchanges BOTH sides across the
  * cluster before a single row matches. Bucketing pays that exchange ONCE
  * at write time: rows are hash-clustered into a fixed number of buckets
  * on the join key, the layout is recorded in the catalog, and Catalyst's
  * `EnsureRequirements` then recognizes both sides of a key-equi join as
  * already `HashPartitioning`-compatible — the SortMergeJoin plans with NO
  * ShuffleExchange on either side (BucketedJoinSpec pins exactly that).
  * Every repeated join on the bucketed key after that is exchange-free;
  * nightly fact-to-fact reconciliations amortize the one-time layout cost
  * within a run or two.
  *
  * Spark-first mechanics, not a custom operator: `bucketBy` + `sortBy` on
  * the DataFrameWriter, an EXTERNAL table (explicit `path`) so the data
  * lands in the caller's lake directory, and the session catalog carrying
  * the bucket spec (bucketing metadata cannot live in bare parquet paths —
  * that is WHY this API goes through `saveAsTable` while the rest of the
  * engine is path-based). Both sides must bucket into the SAME count on
  * their respective join keys; the key COLUMNS may differ in name (the
  * partitioning matches on the join's equi-keys, not on names).
  *
  * sortBy(key) additionally orders each bucket file so the merge side of
  * the join (and any per-key window downstream) starts from sorted runs.
  */
object Bucketed {

  /** Write `df` as an external bucketed table at `path`, replacing any
    * prior registration of `table`. `buckets` must match on every table
    * this one will join bucket-to-bucket. */
  def write(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      path: String,
      sorted: Boolean = true): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w0 = df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
    (if (sorted) w0.sortBy(key) else w0).saveAsTable(table)
  }

  /** The bucketed table as a DataFrame — scans carry the bucket spec, so
    * joins/aggregations on the bucket key plan exchange-free. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
