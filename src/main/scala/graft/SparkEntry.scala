package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.engine.{Det, Tables}
import graft.queries.OracleQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain registries (graft.queries.*); every
  * entry pairs the Spark build with a DuckDB oracle in `oracleSql` under the
  * same name, with column names/types and row order matched exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped: parquet scan with pushed filter → partial+final hash
    * aggregation → small sort. Exercises scan, codegen agg, and exchange.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        sum(Det.revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** All operator-coverage queries (SURVEY.md §2 inventory + extensions). */
  def registry: Seq[OracleQuery] =
    graft.queries.Relational.queries ++ graft.queries.Relational2.queries ++
      graft.queries.Relational3.queries ++ graft.queries.Events.queries ++
      graft.queries.TextAnalysis.queries ++ graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++ graft.queries.MultimodalQ.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Skew.queries ++
      graft.queries.TrainingOps.queries ++ graft.queries.Lake.queries ++
      graft.queries.Retrieval.queries ++ graft.queries.Quality.queries ++
      graft.queries.Rewrite.queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
