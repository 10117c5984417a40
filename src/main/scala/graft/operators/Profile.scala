package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Single-pass column profiler — the ANALYZE-style summary (row count,
  * non-null count, exact distinct count, min, max per column) a pipeline
  * consults before choosing join strategies, partition keys, or quality
  * gates. The reference exposes raw `df.describe()`-era workflows through
  * pandas; here the profile is ONE distributed aggregation over all
  * requested columns: Catalyst plans the multi-column DISTINCT via Expand
  * (one shuffled pass, rows × |cols| expansion, partial-agg combined), never
  * one job per column — profiling a 100 TB table costs one scan, not
  * |cols| scans. Min/max surface as strings so heterogeneous column types
  * fit one tidy long-format result; distinct counts are exact (swap in
  * approx_count_distinct for unbounded domains — see SketchSpec for the
  * sketch contract).
  */
object Profile {

  /** Long-format profile: one row per requested column with
    * (column, n_rows, n_nonnull, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    graft.plans.GraftExtensions.register(df.sparkSession)

    def metrics(c: String): Seq[Column] = {
      // STRING min/max ride the typed aggregate: a declarative string
      // Min/Max buffer is not UnsafeRow-mutable and would drag the WHOLE
      // multi-column profile pass onto SortAggregate (two sorts of the
      // Expand'd rows); other types aggregate natively and cast after —
      // cast(min(c)) == min(c) rendered, while min(cast(c)) would compare
      // numbers as text (r19)
      val (mn, mx) =
        if (df.schema(c).dataType == StringType)
          (call_function("min_str", col(c)), call_function("max_str", col(c)))
        else
          (min(col(c)).cast(StringType), max(col(c)).cast(StringType))
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        mn.as(s"__mn_$c"),
        mx.as(s"__mx_$c"))
    }

    val one = df.agg(
      count(lit(1)).as("__n"),
      cols.flatMap(metrics): _*)

    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").cast(LongType).as("n_rows"),
        col(s"__nn_$c").cast(LongType).as("n_nonnull"),
        col(s"__nd_$c").cast(LongType).as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }
}
