package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata table access (see /root/repo/TESTDATA.md).
  *
  * All tables are plain parquet under `sfDir`. Reads stay fully declarative
  * (`spark.read.parquet`) so Catalyst gets column pruning + predicate pushdown
  * into the scan for free — at 100 TB these scans are the dominant cost and
  * must never materialize more than the projected columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS). Depending on reader config the
    * column may surface as LongType (nanos since epoch); normalize to
    * TimestampType (micros) by *integer* division (`div`) — `/` would promote
    * to double, whose 2^53 exact range is exceeded by ns epochs (~1.7e18),
    * drifting ±1 µs from the exact truncation DuckDB applies for ns → µs.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df
    }
}
