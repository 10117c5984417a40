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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
      // (PARQUET_TYPE_ILLEGAL) unless surfaced as a raw long to narrow below.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(path(dir, name)))
    } else spark.read.parquet(path(dir, name))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS). Depending on reader config the
    * column may surface as LongType (nanos since epoch); normalize to
    * TimestampNTZType (micros) by *integer* division (`div`) — `/` would
    * promote to double, whose 2^53 exact range is exceeded by ns epochs
    * (~1.7e18), drifting ±1 µs from the exact truncation DuckDB applies for
    * ns → µs. NTZ (not LTZ) so parquet round-trips as INT64 micros — Spark
    * writes LTZ timestamps as legacy INT96, which downstream readers widen
    * to ns and the oracle compare then sees a different type. Requires a UTC
    * session (all entry points set one) for the LTZ→NTZ cast to be identity.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => df
    }
}
