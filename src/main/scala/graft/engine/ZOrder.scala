package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Z-order (Morton-curve) clustering — multi-dimensional data layout for
  * file/row-group skipping.
  *
  * Directory partitioning (S3Like.putDf(partitionKeys)) prunes on ONE
  * low-cardinality axis; sorting prunes on the leading sort key only. A
  * lake queried by several selective columns (date AND tenant AND size
  * band) wants rows that are close in EVERY dimension to be close in the
  * file order, so each file's per-column min/max footer stats cover a
  * narrow slice of every dimension and most files are skippable for any
  * single- or multi-column predicate. Interleaving the bits of the
  * (normalized) dimensions — the Morton/Z curve, public since Morton 1966
  * and the layout feature of every modern lakehouse format — does exactly
  * that.
  *
  * Shape: one tiny global min/max aggregate per call (driver scalars, the
  * same footprint as AQE's own stats), then a narrow per-row expression
  * map (shift/mask/or — whole-stage codegen), a range exchange on the
  * z-value, and an in-partition sort. No skew pitfall: range partitioning
  * samples the z distribution, so dense regions split across files.
  *
  * The z-value is layout metadata only — it orders rows and then is
  * dropped; the row set is unchanged. Columns are min-max scaled to
  * `bits`-wide integers: ties in a scaled bucket are harmless (they stay
  * adjacent), and constant columns scale to 0 everywhere (degrading
  * gracefully to the remaining dimensions' curve).
  */
object ZOrder {

  /** Bits kept per dimension; 2 dims × 16 bits = 32-bit z fits a long
    * comfortably up to 4 dims. */
  val BitsPerDim = 16

  /** Interleave the low `bits` bits of already-normalized int columns:
    * bit i of column j lands at position i*k + j. */
  private[engine] def interleave(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_)).cast(LongType)
  }

  /** The z-value expression for `df`'s `dims`, min-max scaled off one
    * global stats aggregate (driver scalars, the same footprint as AQE's
    * own stats). None when `df` is empty — there is nothing to scale by. */
  private def zColumn(df: DataFrame, dims: Seq[String]): Option[Column] = {
    require(dims.nonEmpty, "need at least one z-order dimension")
    val aggCols = dims.zipWithIndex.flatMap { case (d, i) =>
      Seq(min(col(d)).cast(LongType).as(s"mn$i"),
        max(col(d)).cast(LongType).as(s"mx$i"))
    }
    val s = df.agg(aggCols.head, aggCols.tail: _*).head()
    if (s.isNullAt(0)) return None // empty input: nothing to lay out
    val maxBucket = (1L << BitsPerDim) - 1
    val scaled = dims.zipWithIndex.map { case (d, i) =>
      val mn = s.getLong(2 * i)
      val span = math.max(1L, s.getLong(2 * i + 1) - mn)
      // (c - mn) * maxBucket / span ∈ [0, maxBucket]; pure long arithmetic
      (col(d).cast(LongType) - lit(mn)) * lit(maxBucket) / lit(span)
    }.map(_.cast(LongType))
    Some(interleave(scaled, BitsPerDim))
  }

  /** Rows of `df` reordered along the z-curve of `dims` (numeric columns),
    * range-split into `files` output tasks. Write the result with ONE file
    * per task (putDf does) and each file's footer min/max covers a narrow
    * range of every dimension.
    */
  def cluster(df: DataFrame, dims: Seq[String], files: Int): DataFrame = {
    require(files > 0, "files must be > 0")
    zColumn(df, dims).fold(df) { z =>
      df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    }
  }

  /** [[cluster]] composed with directory partitioning: arrange rows so a
    * `partitionBy(partitionKeys)` writer gets BOTH layouts at once —
    * coarse-key directories that prune at plan time (`PartitionFilters`)
    * AND Morton-clustered files inside each directory whose footer min/max
    * skip on every z dimension.
    *
    * One range exchange on (partitionKeys, z) does all the work: rows of
    * one partition value are contiguous across the range, so each writing
    * task owns whole (partition, z-band) slices and emits one
    * narrow-stats file per directory it touches — never one file per
    * (task × key), and never global files that straddle directories. The
    * z scaling stays GLOBAL (one stats pass, not one per partition): within
    * any single directory the global curve order equals the local one up
    * to bucket granularity, and a single pass is the only thing that holds
    * at a 100 TB partition count.
    *
    * `files` is the TOTAL range-split count across all directories —
    * directories holding more rows get proportionally more files (range
    * boundaries come from sampling the composite key).
    */
  def clusterWithin(
      df: DataFrame, partitionKeys: Seq[String], dims: Seq[String],
      files: Int): DataFrame = {
    require(partitionKeys.nonEmpty, "clusterWithin needs partition keys — use cluster()")
    require(files > 0, "files must be > 0")
    val overlap = partitionKeys.intersect(dims)
    require(overlap.isEmpty, s"columns $overlap cannot be both partition key and z dimension")
    zColumn(df, dims).fold(df) { z =>
      val keys = partitionKeys.map(col) :+ col("__z")
      df.withColumn("__z", z)
        .repartitionByRange(files, keys: _*)
        .sortWithinPartitions(keys: _*)
        .drop("__z")
    }
  }
}
