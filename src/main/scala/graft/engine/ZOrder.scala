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

  /** Rows of `df` reordered along the z-curve of `dims` (numeric columns),
    * range-split into `files` output tasks. Write the result with ONE file
    * per task (putDf does) and each file's footer min/max covers a narrow
    * range of every dimension.
    */
  def cluster(df: DataFrame, dims: Seq[String], files: Int): DataFrame = {
    require(dims.nonEmpty, "need at least one z-order dimension")
    require(files > 0, "files must be > 0")
    // one global stats row: min/max per dimension (driver scalars)
    val aggCols = dims.zipWithIndex.flatMap { case (d, i) =>
      Seq(min(col(d)).cast(LongType).as(s"mn$i"),
        max(col(d)).cast(LongType).as(s"mx$i"))
    }
    val s = df.agg(aggCols.head, aggCols.tail: _*).head()
    if (s.isNullAt(0)) return df // empty input: nothing to lay out
    val maxBucket = (1L << BitsPerDim) - 1
    val scaled = dims.zipWithIndex.map { case (d, i) =>
      val mn = s.getLong(2 * i)
      val span = math.max(1L, s.getLong(2 * i + 1) - mn)
      // (c - mn) * maxBucket / span ∈ [0, maxBucket]; pure long arithmetic
      (col(d).cast(LongType) - lit(mn)) * lit(maxBucket) / lit(span)
    }.map(_.cast(LongType))
    df.withColumn("__z", interleave(scaled, BitsPerDim))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
