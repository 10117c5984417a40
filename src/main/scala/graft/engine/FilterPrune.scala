package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File pruning for PUSHED DataSource-V2 filters — the batch-read half of
  * the manifest index consumers. [[Snapshots.readWhere]] mines a Catalyst
  * predicate at the API layer; a DSv2 scan instead receives
  * `org.apache.spark.sql.sources.Filter` trees from Spark's pushdown, so
  * this module mines THOSE against the same per-file [[Snapshots.ColStats]]
  * ranges, null counts, and [[Snapshots.FileBloom]] string indexes — one
  * shared set of candidate primitives ([[Snapshots.candidateFiles]] and
  * friends), so the two miners cannot diverge on the overlap test.
  *
  * Soundness contract: pruning only ever SHRINKS the file set to a superset
  * of the files that can satisfy the conjunction — the scan's residual
  * filters still evaluate row-exactly on everything that survives, so a
  * conservative miss costs I/O, never rows. Literals convert to the stats
  * index's canonical units (numbers as cast-to-double, timestamps as epoch
  * SECONDS via the same micros/1e6 arithmetic the stats pass uses, dates as
  * epoch days) so rounding can never disagree with the recorded ranges.
  */
private[graft] object FilterPrune {

  /** The files of `m` that might satisfy ALL of `filters` (logical column
    * names, the resolved manifest's labeling). Unminable filters constrain
    * nothing; an empty intersection returns empty (the scan plans zero
    * partitions). */
  def prune(
      m: Snapshots.Manifest,
      schema: StructType,
      filters: Seq[Filter]): Seq[String] = {
    val sets = filters.flatMap(f => overlap(m, schema, f).map(_.toSet))
    if (sets.isEmpty) m.files
    else {
      val keep = sets.reduce(_ intersect _)
      m.files.filter(keep)
    }
  }

  /** Structural minability — used to report `pushedFilters` honestly at
    * build time, before any manifest is read. Same code path as [[prune]]
    * over a stat-less dummy, so the report can't drift from the pruning. */
  def minable(schema: StructType, f: Filter): Boolean =
    overlap(Dummy, schema, f).isDefined

  private val Dummy = Snapshots.Manifest(1L, Seq("dummy.parquet"), 0L,
    stats = Seq(Snapshots.ColStats("dummy.parquet", "*", 0, 0, 0)))

  /** Canonical-unit double of a pushed literal for a column of type `dt` —
    * None when the pair isn't index-comparable. */
  private def canon(dt: DataType, v: Any): Option[Double] = (dt, v) match {
    case (_, null) => None
    case (DateType, d: java.sql.Date) =>
      Some(DateTimeUtils.fromJavaDate(d).toDouble)
    case (DateType, ld: java.time.LocalDate) =>
      Some(DateTimeUtils.localDateToDays(ld).toDouble)
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(DateTimeUtils.fromJavaTimestamp(t) / 1e6)
    case (TimestampType, i: java.time.Instant) =>
      Some(DateTimeUtils.instantToMicros(i) / 1e6)
    case (TimestampNTZType, l: java.time.LocalDateTime) =>
      Some(DateTimeUtils.localDateTimeToMicros(l) / 1e6)
    // NTZ stores wall-clock micros: go through the LOCAL fields, never
    // fromJavaTimestamp (instant-based — shifts by the JVM zone offset)
    case (TimestampNTZType, t: java.sql.Timestamp) =>
      Some(DateTimeUtils.localDateTimeToMicros(t.toLocalDateTime) / 1e6)
    case (_: NumericType, n: Number) => Some(n.doubleValue)
    case _ => None
  }

  /** The overlap set of one filter: Some(files that might hold a
    * satisfying row) or None (opaque — no constraint). */
  private def overlap(
      m: Snapshots.Manifest,
      schema: StructType,
      f: Filter): Option[Seq[String]] = {
    def typeOf(a: String): Option[DataType] =
      schema.fields.find(_.name == a).map(_.dataType)
    def num(a: String, v: Any): Option[Double] = typeOf(a).flatMap(canon(_, v))
    def isString(a: String): Boolean = typeOf(a).contains(StringType)

    // files that might hold a NULL of column a: recorded zero-null files
    // prune; unknown null counts (-1, pre-index shards) stay conservative
    def nullable(a: String): Option[Seq[String]] = {
      val byFile = m.stats.filter(_.col == a).map(s => s.file -> s).toMap
      if (byFile.isEmpty) None
      else Some(m.files.filter { file =>
        byFile.get(new Path(file).getName).forall(_.nulls != 0L)
      })
    }

    def point(a: String, v: Any): Option[Seq[String]] =
      num(a, v).map(x => Snapshots.candidateFiles(m, a, x, x))
        .orElse(v match {
          case s: String if isString(a) =>
            // string equality prunes through the per-file bloom index AND
            // the slo/shi string bounds (sorted/z-ordered string keys
            // prune by range even where no bloom was recorded); either
            // index absent = conservative
            val viaBloom = Snapshots.candidateFilesForStrings(m, a, Array(s)).toSet
            Some(Snapshots.candidateFilesForStringBand(m, a, s, Some(s + "\u0000"))
              .filter(viaBloom))
          case _ => None
        })

    // string comparisons prune through the slo/shi bounds in UTF8-byte
    // order; the least string strictly above s is s+"\u0000", which turns
    // the exclusive/inclusive variants into half-open bands
    def strBand(a: String, v: Any)(band: String => (String, Option[String]))
        : Option[Seq[String]] = v match {
      case s: String if isString(a) =>
        val (lo, hi) = band(s)
        Some(Snapshots.candidateFilesForStringBand(m, a, lo, hi))
      case _ => None
    }

    f match {
      case EqualTo(a, v) => point(a, v)
      case EqualNullSafe(a, null) => nullable(a)
      case EqualNullSafe(a, v) => point(a, v)
      case GreaterThan(a, v) =>
        num(a, v).map(x => Snapshots.candidateFiles(m, a, x, Double.PositiveInfinity))
          .orElse(strBand(a, v)(s => (s + "\u0000", None)))
      case GreaterThanOrEqual(a, v) =>
        num(a, v).map(x => Snapshots.candidateFiles(m, a, x, Double.PositiveInfinity))
          .orElse(strBand(a, v)(s => (s, None)))
      case LessThan(a, v) =>
        num(a, v).map(x => Snapshots.candidateFiles(m, a, Double.NegativeInfinity, x))
          .orElse(strBand(a, v)(s => ("", Some(s))))
      case LessThanOrEqual(a, v) =>
        num(a, v).map(x => Snapshots.candidateFiles(m, a, Double.NegativeInfinity, x))
          .orElse(strBand(a, v)(s => ("", Some(s + "\u0000"))))
      // LIKE 'p%' == the band [p, nextPrefix(p)) — min/max bounds answer
      // prefix ranges exactly (round-15 close of the :142 punt)
      case StringStartsWith(a, p) if p != null && p.nonEmpty && isString(a) =>
        Some(Snapshots.candidateFilesForStringBand(m, a, p,
          RowGroupFilters.nextPrefix(p)))
      case In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
        val nums = vs.flatMap(num(a, _))
        if (nums.length == vs.length) {
          val arr = nums; java.util.Arrays.sort(arr)
          Some(Snapshots.candidateFilesForKeys(m, a, arr))
        } else if (isString(a) && vs.forall(_.isInstanceOf[String]))
          Some(Snapshots.candidateFilesForStrings(m, a,
            vs.map(_.asInstanceOf[String])))
        else None
      case IsNull(a) => nullable(a)
      // conjunction: each minable side constrains independently
      case And(l, r) =>
        (overlap(m, schema, l), overlap(m, schema, r)) match {
          case (Some(x), Some(y)) =>
            val ys = y.toSet; Some(x.filter(ys))
          case (x @ Some(_), None) => x
          case (None, y) => y
        }
      // disjunction: sound only when BOTH sides mine (union of overlaps)
      case Or(l, r) =>
        for {
          x <- overlap(m, schema, l)
          y <- overlap(m, schema, r)
        } yield {
          val xs = x.toSet ++ y
          m.files.filter(xs)
        }
      case _ => None // Not / StringStartsWith / ... : no pruning, never wrong
    }
  }
}
