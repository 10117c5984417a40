package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HllSketchAgg, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.engine.{Incremental, Snapshots}

/** Catalyst OPTIMIZER rules answering aggregates from maintained state —
  * the query-rewrite layer over [[graft.engine.Incremental]] views and
  * [[Snapshots]] manifests. The analyst writes the aggregate against the
  * BASE table; when a registered materialized view (or the manifest's exact
  * row counts) can answer it, the optimizer swaps the table scan for the
  * state — a 100 TB scan becomes a group-count-sized read, with zero query
  * changes.
  *
  * Correctness stance — a rewrite fires only when ALL hold, checked at
  * optimization time:
  *   1. the plan's scan reads EXACTLY the registered table's current head
  *      file set (a time-travel read of an older version, or any other
  *      parquet relation, never matches);
  *   2. for views: the view state REFLECTS that same head
  *      (`Incremental.reflectedVersion == headVersion`) — a stale view
  *      silently falls back to the base scan, it never serves old numbers;
  *   3. the aggregate's shape maps exactly onto maintained state columns:
  *      grouping keys == view keys, and each aggregate is `count(1)` /
  *      `sum(col)` / the Det.dsum decimal-exact form over a registered
  *      measure, non-distinct and unfiltered.
  * Output attribute ids are preserved, so the rewrite composes under any
  * enclosing plan (joins, filters, sorts above the aggregate).
  *
  * Numeric note: view sums substitute the state's exact-decimal
  * accumulation. For the [[graft.engine.Det]] 2-decimal measures every
  * oracle query uses, that is bit-identical to the direct plan; it is also
  * the ONLY summation order-independent enough to be stable under task
  * retries at 1000-executor scale — registering a view asserts the measure
  * has that exact-decimal semantics.
  *
  * Install once per session with [[ViewRewrite.install]] (idempotent); it
  * rides `spark.experimental.extraOptimizations`, the sanctioned hook for
  * optimizer extensions on a live session.
  */
object ViewRewrite {

  /** A registered incremental view: `stateRoot` is the [[Incremental]]
    * state table over `baseRoot`, keyed by `keys`, carrying `n_rows` plus
    * `sum_<c>` for each measure in `sums` (`Incremental.refresh`),
    * `min_<c>`/`max_<c>` for each column in `minmax`
    * (`Incremental.refreshMinMax`), and/or `hll_<c>` default-precision HLL
    * sketches for each column in `distincts`
    * (`Incremental.refreshApproxDistinct`). */
  final case class SumView(
      name: String,
      baseRoot: String,
      stateRoot: String,
      keys: Seq[String],
      sums: Set[String],
      minmax: Set[String] = Set.empty,
      distincts: Set[String] = Set.empty)

  // registries are per-JVM; entries key by baseRoot (one view per base is
  // plenty for the rewrite demo — first registration wins)
  private val views = new ConcurrentHashMap[String, SumView]()
  private val countTables = ConcurrentHashMap.newKeySet[String]()

  def registerView(v: SumView): Unit = views.put(v.baseRoot, v)

  /** Register a table for metadata-only GLOBAL aggregate answering over
    * its head scan: `count(*)` from the manifest's exact per-file row
    * counts, and `min(c)`/`max(c)` from the per-file stats index when —
    * and only when — every head file carries a stats row for `c`, the
    * table holds no deletion vectors, and the recorded extrema are exactly
    * representable as the column's type ([[MetaExact]]). Anything less
    * falls back to the scan. Zero data I/O when it fires. */
  def registerMeta(root: String): Unit = { countTables.add(root); () }

  /** Alias of [[registerMeta]] (counts were the first metadata answer). */
  def registerCounts(root: String): Unit = registerMeta(root)

  def clear(): Unit = { views.clear(); countTables.clear() }

  /** Idempotently append the rule to the session's optimizer. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[Rewrite]))
      spark.experimental.extraOptimizations = cur :+ new Rewrite
  }

  /** True when `df`'s optimized plan no longer scans any of `root`'s data
    * files — the "did the rewrite actually fire" probe specs and oracle
    * queries pin. */
  def avoidedScan(df: org.apache.spark.sql.DataFrame, root: String): Boolean = {
    val dataPrefix = s"${pathOf(root).stripSuffix("/")}/data/"
    !df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.inputFiles.exists(f => pathOf(f).startsWith(dataPrefix))
        case _ => false
      }
    }.exists(identity)
  }

  /** Scheme-normalized path: `file:/x`, `file:///x`, and `/x` all compare
    * equal (Hadoop and Spark render the same file under either form). */
  private def pathOf(uri: String): String =
    new org.apache.hadoop.fs.Path(uri).toUri.getPath

  /** The rule proper. Stateless — all state lives in the registries. */
  final class Rewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (views.isEmpty && countTables.isEmpty) plan
      else plan.transformUp { case agg: Aggregate =>
        rewriteCount(agg).orElse(rewriteView(agg)).getOrElse(agg)
      }

    /** The file set a plan scans, when it is exactly one parquet relation
      * (possibly under an attribute-only Project the column pruner added). */
    private def scanFiles(p: LogicalPlan): Option[Set[String]] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(fs.location.inputFiles.map(pathOf).toSet)
        case _ => None
      }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        scanFiles(child)
      case _ => None
    }

    /** Head version v of `root` iff the scanned file set is exactly v's. */
    private def scanIsHead(spark: SparkSession, root: String,
        scanned: Set[String]): Option[Long] = {
      val head = Snapshots.headVersion(spark, root)
      if (head == 0) None
      else if (Snapshots.manifest(spark, root, head).files.map(pathOf).toSet == scanned)
        Some(head)
      else None
    }

    /** Complete, non-distinct, unfiltered aggregate function. */
    private def plainAgg(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression
        if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        Some(ae.aggregateFunction)
      case _ => None
    }

    private def isCountStar(e: Expression): Boolean = plainAgg(e) match {
      case Some(Count(Seq(Literal(_, _)))) => true
      case _ => false
    }

    /** The precision `hll_sketch_agg(c)` defaults to — what
      * [[graft.engine.Incremental.refreshApproxDistinct]] builds state
      * with. Derived from the expression itself so a Spark default bump
      * can't silently mismatch. */
    private val DefaultLgK = new HllSketchAgg(Literal(0L)).lgConfigK

    /** Largest magnitude a double can round-trip losslessly with int64 —
      * the stats index stores extrema as doubles, so a long min/max is
      * answerable only inside this band. */
    private val MetaExact = 1L << 52

    /** Aggregate(no keys, only count(1)/min/max outputs, scan of a
      * registered table's head) → one-row LocalRelation from the manifest:
      * exact row counts, per-file stats folded to global extrema. */
    private def rewriteCount(agg: Aggregate): Option[LogicalPlan] = {
      if (agg.groupingExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
        return None
      val scanned = scanFiles(agg.child).getOrElse(return None)
      val spark = SparkSession.active
      countTables.asScala.foreach { root =>
        scanIsHead(spark, root, scanned).foreach { head =>
          val m = Snapshots.manifest(spark, root, head)
          if (m.dvs.nonEmpty || m.files.isEmpty) return None
          val baseNames = m.files.map(pathOf(_).split('/').last).toSet
          // per-column fold: defined only when EVERY head file has a
          // recorded stats row (a missing row means unknown values there)
          def extremum(c: String, isMin: Boolean): Option[Double] = {
            val rows = m.stats.filter(_.col == c)
            if (rows.map(_.file).toSet != baseNames) None
            else Some(if (isMin) rows.map(_.min).min else rows.map(_.max).max)
          }
          def answer(e: Expression): Option[(Any, DataType)] = e match {
            case _ if isCountStar(e) =>
              Snapshots.rowCount(spark, root).map(n => (n, LongType))
            case _ => plainAgg(e) match {
              case Some(org.apache.spark.sql.catalyst.expressions.aggregate
                  .Min(a: AttributeReference)) => fold(a, isMin = true)
              case Some(org.apache.spark.sql.catalyst.expressions.aggregate
                  .Max(a: AttributeReference)) => fold(a, isMin = false)
              case _ => None
            }
          }
          def fold(a: AttributeReference, isMin: Boolean): Option[(Any, DataType)] =
            extremum(a.name, isMin).flatMap { v =>
              a.dataType match {
                case DoubleType => Some((v, DoubleType))
                case LongType if math.abs(v) < MetaExact && v == math.rint(v) =>
                  Some((v.toLong, LongType))
                case IntegerType if math.abs(v) < Int.MaxValue && v == math.rint(v) =>
                  Some((v.toInt, IntegerType))
                case _ => None // not exactly representable from the double index
              }
            }
          val resolved = agg.aggregateExpressions.map {
            case al: Alias => answer(al.child).map { case (value, dt) =>
              (AttributeReference(al.name, dt, nullable = false)(exprId = al.exprId),
                value)
            }.getOrElse(return None)
            case _ => return None
          }
          return Some(LocalRelation(resolved.map(_._1),
            Seq(InternalRow(resolved.map(_._2): _*))))
        }
      }
      None
    }

    /** Like [[scanFiles]], but tolerates Filter nodes on the way down,
      * collecting their conjuncts. The caller must prove the filters
      * commute with its rewrite (e.g. group-key-only predicates, which the
      * optimizer pushes below an Aggregate from enclosing joins/filters). */
    private def scanWithFilters(p: LogicalPlan)
        : Option[(Set[String], Seq[Expression])] = p match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        scanWithFilters(child).map { case (fs, cs) => (fs, cond +: cs) }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        scanWithFilters(child)
      case _ => scanFiles(p).map(fs => (fs, Seq.empty))
    }

    /** Aggregate(view keys, sums/counts over view measures, scan of the
      * view's base head — possibly under group-key-only filters) →
      * Project over the (equivalently filtered) view state scan. */
    private def rewriteView(agg: Aggregate): Option[LogicalPlan] = {
      val (scanned, filters) = scanWithFilters(agg.child).getOrElse(return None)
      val spark = SparkSession.active
      val v = views.asScala.values.find(v =>
        scanIsHead(spark, v.baseRoot, scanned).exists(head =>
          Incremental.reflectedVersion(spark, v.stateRoot) == head))
        .getOrElse(return None)

      val keyAttrs = agg.groupingExpressions.map {
        case a: AttributeReference => a
        case _ => return None
      }
      if (keyAttrs.map(_.name).toSet != v.keys.toSet) return None

      // a filter below the aggregate is sound to carry over the state ONLY
      // when it is deterministic AND touches group keys alone: key-only
      // deterministic predicates commute with grouping (every surviving
      // group is bit-identical), and that is exactly what the optimizer
      // pushes down from enclosing joins/HAVING. A reference-free
      // non-deterministic predicate (rand() < 0.5) would pass a
      // references-only check vacuously yet evaluate per GROUP on the
      // state instead of per ROW on the base — so determinism is checked
      // explicitly, and a filter must actually reference something.
      if (!filters.forall(f => f.deterministic && f.references.nonEmpty &&
          f.references.forall(a => v.keys.contains(a.name))))
        return None

      // the state scan: keys, n_rows (long), sum_<c> (exact decimal). A
      // keyed state carries net-zero groups as TOMBSTONES (n_rows = 0,
      // filtered by readKeyed) — a registered keyed state passes every
      // column check here, so the rewrite must apply the same filter or
      // it would surface phantom zero-count groups the real aggregate
      // never emits. For non-keyed states n_rows is never 0 (groups drop
      // at net zero), so the filter is a no-op there.
      val stateDf = Snapshots.read(spark, v.stateRoot)
      val statePlan = stateDf
        .filter(org.apache.spark.sql.functions.col("n_rows") > 0L)
        .queryExecution.analyzed
      val stateByName: Map[String, AttributeReference] =
        statePlan.output.collect { case a: AttributeReference => a.name -> a }.toMap
      if (!(v.keys ++ v.sums.map(c => s"sum_$c") ++
          v.minmax.flatMap(c => Seq(s"min_$c", s"max_$c")) ++
          v.distincts.map(c => s"hll_$c") ++ Seq("n_rows"))
          .forall(stateByName.contains)) return None
      def st(name: String): AttributeReference = stateByName(name)

      /** The state expression matching one output column, or None. */
      def mapped(e: NamedExpression): Option[NamedExpression] = e match {
        case a: AttributeReference if v.keys.contains(a.name) =>
          Some(Alias(st(a.name), a.name)(exprId = a.exprId))
        case al: Alias =>
          val sub = mapAgg(al.child)
          sub.map(x => Alias(x, al.name)(exprId = al.exprId))
        case _ => None
      }

      /** sum/count shapes over the base — possibly under casts and
        * arithmetic (Det.davg's `cast(sum(dec(c)), double) / count(c)` and
        * friends) — → state column expression of the SAME data type. */
      def mapAgg(e: Expression): Option[Expression] = e match {
        // Det.dsum: CAST(sum(CAST(c AS DECIMAL)) AS DOUBLE)
        case c: Cast =>
          mapAgg(c.child).map(inner => Cast(inner, c.dataType))
        // arithmetic over matched aggregates (avg = sum/count, ratios, …)
        case b: BinaryArithmetic =>
          for (l <- mapAgg(b.left); r <- mapAgg(b.right))
            yield b.withNewChildren(Seq(l, r))
        case l: Literal => Some(l)
        // hll_sketch_estimate(hll_sketch_agg(c)): the state stores the
        // per-group sketch, and sketch maintenance is bit-identical to a
        // rebuild (register-wise union is associative/commutative/
        // idempotent — IncrementalSpec pins estimate EQUALITY), so
        // estimating the stored sketch IS the direct plan's answer. Only
        // the default precision matches the state's build; any explicit
        // lgConfigK falls back to the scan.
        case est: HllSketchEstimate => plainAgg(est.child) match {
          case Some(h: HllSketchAgg) => h.left match {
            case a: AttributeReference
                if v.distincts.contains(a.name) && h.lgConfigK == DefaultLgK =>
              Some(HllSketchEstimate(st(s"hll_${a.name}")))
            case _ => None
          }
          case _ => None
        }
        case _ if isCountStar(e) => Some(st("n_rows"))
        case _ => plainAgg(e) match {
          case Some(org.apache.spark.sql.catalyst.expressions.aggregate
              .Min(a: AttributeReference)) if v.minmax.contains(a.name) =>
            val s = st(s"min_${a.name}")
            Some(if (s.dataType == e.dataType) s else Cast(s, e.dataType))
          case Some(org.apache.spark.sql.catalyst.expressions.aggregate
              .Max(a: AttributeReference)) if v.minmax.contains(a.name) =>
            val s = st(s"max_${a.name}")
            Some(if (s.dataType == e.dataType) s else Cast(s, e.dataType))
          case Some(Sum(inner, _)) =>
            val colName = inner match {
              case a: AttributeReference => a.name
              case c: Cast => c.child match {
                case a: AttributeReference if c.dataType.isInstanceOf[DecimalType] => a.name
                case _ => return None
              }
              case _ => return None
            }
            if (!v.sums.contains(colName)) None
            else Some(Cast(st(s"sum_$colName"), e.dataType))
          case _ => None
        }
      }

      val out = agg.aggregateExpressions.map(e => mapped(e).getOrElse(return None))
      val filtered =
        if (filters.isEmpty) statePlan
        else {
          val remapped = filters.map(_.transform {
            case a: AttributeReference => st(a.name)
          }).reduce(And.apply)
          org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, statePlan)
        }
      Some(Project(out, filtered))
    }
  }
}
