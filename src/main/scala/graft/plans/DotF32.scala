package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two `array<float>` columns — the
  * production scoring path for similarity search.
  *
  * The oracle-checked queries (q30/q31) use exploded exact-decimal postings
  * because cross-engine bit-equality is the point there. In production the
  * scorer wants raw throughput: this expression runs a primitive
  * float-multiply-accumulate loop inside whole-stage codegen — no explode,
  * no shuffle, no BigDecimal, no per-element lambda dispatch (the
  * `aggregate(zip_with(...))` form evaluates interpreted per element).
  * Deterministic: a fixed left-to-right IEEE fold, identical in the
  * interpreted and codegen paths.
  *
  * Registered as SQL function `dot_f32` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * [[GraftExtensions.register]] on a live session. Cosine composes as
  * `dot_f32(a,b) / (sqrt(dot_f32(a,a)) * sqrt(dot_f32(b,b)))`.
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires (array<float>, array<float>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType

  // nullable even under non-nullable children: a null ELEMENT nulls the
  // result (and in codegen ev.isNull must be a real variable to set)
  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def prettyName: String = "dot_f32"

  /** Whether the element types admit nulls. A null ELEMENT propagates to a
    * null result — agreeing with the composed `aggregate(zip_with(...))`
    * form this expression replaces (null * x = null poisons the fold).
    * When both array types declare containsNull=false the per-element
    * check is skipped entirely and the loop stays branch-free. */
  private def mayHaveNullElements: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = mayHaveNullElements
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

/** Fused native cosine over two `array<float>` columns: dot, ‖a‖² and ‖b‖²
  * accumulate in ONE loop over the arrays — the composed form
  * `dot_f32(a,b)/(sqrt(dot_f32(a,a))*sqrt(dot_f32(b,b)))` walks them three
  * times (and re-reads the Unsafe array data each pass). Same deterministic
  * left-to-right IEEE fold in interpreted and codegen paths; returns NaN
  * when either norm is zero (0/0 — the composed form agrees). Unequal
  * lengths truncate all three accumulators to the common prefix (the
  * composed form would norm each array over its own full length —
  * irrelevant for fixed-dimension embedding columns, where both agree
  * bit-for-bit). Registered
  * as `cosine_f32` via [[GraftExtensions]]; the production scorer for
  * similarity probes ([[graft.streaming.AnnStream]]). */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 requires (array<float>, array<float>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def prettyName: String = "cosine_f32"

  /** Same null-element contract as [[DotF32.mayHaveNullElements]]: a null
    * element yields a null result; containsNull=false types skip the check. */
  private def mayHaveNullElements: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = mayHaveNullElements
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

/** Session-extension hook injecting the engine's native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  private def two(name: String)(mk: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotF32].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name takes exactly 2 arguments")
        mk(children.head, children(1))
      })

  /** dot_f32 plus Column-API access to the Bloom expressions Spark keeps
    * SQL-internal (`BloomFilterAggregate` / `BloomFilterMightContain`, the
    * machinery behind runtime bloom-filter joins) — see operators.Bloom. */
  private def three(name: String)(mk: (Expression, Expression, Expression) => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotF32].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"$name takes exactly 3 arguments")
        mk(children.head, children(1), children(2))
      })

  private def one(name: String)(mk: Expression => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotF32].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name takes exactly 1 argument")
        mk(children.head)
      })

  private val descriptors = Seq(
    one("rb64_agg")(Rb64Agg(_)),
    two("dot_f32")(DotF32(_, _)),
    two("cosine_f32")(CosineF32(_, _)),
    two("quantize_scaled")(QuantizeScaled(_, _)),
    two("minhash_mins")(MinHashMins(_, _)),
    one("min_str")(MinMaxStr(_, isMin = true)),
    one("max_str")(MinMaxStr(_, isMin = false)),
    two("dot_i64")(DotI64(_, _)),
    two("l2_i64")(L2I64(_, _)),
    three("dot_dec_double")(DotDecDouble(_, _, _)),
    two("bloom_agg")(new BloomFilterAggregate(_, _)),
    // explicit-size variant: (child, estimatedItems, numBits) — the 2-arg
    // form sizes by the runtime-filter conf maximum, far too large for the
    // per-file bloom index (engine.Snapshots.FileBloom)
    three("bloom_agg_bits")(new BloomFilterAggregate(_, _, _)),
    two("bloom_might_contain")(BloomFilterMightContain(_, _)))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
