package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact quantized-vector arithmetic over `array<long>` columns — the
  * array-form twins of the exploded-posting pipelines in
  * [[graft.queries.Similarity]].
  *
  * The oracle-checked ANN queries historically exploded every vector to
  * (vec_id, i, xm) posting rows and computed dot products as
  * join-on-i + SUM — bit-exact, but each dot pushes `dim` rows through an
  * exchange and a hash aggregate. These expressions compute the SAME exact
  * integer arithmetic inside one whole-stage-codegen loop over the two
  * arrays, so a dot is one row, not `dim` rows: candidate verification
  * shuffles pairs instead of pair×dim postings (guide §2.3/2.4), and the
  * aggregation exchanges disappear outright.
  *
  * Exactness contract (what makes results BIT-IDENTICAL to the exploded
  * form):
  *  - [[QuantizeScaled]] reproduces Spark's
  *    `(cast(cast(x AS double) AS decimal(18,s)) * 10^s) :: long` per
  *    element: java `BigDecimal.valueOf(double)` (the shortest-repr
  *    expansion Spark's double→decimal cast uses) → `setScale(s, HALF_UP)`
  *    → error past precision 18 (the ANSI cast contract) → exact integer
  *    unscale. NaN/Infinity → null element, as the ANSI cast.
  *  - [[DotI64]]/[[L2I64]] accumulate in OVERFLOW-CHECKED long arithmetic
  *    (`Math.multiplyExact`/`addExact`) — exactly Spark's ANSI `sum(a*b)`
  *    over BIGINT (the session default since Spark 4): in-range inputs are
  *    plain long math, an overflowing product or sum THROWS rather than
  *    silently wrapping, the same contract the exploded form had.
  *  - [[DotDecDouble]] accumulates the 128-bit exact Σ aᵢ·bᵢ (via
  *    `Math.multiplyHigh`) and renders `BigDecimal(Σ, scale).doubleValue`
  *    — bit-equal to `sum(xd * xd')::double` where the operands are the
  *    scale-9 decimal view (products at scale 18 summed exactly, one
  *    decimal→double rounding at the end).
  *
  * Null semantics mirror the exploded form: a null ELEMENT on either side
  * skips that position (the posting row's null product vanishes under SUM);
  * a pair where NO position contributes yields NULL (SUM over an empty /
  * all-null group). A null ARRAY yields NULL — note the one shape the two
  * forms render differently: a vector whose array is null/empty produces NO
  * posting rows at all (the pair never appears), while the array form keeps
  * the row with a NULL score; the `embeddings` corpus contract (fixed-dim,
  * non-null vectors) makes the two indistinguishable everywhere these run.
  */
object VecQuant {

  /** Render a signed 128-bit accumulator (hi:lo) at `scale` as the double
    * its exact BigDecimal value rounds to — codegen helper. */
  def dec128ToDouble(hi: Long, lo: Long, scale: Int): Double = {
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i) = (hi >>> (56 - 8 * i)).toByte
      bytes(8 + i) = (lo >>> (56 - 8 * i)).toByte
      i += 1
    }
    new java.math.BigDecimal(new java.math.BigInteger(bytes), scale).doubleValue()
  }

  /** One element's quantization (see [[QuantizeScaled]]): NaN/Infinity →
    * null and precision overflow → ArithmeticException, exactly the ANSI
    * double→decimal(18,s) cast's contract (probed on Spark 4.1). */
  def quantizeElem(x: Float, scale: Int): java.lang.Long = {
    val d = x.toDouble
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    val bd = java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18) throw new ArithmeticException(
      s"$d cannot be represented as Decimal(18, $scale) — quantize_scaled " +
        "matches the ANSI cast: out-of-range values error rather than null")
    java.lang.Long.valueOf(bd.movePointRight(scale).longValueExact())
  }
}

/** `quantize_scaled(array<float>, s)` → `array<long>`: every element as its
  * exact 10^s-scaled long (Spark's double→decimal(18,s) HALF_UP rounding).
  * Runs once per VECTOR (not per pair), so the interpreted fallback is off
  * every hot path; downstream dots are the codegen loops below. */
case class QuantizeScaled(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if right.foldable =>
        // a null literal would silently unbox to scale 0; out-of-range
        // scales have no decimal(18,s) meaning — reject both up front
        val s = right.eval()
        if (s != null && s.asInstanceOf[Int] >= 0 && s.asInstanceOf[Int] <= 18)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"quantize_scaled needs a scale in [0, 18], got $s")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantize_scaled requires (array<float>, int literal), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "quantize_scaled"

  private lazy val scale: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(arr: Any, s: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else VecQuant.quantizeElem(a.getFloat(i), scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeScaled =
    copy(left = newLeft, right = newRight)
}

/** Shared shape of the exact array-pair folds: a codegen loop over the
  * common prefix, skipping positions where either element is null (the
  * exploded form's null product vanishing under SUM), NULL when no
  * position contributes (SUM's empty-group contract). */
abstract class QuantPairFold extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, array<long>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Java statement folding element pair (x, y) into long accumulator `acc`. */
  protected def foldStmt(acc: String, x: String, y: String): String

  protected def foldEval(x: Long, y: Long, acc: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        any = true
        acc = foldEval(x.getLong(i), y.getLong(i), acc)
      }
      i += 1
    }
    if (any) acc else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val any = ctx.freshName("any")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L; boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) continue;
         |  $any = true;
         |  ${foldStmt(acc, s"$x.getLong($i)", s"$y.getLong($i)")}
         |}
         |if (!$any) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
}

/** `dot_i64(a, b)` → BIGINT: Σ aᵢ·bᵢ in overflow-checked long arithmetic —
  * bit-equal to the exploded `SUM(a.xm * b.xm)` (ANSI: overflow throws). */
case class DotI64(left: Expression, right: Expression) extends QuantPairFold {
  override def prettyName: String = "dot_i64"
  override protected def foldStmt(acc: String, x: String, y: String): String =
    s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($x, $y));"
  override protected def foldEval(x: Long, y: Long, acc: Long): Long =
    Math.addExact(acc, Math.multiplyExact(x, y))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** `l2_i64(a, b)` → BIGINT: Σ (aᵢ−bᵢ)² in overflow-checked long arithmetic —
  * bit-equal to the exploded `SUM((a.xm - b.xm) * (a.xm - b.xm))` (ANSI:
  * overflow throws). */
case class L2I64(left: Expression, right: Expression) extends QuantPairFold {
  override def prettyName: String = "l2_i64"
  override protected def foldStmt(acc: String, x: String, y: String): String =
    s"""{ long __d = java.lang.Math.subtractExact($x, $y);
       |  $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact(__d, __d)); }""".stripMargin
  override protected def foldEval(x: Long, y: Long, acc: Long): Long = {
    val d = Math.subtractExact(x, y)
    Math.addExact(acc, Math.multiplyExact(d, d))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2I64 =
    copy(left = newLeft, right = newRight)
}

/** `dot_dec_double(a, b, scale)` → DOUBLE: the exact decimal dot of two
  * 10^(scale/2)-scaled long views, rendered as a double — bit-equal to
  * `CAST(SUM(xd * xd') AS DOUBLE)` over the decimal postings (products
  * accumulate EXACTLY in a signed 128-bit integer at `scale`; the only
  * rounding is the final decimal→double, same as the cast's). */
case class DotDecDouble(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType)
          if third.foldable =>
        // same guard as quantize_scaled: null unboxes to 0, and the
        // 128-bit→double render is only meaningful for decimal scales
        val s = third.eval()
        if (s != null && s.asInstanceOf[Int] >= 0 && s.asInstanceOf[Int] <= 18)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"dot_dec_double needs a scale in [0, 18], got $s")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"dot_dec_double requires (array<long>, array<long>, int literal), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_dec_double"

  private lazy val scale: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var hi = 0L
    var lo = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        any = true
        val xv = x.getLong(i)
        val yv = y.getLong(i)
        val p = xv * yv
        val ph = Math.multiplyHigh(xv, yv)
        val carry = ((lo >>> 1) + (p >>> 1) + ((lo & p) & 1L)) >>> 63
        lo += p
        hi += ph + carry
      }
      i += 1
    }
    if (any) VecQuant.dec128ToDouble(hi, lo, scale) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, _) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      val any = ctx.freshName("any")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $hi = 0L; long $lo = 0L; boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) continue;
         |  $any = true;
         |  long __xv = $x.getLong($i); long __yv = $y.getLong($i);
         |  long __p = __xv * __yv;
         |  long __ph = java.lang.Math.multiplyHigh(__xv, __yv);
         |  long __c = (($lo >>> 1) + (__p >>> 1) + (($lo & __p) & 1L)) >>> 63;
         |  $lo += __p; $hi += __ph + __c;
         |}
         |if (!$any) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.plans.VecQuant.dec128ToDouble($hi, $lo, $scale); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DotDecDouble =
    copy(first = newFirst, second = newSecond, third = newThird)
}
