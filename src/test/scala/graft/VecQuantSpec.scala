package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.plans.GraftExtensions

/** Array-form quantized arithmetic ([[graft.plans.VecQuant]]): the round-19
  * optimization replaced the ANN queries' exploded-posting dot products
  * (join-on-i + SUM) with one codegen loop per pair — these cases pin the
  * BIT-EXACT equivalence of the two forms, which is what lets the oracle
  * SQL stay on the posting algebra while the engine runs arrays.
  *
  * Every equivalence is asserted against the SAME Catalyst cast/SUM chain
  * the old plans executed (not a hand-rolled reference), over the real
  * corpus plus adversarial vectors: null elements (a null posting product
  * vanishes under SUM — the array fold must skip, not poison), an all-null
  * pair (SUM over an empty group is NULL), long-overflow inputs (the
  * session is ANSI, so SUM throws on overflow and the fold must throw
  * identically — Math.addExact/multiplyExact, asserted below), and
  * NaN/Infinity floats (the double→decimal cast nulls them). */
class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def emb = Tables(spark, sf, "embeddings")

  /** The EXACT expression chain the exploded form quantized with. */
  private def castChain(scale: Int) =
    (col("x").cast(DoubleType).cast(DecimalType(18, scale)) *
      lit(math.pow(10, scale).toLong)).cast(LongType)

  test("quantize_scaled reproduces the double→decimal cast chain per element (scales 6 and 9)") {
    for (scale <- Seq(6, 9)) {
      val diff = emb
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")),
          expr(s"quantize_scaled(embedding, $scale)").as("q"))
        .select(col("vec_id"), castChain(scale).as("want"),
          element_at(col("q"), col("i0") + 1).as("got"))
        .filter(not(col("want") <=> col("got")))
        .count()
      assert(diff == 0, s"scale $scale: quantize_scaled diverged from the cast chain")
    }
  }

  test("quantize_scaled nulls NaN/Infinity/null elements exactly like the cast") {
    val df = Seq(Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity, 0.5f))
      .toDF("v").select(col("v").cast(ArrayType(FloatType)).as("v"))
    val got = df.select(expr("quantize_scaled(v, 6)")).head().getSeq[Any](0)
    assert(got == Seq(null, null, null, 500000L))
    val withNull = spark.sql(
      "SELECT quantize_scaled(array(cast(1.0 as float), cast(null as float)), 6) AS q")
      .head().getSeq[Any](0)
    assert(withNull == Seq(1000000L, null))
  }

  test("dot_i64 / l2_i64 / dot_dec_double equal the exploded SUM forms on the corpus") {
    // adjacent-id pairs over the real embeddings, both quantization scales
    val q = emb.select(col("vec_id"),
      expr("quantize_scaled(embedding, 6)").as("q6"),
      expr("quantize_scaled(embedding, 9)").as("q9"),
      posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), col("q6"), col("q9"), col("i0"),
        col("x").cast(DoubleType).cast(DecimalType(18, 9)).as("xd"),
        castChain(6).as("xm"))
    val pairsPosting = q.as("a").join(q.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id") && col("a.i0") === col("b.i0"))
      .groupBy(col("a.vec_id").as("v"))
      .agg(
        sum(col("a.xm") * col("b.xm")).as("dot6_want"),
        sum((col("a.xm") - col("b.xm")) * (col("a.xm") - col("b.xm"))).as("l2_want"),
        sum(col("a.xd") * col("b.xd")).cast(DoubleType).as("dot9_want"))
    val pairsArr = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("v"),
        expr("dot_i64(quantize_scaled(a.embedding, 6), quantize_scaled(b.embedding, 6))").as("dot6_got"),
        expr("l2_i64(quantize_scaled(a.embedding, 6), quantize_scaled(b.embedding, 6))").as("l2_got"),
        expr("dot_dec_double(quantize_scaled(a.embedding, 9), quantize_scaled(b.embedding, 9), 18)").as("dot9_got"))
    val bad = pairsPosting.join(pairsArr, "v")
      .filter(not(col("dot6_want") <=> col("dot6_got")) ||
        not(col("l2_want") <=> col("l2_got")) ||
        not(col("dot9_want") <=> col("dot9_got")))
      .count()
    assert(bad == 0, "array folds diverged from the exploded SUM forms")
  }

  test("null elements skip (the vanished posting product); an all-null pair is NULL (empty SUM)") {
    val rows = spark.sql(
      """SELECT
        |  dot_i64(array(1L, NULL, 3L), array(10L, 20L, NULL)) AS skips,
        |  dot_i64(array(CAST(NULL AS BIGINT)), array(5L)) AS empty,
        |  l2_i64(array(4L, NULL), array(1L, 7L)) AS l2skips,
        |  dot_dec_double(array(1000000000L, NULL), array(2000000000L, 3L), 18) AS decskips
        |""".stripMargin).head()
    assert(rows.getLong(0) == 10L) // only position 0 contributes
    assert(rows.isNullAt(1))
    assert(rows.getLong(2) == 9L)
    assert(rows.getDouble(3) == 2.0) // 1e9·2e9 / 1e18
  }

  test("dot_i64 throws on overflow exactly like the ANSI SUM over BIGINT products") {
    // the exploded form's Multiply/Sum throw under ANSI (the Spark 4 session
    // default) — a silently wrapping fold would return a WRONG value where
    // the old plan errored
    val big = Seq((Long.MaxValue / 2, 3L), (Long.MaxValue / 3, 7L)).toDF("a", "b")
    intercept[Exception] { big.agg(sum(col("a") * col("b"))).head() }
    val arr = big.agg(collect_list(col("a")).as("la"), collect_list(col("b")).as("lb"))
    intercept[Exception] { arr.select(expr("dot_i64(la, lb)")).head() }
    // in-range inputs agree exactly
    val small = Seq((123456789L, -987654321L), (42L, 17L)).toDF("a", "b")
    val want = small.agg(sum(col("a") * col("b"))).head().getLong(0)
    val got = small.agg(collect_list(col("a")).as("la"), collect_list(col("b")).as("lb"))
      .select(expr("dot_i64(la, lb)")).head().getLong(0)
    assert(got == want)
  }

  test("dot_dec_double's 128-bit accumulator matches the decimal SUM past long range") {
    // products of 1e9-scaled values near 1e9 are ~1e18; 40 of them overflow
    // a long accumulator — the decimal SUM is exact, the fold must be too
    val xs = (1 to 40).map(i => (900000000L + i, 900000000L - i))
    val df = xs.toDF("a", "b")
    val want = df
      .select((col("a").cast(DecimalType(18, 9)) / lit(1000000000L)).as("xa"),
        (col("b").cast(DecimalType(18, 9)) / lit(1000000000L)).as("xb"))
      .agg(sum(col("xa") * col("xb")).cast(DoubleType)).head().getDouble(0)
    val got = df.agg(collect_list(col("a")).as("la"), collect_list(col("b")).as("lb"))
      .select(expr("dot_dec_double(la, lb, 18)")).head().getDouble(0)
    assert(got == want, s"128-bit fold diverged: $got vs $want")
  }

  test("interpreted eval agrees with codegen (the fallback path is the same arithmetic)") {
    import graft.plans.{DotI64, L2I64, DotDecDouble, QuantizeScaled}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = Literal.create(Seq(3L, null, -5L), ArrayType(LongType))
    val b = Literal.create(Seq(7L, 2L, 11L), ArrayType(LongType))
    assert(DotI64(a, b).eval() == (21L - 55L))
    assert(L2I64(a, b).eval() == (16L + 256L))
    val d = DotDecDouble(a, b, Literal(18)).eval()
    assert(d == new java.math.BigDecimal(java.math.BigInteger.valueOf(-34L), 18).doubleValue())
    val qf = QuantizeScaled(
      Literal.create(Seq(0.123456789f, -1.5f), ArrayType(FloatType)), Literal(6))
    val out = qf.eval().asInstanceOf[GenericArrayData].array.toSeq
    // 0.123456789f as double = 0.12345679104328156 → HALF_UP at 6 = 0.123457
    assert(out == Seq(123457L, -1500000L))
  }
}
