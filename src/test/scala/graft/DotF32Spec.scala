package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.plans.GraftExtensions

/** Native dot_f32 expression: exact agreement with a JVM reference fold,
  * usability inside SQL plans, and the cosine composition. */
class DotF32Spec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def emb = Tables(spark, sf, "embeddings")

  test("dot_f32 equals a sequential JVM fold exactly") {
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id"), col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      .withColumn("dot", expr("dot_f32(ea, eb)"))
      .select(col("vec_id"), col("ea"), col("eb"), col("dot"))
      .as[(Long, Seq[Float], Seq[Float], Double)]
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, a, b, got) =>
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(got == want, s"codegen fold diverged: $got vs $want")
    }
  }

  test("dot_f32 drives top-k ordering in a plan (self-similarity = |v|^2 ≈ 1)") {
    val norms = emb.withColumn("d", expr("dot_f32(embedding, embedding)"))
      .select("d").as[Double].collect()
    assert(norms.forall(d => d > 0.9 && d < 1.1), "unit-norm corpus expected")
  }

  test("cosine composes from dot_f32 and matches the exact-decimal oracle to 1e-6") {
    // reference is a genuinely EXACT dot: BigDecimal products summed without
    // rounding, cast to double once (the q30 oracle discipline) — a
    // systematic accumulation error shared by two double folds cannot hide
    val two = emb.filter(col("vec_id") < 2)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (a, b) = (two(0)._2, two(1)._2)
    def exactDot(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).map { case (p, q) => BigDecimal(p.toDouble) * BigDecimal(q.toDouble) }
        .sum.toDouble
    val fast = emb.as("x").join(emb.as("y"), col("x.vec_id") === 0 && col("y.vec_id") === 1)
      .select(expr("dot_f32(x.embedding, y.embedding) / (sqrt(dot_f32(x.embedding, x.embedding)) * sqrt(dot_f32(y.embedding, y.embedding)))"))
      .as[Double].head()
    val ref = exactDot(a, b) / (math.sqrt(exactDot(a, a)) * math.sqrt(exactDot(b, b)))
    assert(math.abs(fast - ref) < 1e-6)
  }

  test("fused cosine_f32 ≡ the composed dot_f32 form bit-for-bit") {
    // same IEEE fold, one array pass instead of three — on equal-length
    // vectors the two must agree exactly, not approximately
    val rows = emb.as("a").join(emb.as("b"), col("a.vec_id") + 7 === col("b.vec_id"))
      .select(
        expr("cosine_f32(a.embedding, b.embedding)").as("fused"),
        expr("dot_f32(a.embedding, b.embedding) / (sqrt(dot_f32(a.embedding, a.embedding)) * sqrt(dot_f32(b.embedding, b.embedding)))").as("composed"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, c) =>
      assert(java.lang.Double.compare(f, c) == 0, s"fused $f != composed $c") }
  }

  test("a null ARRAY ELEMENT nulls the result — agreeing with the composed SQL form") {
    // round-6 advice: getFloat on a null slot silently read 0.0, diverging
    // from aggregate(zip_with(...)) which null-poisons the fold
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), None, Some(2f)), Seq[Option[Float]](Some(1f), Some(1f), Some(1f))),
      (2L, Seq[Option[Float]](Some(1f), Some(3f)), Seq[Option[Float]](Some(2f), Some(4f))))
      .toDF("id", "a", "b")
    val got = df.select(
        col("id"),
        expr("dot_f32(a, b)").as("dot"),
        expr("cosine_f32(a, b)").as("cos"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + double(v))").as("composed"))
      .orderBy("id")
      .collect()
    // row 1: null element → all three forms null
    assert(got(0).isNullAt(1) && got(0).isNullAt(2) && got(0).isNullAt(3))
    // row 2: no nulls → dot matches the composed fold exactly
    assert(!got(1).isNullAt(1) && got(1).getDouble(1) === got(1).getDouble(3))
    assert(got(1).getDouble(1) === 14.0)
  }
}
