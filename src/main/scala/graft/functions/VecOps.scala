package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity building blocks over `array<float>` embedding columns
  * (LLM-pipeline extension; the reference never computes over array data).
  *
  * Exactness contract: float elements are widened float→double→DECIMAL(18,9)
  * — NOT float→decimal directly, because engines disagree on float→decimal
  * (DuckDB rounds the float's shortest decimal representation, the JVM
  * rounds the double expansion; via double both see the same 17-digit
  * value). Dot products then accumulate exactly in decimal, and the only
  * IEEE operations are the final sqrt/multiply/divide on identical doubles —
  * so cosine scores are bit-identical in any engine, which keeps ANN
  * top-k ordering (and the DuckDB oracle) deterministic.
  *
  * Layout: vectors are EXPLODED to (id, i, xd) posting rows rather than kept
  * as arrays — array-lambda evaluation (`zip_with`/`aggregate`) is
  * interpreted per element, while the exploded form runs the same arithmetic
  * inside whole-stage codegen and shuffles on content keys like any
  * relational plan.
  */
object VecOps {

  /** Exact-decimal element view of a vector column. */
  val DecScale: DecimalType = DecimalType(18, 9)

  /** (idCol, "i", "xd", "xl") posting rows; i is 1-based to match SQL
    * subscripts. `xl` is the same exact value as a 1e9-scaled long —
    * additive arithmetic (LSH sign votes) runs on it in codegen-fast
    * integer math instead of BigDecimal (sums of ±xl over a vector stay
    * ≤ ~1e11, far from overflow; products must use `xd`). */
  def explodeVec(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("i0", "x")))
      .select(col(idCol), (col("i0") + 1).as("i"),
        col("x").cast(DoubleType).cast(DecScale).as("xd"))
      .withColumn("xl", (col("xd") * lit(1000000000L)).cast(LongType))

  /** L2 norms: (idCol, "nrm" double) — exact decimal sum, then one sqrt. */
  def norms(ed: DataFrame, idCol: String): DataFrame =
    ed.groupBy(idCol)
      .agg(sqrt(sum(col("xd") * col("xd")).cast(DoubleType)).as("nrm"))

  /** Exact dot products for candidate pairs: `cand` has (leftId, rightId);
    * returns (leftId, rightId, "dot" double). Joins the posting relation to
    * each side and reduces per pair — candidate-only cost, never all-pairs. */
  def pairDots(cand: DataFrame, ed: DataFrame, leftId: String, rightId: String): DataFrame =
    cand
      .join(ed.as("va"), col(s"va.${ed.columns.head}") === col(leftId))
      .join(ed.as("vb"), col(s"vb.${ed.columns.head}") === col(rightId) && col("vb.i") === col("va.i"))
      .groupBy(leftId, rightId)
      .agg(sum(col("va.xd") * col("vb.xd")).cast(DoubleType).as("dot"))
}
