package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation via two-phase salted aggregation.
  *
  * A groupBy over a skewed key sends every row of the hot key through one
  * reducer. Salting splits each key into `buckets` sub-keys for a partial
  * aggregate (spreading the hot key over `buckets` tasks), then reduces the
  * partials in a second, tiny aggregation. Works for any algebraic
  * aggregate (sum/count/min/max — anything with an associative merge).
  *
  * The salt is `pmod(hash(<row-distinct cols>), buckets)` — deterministic
  * per row, so re-executed tasks salt identically (safe under retries,
  * unlike rand()-based salting). AQE's skew-join handling covers JOIN skew
  * at runtime; this operator covers AGGREGATION skew, which AQE does not
  * repartition away when the skew lives inside one group.
  */
object Salt {

  /** The deterministic per-row salt phase one groups by — exposed so tests
    * pin the operator's own formula rather than re-deriving it. */
  def saltCol(saltFrom: Seq[String], buckets: Int): Column =
    pmod(hash(saltFrom.map(col): _*), lit(buckets))

  /** Two-phase sum/count aggregation over possibly-skewed `keys`.
    *
    * @param df        input
    * @param keys      grouping keys (skew-suspect)
    * @param saltFrom  columns whose hash spreads rows of one key (must be
    *                  row-distinguishing enough to spread the hot key)
    * @param buckets   salt fan-out (≈ shuffle parallelism)
    * @param sums      columns to sum
    * @return one row per key: `n` (count) plus `sum_<col>` per sum column
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      buckets: Int,
      sums: Seq[String]): DataFrame = {
    require(buckets > 0, "buckets must be > 0")
    val salt = saltCol(saltFrom, buckets).as("__salt")
    val partialAggs =
      count(lit(1)).as("__n") +: sums.map(c => sum(col(c)).as(s"__s_$c"))
    val partial = df
      .withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sum(col("__n")).as("n") +: sums.map(c => sum(col(s"__s_$c")).as(s"sum_$c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe shuffled inner equi join on a shared `key` column.
    *
    * A shuffle join on a skewed key funnels every row of the hot key — BOTH
    * sides — through one reducer. AQE's skew-join split does rescue a BARE
    * shuffle join, but it refuses any split that would add a shuffle — so
    * the moment the join feeds an operator needing the same key
    * partitioning (a groupBy on the join key: the join→aggregate pipeline
    * most enrichment queries end in), the hot partition stays whole
    * (measured in SaltSpec: `skew=true` on the bare join's final adaptive
    * plan, absent once a same-key agg sits above it). Salting spreads the
    * hot key by construction, independent of AQE's validity rules, and the
    * downstream agg re-shuffles only tiny partials. Here the
    * big side gets a deterministic per-row salt in [0, buckets) and the
    * small-but-unbroadcastable side is replicated across all `buckets`
    * salts, so the join key becomes (key, salt) and the hot key spreads
    * over `buckets` tasks. Inner-join semantics are EXACT: each big row
    * carries one salt, and every small row with its key exists at that salt.
    *
    * Cost: `buckets × |small|` replicated rows — the deliberate trade for
    * the scenario where `small` exceeds the broadcast budget but one big-
    * side key dominates. If `small` fits in memory, broadcast instead; if
    * neither holds, this is the shape that keeps the reducers level. The
    * small side is hinted `shuffle_merge` so Catalyst cannot "rescue" the
    * plan into a broadcast that would make the salt dead weight.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFrom: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be > 0")
    val bigS = big.withColumn("__salt", saltCol(saltFrom, buckets))
    val smallS = small.withColumn(
      "__salt", explode(array((0 until buckets).map(lit): _*)))
    bigS.join(smallS.hint("shuffle_merge"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
