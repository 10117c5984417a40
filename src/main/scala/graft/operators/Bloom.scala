package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Bloom-sketch semi-join reduction — the scale path for "filter a huge
  * relation by membership in a small key set" (eval-set decontamination,
  * allow/deny lists, incremental-dedup against a known corpus).
  *
  * A plain semi join shuffles BOTH sides on the key; at 100 TB the corpus
  * side is the whole lake. This operator instead:
  *
  *   1. aggregates the small side's keys into one Bloom filter sketch
  *      (mergeable, so it partial-aggregates map-side; the merged sketch is
  *      a few hundred KB for millions of keys),
  *   2. materializes that single sketch row on the driver — the standard
  *      sketch-broadcast step, the same shape Spark's own AQE runtime
  *      filters produce via a scalar subquery (InjectRuntimeFilter) — and
  *      re-ships it as a literal,
  *   3. pre-filters the big side with `might_contain` right above its scan
  *      (no exchange: false-positive-rate × corpus survives, plus all true
  *      matches — Bloom filters have no false negatives),
  *   4. exact-verifies the survivors with the real semi join, whose big
  *      side is now tiny.
  *
  * Step 4 removes every false positive, so the composite is EXACTLY the
  * semi join — which is what keeps it oracle-checkable — while the corpus
  * never crosses the network and is touched by one scan-local predicate.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the expressions behind `spark.sql.optimizer.runtime.bloomFilter.*`)
  * over `xxhash64` of the key, exactly as InjectRuntimeFilter plants them —
  * surfaced to the Column API through [[graft.plans.GraftExtensions]]'
  * `bloom_agg` / `bloom_might_contain` function registrations.
  */
object Bloom {

  /** One merged Bloom sketch of `xxhash64(key)` over `df`, as bytes.
    * Returns None when `df` is empty (no sketch → nothing can match). */
  def sketchBytes(df: DataFrame, key: Column, expectedItems: Long): Option[Array[Byte]] = {
    require(expectedItems > 0, "expectedItems must be > 0")
    GraftExtensions.register(df.sparkSession)
    val row = df.select(
      call_function("bloom_agg", xxhash64(key), lit(expectedItems)).as("bf")).head()
    Option(row.getAs[Array[Byte]]("bf"))
  }

  /** `bloom_might_contain(<sketch literal>, xxhash64(key))` — scan-side
    * membership predicate; may false-positive, never false-negatives.
    * (Resolves against a session [[Bloom.sketchBytes]] has touched — the
    * sketch argument only ever comes from there.) */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(sketch), xxhash64(key))

  /** Exact `big SEMI JOIN small ON big(bigKey) = small(smallKey)`, with the
    * big side reduced by the Bloom pre-filter before the join exchange.
    * `expectedItems` sizes the sketch (overestimate is fine — default 3%
    * false-positive rate at the estimate; ~1 byte per expected item). */
  def semiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1000000L): DataFrame =
    sketchBytes(small, col(smallKey), expectedItems) match {
      case None => big.limit(0) // empty small side: semi join is empty
      case Some(bytes) =>
        big.filter(mightContain(bytes, col(bigKey)))
          .join(small.select(col(smallKey).as(bigKey)).distinct(),
            Seq(bigKey), "left_semi")
    }

  /** Exact ANTI join (keep big rows whose key is NOT in small) — the
    * incremental-dedup direction. A Bloom cannot pre-filter the anti side
    * (false positives would drop kept rows), but `might_contain = false`
    * rows are PROVABLY absent from `small`, so they bypass the join
    * entirely and only `might_contain = true` rows (true matches + FPR)
    * pay the anti-join exchange.
    */
  def antiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1000000L): DataFrame =
    sketchBytes(small, col(smallKey), expectedItems) match {
      case None => big // empty small side: anti join keeps everything
      case Some(bytes) =>
        val mc = mightContain(bytes, col(bigKey))
        val maybe = big.filter(mc)
          .join(small.select(col(smallKey).as(bigKey)).distinct(),
            Seq(bigKey), "left_anti")
        big.filter(!mc).unionByName(maybe)
    }
}
