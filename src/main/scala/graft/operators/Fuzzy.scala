package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) near-dup candidate generation — blocking + verify,
  * the record-linkage shape for SHORT strings (titles, product names, author
  * fields) where shingle-based dedup is too coarse.
  *
  * Pair work in any blocking scheme is Σ block², so the whole scale story is
  * what bounds block size. Two bounds compose here:
  *
  *   - **Length band in the block key.** A user block key like (type, size)
  *     has cardinality fixed by the SCHEMA, so block size grows linearly
  *     with the corpus and pair work quadratically. Appending
  *     `floor(length(s) / bandWidth)` multiplies the key by a data-derived
  *     dimension. With `bandWidth > maxDist`, two strings within `maxDist`
  *     edits differ in length by ≤ maxDist < bandWidth, so their bands
  *     differ by AT MOST ONE — probing each row's band ±1 (a 3-way explode
  *     on the probe side, still a pure equi join) loses NOTHING: recall is
  *     exactly the unbanded block join's. This is the q42 hyperplane-band
  *     precedent minus the recall trade — here the band is a necessary
  *     condition of the match predicate itself.
  *   - **Block-size cap.** Banding divides, but the quotient still grows
  *     with the corpus. `blockCap` drops rows in blocks larger than the cap
  *     before any pairing (same contract as the q27 shingle df-cap: per-key
  *     join work ≤ cap², a constant). An over-cap fuzzy block means the
  *     block key under-discriminates (thousands of same-type-size-length
  *     names); the rows dropped are exactly the ones whose pairs a coarse
  *     key can't meaningfully rank anyway. The cap is part of the declared
  *     semantics — oracles apply the same `count(*) OVER (block) <= cap`
  *     exclusion, so capped results stay hash-checkable.
  *
  * The `|length diff| <= maxDist` bound (necessary for lev ≤ maxDist)
  * pre-filters inside the join before any O(L²) distance runs; codegen'd
  * `levenshtein` verifies survivors only. All keys are equi — never a
  * cartesian — and the only full-corpus shuffles are the block-count window
  * and the candidate join, both keyed on the banded block key.
  */
object Fuzzy {

  /** Band width for the length dimension of the block key. Must exceed
    * `maxDist` for the ±1-band probe to be lossless; 4 > 3 (q67's distance
    * bound) with slack. */
  val BandWidth = 4

  /** Rows in a (blockCols, band) block beyond this are excluded from
    * pairing — bounds per-block pair work to cap² regardless of corpus
    * size. 50 is generous at bench scale (largest sf0.1 block is single
    * digits) while capping 100 TB blocks. */
  val BlockCap = 50

  /** All pairs (id_a < id_b) within `maxDist` edits of each other that
    * share `blockCols` and lie within the capped length-banded blocks.
    *
    * @return columns: id_a, id_b, s_a, s_b, dist
    */
  def pairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      maxDist: Int = 3,
      bandWidth: Int = BandWidth,
      blockCap: Int = BlockCap): DataFrame = {
    require(bandWidth > maxDist,
      s"bandWidth ($bandWidth) must exceed maxDist ($maxDist) for the ±1-band probe to be exact")
    require(blockCap > 1, "blockCap must allow at least a pair")
    val banded = df
      .withColumn("__band", floor(length(col(strCol)) / bandWidth).cast("int"))
    // block-count window shuffles once on the same key the candidate join
    // uses; rows in over-cap blocks never reach pairing
    val blockW = Window.partitionBy(blockCols.map(col) :+ col("__band"): _*)
    val capped = banded
      .withColumn("__bc", count(lit(1)).over(blockW))
      .filter(col("__bc") <= blockCap)
      .drop("__bc")
    val a = capped.select(
      col(idCol).as("id_a") +: col(strCol).as("s_a") +: col("__band").as("__band_a") +:
        blockCols.map(c => col(c).as(s"__a_$c")): _*)
      // 3-way probe: a pair's bands differ by ≤1 (bandWidth > maxDist), and
      // the sit side is in exactly one band, so each pair matches once —
      // no distinct needed
      .withColumn("__probe",
        explode(array(col("__band_a") - 1, col("__band_a"), col("__band_a") + 1)))
    val b = capped.select(
      col(idCol).as("id_b") +: col(strCol).as("s_b") +: col("__band").as("__band_b") +:
        blockCols.map(c => col(c).as(s"__b_$c")): _*)
    val blockEq = blockCols.map(c => col(s"__a_$c") === col(s"__b_$c"))
    val cond = (Seq(
      col("__probe") === col("__band_b"),
      col("id_a") < col("id_b"),
      abs(length(col("s_a")) - length(col("s_b"))) <= maxDist) ++ blockEq)
      .reduce(_ && _)
    a.join(b, cond)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
  }
}
