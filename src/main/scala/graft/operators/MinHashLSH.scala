package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded-LSH candidate generation over shingle postings — the
  * 100 TB near-dup candidate path (no reference analogue; the reference
  * moves frames, it never looks inside text).
  *
  * Input is the postings relation (doc_id, s) of distinct shingles. The
  * signature is 12 lexicographic-min md5 hashes computed as 12 min-aggregates
  * in ONE groupBy pass (map-side partial mins, every md5 inside whole-stage
  * codegen, no ×12 row explosion). Band keys bucket docs so the candidate
  * self-join is a key-equi join with cost ∝ Σ bucket² — never corpus².
  *
  * md5-of-explicit-strings makes every signature (and therefore even the
  * probabilistic index's recall misses) bit-identical in any engine, which is
  * what keeps LSH queries oracle-checkable against DuckDB.
  */
object MinHashLSH {

  val numHashes = 12
  val bands = 4
  val rowsPerBand = 3

  /** Band-bucket size cap for candidate generation. The df-cap bounds HOT
    * SHINGLES, but a family of identical / near-identical documents — the
    * common case in web crawl — shares whole signatures and lands in ONE
    * band bucket, pairing quadratically (cost ∝ Σ bucket²) no matter how
    * rare its shingles are. Buckets above the cap are excluded outright:
    * a 10k-duplicate family contributes 50M candidate pairs of which a
    * downstream keep-first needs NONE — exact-dedup (q26) is the right
    * operator for identical docs, and it runs before LSH in the composed
    * pipeline (q39). The q27/q67 cap discipline, applied to the band key;
    * oracles apply the same `count(*) OVER (PARTITION BY bkey) <= cap` in
    * lockstep, so the capped semantics stay oracle-checked. */
  val BandBucketCap = 64

  /** Drop shingles with document frequency above `dfCap` — the standard
    * guard against hot postings ("of the and"-grade n-grams). Without it any
    * postings-keyed work degenerates on the hot keys at scale; with it the
    * dropped shingles are exactly the ones that carry no near-dup signal
    * (they occur everywhere). The cap costs one map-side-combined count
    * plus an anti join keyed on the shingle. No broadcast hint: the hot
    * set's size grows with the corpus (every moderately common n-gram
    * eventually exceeds a fixed cap), so forcing a broadcast would
    * override Spark's size checks and OOM at exactly the scale this cap
    * exists for — let AQE pick broadcast only when the set really is small.
    */
  def dfCapped(sh: DataFrame, dfCap: Int): DataFrame = {
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("s")
    sh.join(hot, Seq("s"), "left_anti")
  }

  /** Wide signature relation (doc_id, h0..h11): h_i = min over shingles of
    * md5("i:" + s), all 12 from ONE [[graft.plans.MinHashMins]] aggregate.
    * The 12-column `min(md5(...))` form this replaces planned as
    * SortAggregate (string min buffers are not UnsafeRow-mutable), paying
    * two full sorts of the postings per signature pass; the typed aggregate
    * runs hash-grouped (ObjectHashAggregate) and hashes all 12 families in
    * one reused-digest pass per shingle. Values are identical bit-for-bit
    * (MinHashMinsSpec pins the equivalence). */
  def signatures(sh: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(sh.sparkSession)
    sh.groupBy("doc_id")
      .agg(call_function("minhash_mins", col("s"), lit(numHashes)).as("__hs"))
      .select(col("doc_id") +: (0 until numHashes).map(i =>
        element_at(col("__hs"), i + 1).as(s"h$i")): _*)
  }

  /** [[signatures]] plus the per-doc distinct-shingle count in the SAME
    * hash-grouped pass (the count rides the ObjectHashAggregate as a plain
    * declarative aggregate). The verify pipelines (q28/q39) need both the
    * signature and the Jaccard denominator `n` per doc; as two separate
    * groupBys they paid two full aggregate passes — and two exchanges —
    * over the corpus-sized postings for per-doc values one pass yields. */
  def signaturesWithSizes(sh: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(sh.sparkSession)
    sh.groupBy("doc_id")
      .agg(call_function("minhash_mins", col("s"), lit(numHashes)).as("__hs"),
        count(lit(1)).as("n"))
      .select(col("doc_id") +: (0 until numHashes).map(i =>
        element_at(col("__hs"), i + 1).as(s"h$i")) :+ col("n"): _*)
  }

  /** Band keys (doc_id [, keep...], bkey) from a wide signature relation:
    * bkey_b = md5("b|" + h_{3b} + "," + h_{3b+1} + "," + h_{3b+2}).
    * `keep` carries per-doc columns (functionally dependent on doc_id —
    * e.g. [[signaturesWithSizes]]' `n`) through the 4-row band explode, so
    * a downstream Jaccard gate can read them off the candidate pair
    * instead of joining a sizes relation back twice. Cheap by
    * construction: bands rows are 4 per DOC, never corpus-posting-sized. */
  def bandKeys(mh: DataFrame, keep: Seq[String] = Seq.empty): DataFrame =
    mh.select(col("doc_id") +: keep.map(col) :+
      explode(array((0 until bands).map(b =>
        md5(concat(lit(s"$b|"), concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * b + r}")): _*)))): _*)).as("bkey"): _*)

  /** Band keys surviving the bucket-size cap. The count window partitions
    * on `bkey` — the same key the candidate self-join shuffles on, so the
    * exchange is computed once and reused by both join sides (no extra
    * shuffle for the cap; PlanSpec pins the single exchange). */
  def cappedBandKeys(bk: DataFrame, cap: Int = BandBucketCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bk.withColumn("__bsz", count(lit(1)).over(Window.partitionBy("bkey")))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  /** Candidate near-dup pairs (d1 < d2) from band-bucket collisions —
    * exactly the q28 semantics, over-cap buckets excluded. */
  def candidatePairs(sh: DataFrame, cap: Int = BandBucketCap): DataFrame =
    candidatePairsFrom(signatures(sh), cap)

  /** [[candidatePairs]] from an ALREADY-COMPUTED signature relation
    * (doc_id, h0..h11[, extra...]): pipelines that also need the signatures
    * (or the fused [[signaturesWithSizes]] row) elsewhere compute them once
    * and band from the shared relation instead of re-aggregating the
    * postings inside this call. */
  def candidatePairsFrom(mh: DataFrame, cap: Int = BandBucketCap): DataFrame = {
    val bk = cappedBandKeys(bandKeys(mh), cap)
    bk.as("a")
      .join(bk.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Estimated Jaccard for candidate pairs, from signature agreement alone:
    * est_j = |{i : h_i(d1) = h_i(d2)}| / numHashes. The cheap verify path —
    * exact verification joins the shingle POSTINGS of both docs (per-pair
    * cost ∝ shingle counts, and the postings relation is corpus-sized),
    * while this joins two fixed-width signature rows (per-pair cost O(12)
    * codegen'd equality sums, relation one row per doc). At 100 TB the
    * estimate is the first-line filter; exact Jaccard is reserved for pairs
    * near the decision threshold. Deterministic given the md5 family, so
    * the estimate itself — error and all — is oracle-checkable. */
  def estimatedJaccard(cand: DataFrame, mh: DataFrame): DataFrame = {
    val matches = (0 until numHashes)
      .map(i => when(col(s"ma.h$i") === col(s"mb.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(mh.as("ma"), col("ma.doc_id") === col("d1"))
      .join(mh.as("mb"), col("mb.doc_id") === col("d2"))
      .select(col("d1"), col("d2"), matches.as("matches"))
  }
}
