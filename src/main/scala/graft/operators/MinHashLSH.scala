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

  /** Candidate near-dup pairs (d1 < d2) from band-bucket collisions.
    * Exactly the q28 semantics: signature h_i = min over shingles of
    * md5("i:" + s); band key b = md5("b|" + h_{3b} + "," + ... ). */
  def candidatePairs(sh: DataFrame): DataFrame = {
    val hashCols = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i"))
    val mh = sh.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
    val bandKeys = mh.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        md5(concat(lit(s"$b|"), concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * b + r}")): _*)))): _*)).as("bkey"))
    bandKeys.as("a")
      .join(bandKeys.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }
}
