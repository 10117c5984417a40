package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextOps
import graft.operators.MinHashLSH
import graft.plans.GraftExtensions

/** [[graft.plans.MinHashMins]]: the one-pass MinHash signature aggregate
  * (round 19) must reproduce the 12-column `min(md5("i:" + s))` form
  * BIT-FOR-BIT — that equivalence is what keeps the LSH queries' oracle SQL
  * (which still speaks the per-column algebra) honest while the engine runs
  * the hash-grouped typed aggregate instead of SortAggregate. */
class MinHashMinsSpec extends SparkSpec {

  GraftExtensions.register(spark)

  test("signatures (typed aggregate) ≡ the per-column min(md5) form, row for row") {
    val sh = TextOps.shinglePostings(
      Tables(spark, sf, "documents"), "doc_id", "text", 3)
      .persist()
    try {
      val hashCols = (0 until MinHashLSH.numHashes).map(i =>
        min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i"))
      val want = sh.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
      val got = MinHashLSH.signatures(sh)
      assert(got.schema == want.schema, "signature schema drifted")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "typed-aggregate signatures diverged from the min(md5) columns")
      // the plan must be hash-based: no sort of the postings for the
      // signature pass (the optimization this aggregate exists for)
      val p = got.queryExecution.executedPlan.toString
      assert(p.contains("ObjectHashAggregate"),
        "signatures lost the hash-grouped aggregate")
      assert(!p.contains("SortAggregate"),
        "signatures regressed to SortAggregate (string-min buffers)")
    } finally sh.unpersist()
  }

  test("null shingles are skipped; an all-null group yields null elements per family") {
    import spark.implicits._
    val df = Seq((1L, Some("a b c")), (1L, None), (2L, None))
      .toDF("doc_id", "s")
    val got = df.groupBy("doc_id")
      .agg(expr(s"minhash_mins(s, 3)").as("hs"))
      .orderBy("doc_id")
      .collect()
    val hashCols = (0 until 3).map(i => min(md5(concat(lit(s"$i:"), col("s")))))
    val want = df.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) == (1 to 3).map(i => want(0).getString(i)))
    assert(got(1).getSeq[String](1) == Seq(null, null, null))
    assert((1 to 3).forall(want(1).isNullAt))
  }

  test("partial buffers merge across partitions (serialize/deserialize round-trip)") {
    import spark.implicits._
    // many partitions force map-side partials + a merge at the final agg
    val rows = (0 until 200).map(i => (i % 5L, s"shingle $i"))
    val df = rows.toDF("doc_id", "s").repartition(16)
    val hashCols = (0 until 4).map(i => min(md5(concat(lit(s"$i:"), col("s")))))
    val want = df.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
      .orderBy("doc_id").collect()
    val got = df.groupBy("doc_id").agg(expr("minhash_mins(s, 4)").as("hs"))
      .orderBy("doc_id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getSeq[String](1) == (1 to 4).map(w.getString))
    }
  }
}
