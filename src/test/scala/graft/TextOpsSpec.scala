package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Invariants the dedup oracles rely on: fingerprints ignore order and
  * repetition, MinHash ignores set order, shingle counts match the
  * n-gram arithmetic, and the array/postings shingle forms agree. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contentFingerprint is invariant to token order and repetition") {
    val df = Seq(
      ("a b c d", "d c b a"),
      ("x y x y x", "y x"),
      ("one two three", "three three one two two"))
      .toDF("t1", "t2")
      .select(
        TextOps.contentFingerprint(TextOps.tokens(col("t1"))).as("f1"),
        TextOps.contentFingerprint(TextOps.tokens(col("t2"))).as("f2"))
      .as[(String, String)].collect()
    df.foreach { case (f1, f2) => assert(f1 == f2) }
  }

  test("minhash signature is invariant to shingle-set order") {
    val a = Seq((Seq("aa bb cc", "bb cc dd", "cc dd ee"), Seq("cc dd ee", "aa bb cc", "bb cc dd")))
      .toDF("s1", "s2")
      .select(TextOps.minhash(col("s1"), 8).as("m1"), TextOps.minhash(col("s2"), 8).as("m2"))
      .as[(Seq[String], Seq[String])].head()
    assert(a._1 == a._2 && a._1.length == 8)
  }

  test("bandKeys embed the band index (no cross-band collisions)") {
    val sig = Seq(Seq.fill(12)("samehash")).toDF("sig")
      .select(TextOps.bandKeys(col("sig"), 4, 3).as("b")).as[Seq[String]].head()
    assert(sig.length == 4 && sig.distinct.length == 4)
  }

  test("shingle postings count = tokens - n + 1 for distinct-token docs") {
    val df = Seq((1L, "a b c d e"), (2L, "w x y z"), (3L, "p q")).toDF("id", "text")
    val counts = TextOps.shinglePostings(df, "id", "text", 3)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 2L)) // id 3 has < n tokens → absent
  }

  test("keep columns: dependent keep equals the first()-aggregate form; " +
    "non-dependent keep visibly fans out (the contract, pinned)") {
    // the r19 rewrite made `keep` part of the dedup KEY (grouping keys stay
    // HashAggregate; first() buffers force SortAggregate). That is only
    // row-identical to the old groupBy(id, s).agg(first(keep)) form when
    // keep is functionally dependent on idCol — the documented contract.
    val dep = Seq((1L, "src_a", "a b c d"), (2L, "src_b", "a b c d"))
      .toDF("id", "source", "text")
    val viaKey = TextOps.shinglePostings(dep, "id", "text", 3, keep = Seq("source"))
      .select("id", "source", "s").as[(Long, String, String)].collect().toSet
    val viaFirst = TextOps.positionalShingles(dep, "id", "text", 3, keep = Seq("source"))
      .groupBy("id", "s").agg(first("source").as("source"))
      .select("id", "source", "s").as[(Long, String, String)].collect().toSet
    assert(viaKey === viaFirst && viaKey.nonEmpty)

    // a NON-dependent keep column requires duplicate idCol rows, and those
    // are outside the operator's contract twice over: the positional window
    // interleaves the duplicate rows' token streams (garbage shingles), and
    // keep fans out into multiple (id, s) rows. The pin: the violation is
    // LOUD — more rows than either doc's shingle count, both keep values
    // surviving — never a silent first()-style collapse to one arbitrary
    // winner, which is what the r19 dedup-key rewrite could have introduced.
    val indep = Seq((1L, "s1", "a b c"), (1L, "s2", "a b c"))
      .toDF("id", "source", "text")
    val rows = TextOps.shinglePostings(indep, "id", "text", 3, keep = Seq("source"))
      .select("id", "source", "s").as[(Long, String, String)].collect()
    assert(rows.length > 2 && rows.map(_._2).toSet === Set("s1", "s2"),
      "a contract violation (duplicate id, divergent keep) must surface as " +
        "fanned-out rows, never collapse silently to one keep winner")
  }

  test("array-form shingles agree with the postings form") {
    val df = Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
    val viaArray = df.select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .as[String].collect().toSet
    val viaPostings = TextOps.shinglePostings(df, "id", "text", 3)
      .select("s").as[String].collect().toSet
    assert(viaArray == viaPostings && viaArray.nonEmpty)
  }
}
