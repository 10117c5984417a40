package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

/** Fuzzy blocking: the length-banded probe must be LOSSLESS vs the plain
  * block join (the ±1 probe covers every pair the |len diff| ≤ maxDist
  * bound admits), the block cap must exclude over-cap blocks entirely, and
  * misconfiguration (band not wider than the distance bound) must fail
  * loudly rather than silently lose recall.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "kappa", "lam", "mu", "nu", "xi", "om", "pi")

  test("banded probe recall equals the unbanded block join (random sweep)") {
    val rnd = new scala.util.Random(7)
    // names of wildly varying length so pairs straddle band borders often
    val rows = (1L to 300L).map { id =>
      val base = Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val name = if (rnd.nextBoolean()) base + "x" * rnd.nextInt(3) else base
      (id, name, rnd.nextInt(3))
    }
    val df = rows.toDF("id", "name", "blk")
    val got = Fuzzy.pairs(df, "id", "name", Seq("blk"),
        maxDist = 3, blockCap = 1000000)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // naive: plain block equi-join, no band, no cap
    val a = df.toDF("id_a", "name_a", "b1")
    val b = df.toDF("id_b", "name_b", "b2")
    val want = a.join(b, col("b1") === col("b2") && col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(want.nonEmpty, "degenerate sweep — no near pairs generated")
    assert(got == want, "banded probe lost or invented pairs vs the plain block join")
  }

  test("over-cap blocks are excluded whole; others are untouched") {
    // one block of 5 identical-length near-dups (over cap=4) plus a block
    // of 2 — only the small block's pair may survive
    val big = (1L to 5L).map(i => (i, s"aaaa$i", "hot"))
    val small = Seq((10L, "bbbb1", "cold"), (11L, "bbbb2", "cold"))
    val df = (big ++ small).toDF("id", "name", "blk")
    val got = Fuzzy.pairs(df, "id", "name", Seq("blk"), maxDist = 3, blockCap = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)),
      s"cap should drop the whole hot block and keep the cold pair, got $got")
  }

  test("bandWidth not exceeding maxDist is rejected (probe would lose pairs)") {
    val df = Seq((1L, "abc", 0)).toDF("id", "name", "blk")
    val e = intercept[IllegalArgumentException](
      Fuzzy.pairs(df, "id", "name", Seq("blk"), maxDist = 4, bandWidth = 4))
    assert(e.getMessage.contains("bandWidth"))
  }
}
