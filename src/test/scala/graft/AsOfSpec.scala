package graft

import graft.operators.AsOf

/** Unit semantics of the backward as-of join (graft.operators.AsOf):
  * latest right row at-or-before each left row per key, null when none,
  * inclusive at equal timestamps.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 10L))
      .toDF("k", "t")
    val right = Seq((1L, 8L, "a"), (1L, 15L, "b"), (1L, 20L, "c"), (2L, 50L, "z"))
      .toDF("k", "t", "v")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .select("k", "t", "v", AsOf.matchedTsName("t"))
      .as[(Long, Long, Option[String], Option[Long])]
      .collect().toSet
    assert(out == Set(
      (1L, 5L, None, None),          // before any right row
      (1L, 10L, Some("a"), Some(8L)), // latest <= 10 is t=8
      (1L, 20L, Some("c"), Some(20L)), // equal ts is inclusive
      (2L, 10L, None, None)))         // right exists only later
  }

  test("as-of join rejects colliding payload column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](AsOf.join(l, r, Seq("k"), "t", "t"))
    assert(e.getMessage.contains("collide"))
  }
}
