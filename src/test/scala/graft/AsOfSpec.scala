package graft

import org.apache.spark.sql.functions.lit
import graft.operators.AsOf

/** Unit semantics of the as-of join (graft.operators.AsOf): closest right
  * row per key in the requested direction (backward / forward / nearest),
  * null when none, inclusive at equal timestamps, optional tolerance bound.
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

  test("forward direction picks the earliest right row at or after each left ts") {
    val left = Seq((1L, 10L), (1L, 15L), (1L, 100L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, "at"), (1L, 20L, "after"), (1L, 5L, "before"))
      .toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", "t", direction = "forward")
      .select("k", "t", "v", "matched_t")
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10L, Some("at"), Some(10L)),     // inclusive: rightTs == leftTs matches
      (1L, 15L, Some("after"), Some(20L)),
      (1L, 100L, None, None),               // nothing at or after → left-outer nulls
      (2L, 10L, None, None)))
  }

  test("nearest picks the closer side; equidistant resolves backward like pandas") {
    val left = Seq((1L, 10L), (1L, 16L), (1L, 26L)).toDF("k", "t")
    val right = Seq((1L, 4L, "b"), (1L, 28L, "f")).toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", "t", direction = "nearest")
      .select("k", "t", "v").as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 10L, "b"),   // 6 back vs 18 forward
      (1L, 16L, "b"),   // 12 back vs 12 forward — equidistant → backward
      (1L, 26L, "f")))  // 22 back vs 2 forward
  }

  test("tolerance nulls matches beyond the bound in every direction") {
    val left = Seq((1L, 10L), (1L, 50L)).toDF("k", "t")
    val right = Seq((1L, 7L, "x")).toDF("k", "t", "v")
    def run(dir: String) =
      AsOf.join(left, right, Seq("k"), "t", "t", dir, Some(lit(5L)))
        .select("k", "t", "v").as[(Long, Long, Option[String])].collect().toSet
    assert(run("backward") == Set((1L, 10L, Some("x")), (1L, 50L, None)))
    assert(run("nearest") == Set((1L, 10L, Some("x")), (1L, 50L, None)))
    assert(run("forward") == Set((1L, 10L, None), (1L, 50L, None)))
    val e = intercept[IllegalArgumentException](
      AsOf.join(left, right, Seq("k"), "t", "t", "sideways"))
    assert(e.getMessage.contains("direction"))
  }

  test("unorderable payload types are rejected up front with the column named") {
    // the tie-break orders by the payload struct; a map column would fail
    // analysis deep inside the window ordering — the guard names it instead
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, Map("a" -> 1)))
      .toDF("k", "t", "m")
    val e = intercept[IllegalArgumentException](
      AsOf.join(left, right, Seq("k"), "t", "t"))
    assert(e.getMessage.contains("m: map<string,int>"))
  }

  test("a null payload in the matched row stays null (no resurrection)") {
    // right timeline: (t=5, v="a"), (t=10, v=null) — the match at t=20 is
    // the t=10 ROW, so v must be null; per-column carry would return "a"
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some("a")), (1L, 10L, None))
      .toDF("k", "t", "v")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .select("k", "t", "v", AsOf.matchedTsName("t"))
      .as[(Long, Long, Option[String], Option[Long])]
      .collect().toSet
    assert(out == Set((1L, 20L, None, Some(10L))))
  }

  test("payload columns come from ONE right row, never torn across two") {
    // latest row has (v1=null, v2="q"); older row has (v1="p", v2=null).
    // The result must be exactly the latest row's fields.
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, Some("p"), None: Option[String]),
        (1L, 20L, None: Option[String], Some("q")))
      .toDF("k", "t", "v1", "v2")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .select("k", "t", "v1", "v2")
      .as[(Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(out == Set((1L, 30L, None, Some("q"))))
  }

  test("ties on the right timestamp resolve deterministically") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "t", "v")
    val runs = (1 to 3).map { _ =>
      AsOf.join(left, right.repartition(4), Seq("k"), "t", "t")
        .select("v").as[String].collect().toSeq
    }
    assert(runs.distinct.size == 1, s"nondeterministic tie pick: $runs")
    assert(runs.head == Seq("b")) // greatest payload struct among ties
  }

  test("as-of join rejects colliding payload column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](AsOf.join(l, r, Seq("k"), "t", "t"))
    assert(e.getMessage.contains("collide"))
  }
}
