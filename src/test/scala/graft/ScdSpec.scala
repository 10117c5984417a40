package graft

import java.nio.file.Files

import graft.engine.{Scd, Snapshots}

/** Type-2 SCD maintenance ([[graft.engine.Scd]]): versioned dimension rows
  * with validity intervals, changed-keys-only rewrites, as-of reads.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("scd").toString + "/t"

  private def state(root: String): Set[(Long, String, Long, Option[Long])] =
    Snapshots.read(spark, root)
      .select("id", "seg", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("insert, change, and no-change batches fold into interval history") {
    val root = tmp()
    Scd.merge(Seq((1L, "A"), (2L, "B")).toDF("id", "seg"), root, "id", ts = 100)
    assert(state(root) === Set((1L, "A", 100L, None), (2L, "B", 100L, None)))

    // 1 changes, 2 is byte-identical (carried, no rewrite), 3 is new
    Scd.merge(Seq((1L, "X"), (2L, "B"), (3L, "C")).toDF("id", "seg"), root, "id", ts = 200)
    assert(state(root) === Set(
      (1L, "A", 100L, Some(200L)), (1L, "X", 200L, None),
      (2L, "B", 100L, None), (3L, "C", 200L, None)))

    // an all-unchanged batch is a true no-op: no new version at all
    val head = Snapshots.headVersion(spark, root)
    Scd.merge(Seq((1L, "X"), (2L, "B")).toDF("id", "seg"), root, "id", ts = 300)
    assert(Snapshots.headVersion(spark, root) === head)

    // third change on key 1: three-version history, one open interval
    Scd.merge(Seq((1L, "Z")).toDF("id", "seg"), root, "id", ts = 400)
    assert(state(root).filter(_._1 == 1L) === Set(
      (1L, "A", 100L, Some(200L)), (1L, "X", 200L, Some(400L)), (1L, "Z", 400L, None)))

    // as-of reads resolve each instant to its era; current = open intervals
    assert(Scd.asOf(spark, root, 150).select("id", "seg").as[(Long, String)]
      .collect().toSet === Set((1L, "A"), (2L, "B")))
    assert(Scd.asOf(spark, root, 250).select("id", "seg").as[(Long, String)]
      .collect().toSet === Set((1L, "X"), (2L, "B"), (3L, "C")))
    assert(Scd.current(spark, root).select("id", "seg").as[(Long, String)]
      .collect().toSet === Set((1L, "Z"), (2L, "B"), (3L, "C")))
  }

  test("null attributes compare null-safely") {
    val root = tmp()
    Scd.merge(Seq((1L, Option.empty[String]), (2L, Some("B"))).toDF("id", "seg"),
      root, "id", ts = 10)
    // null -> null is NOT a change; null -> value and value -> null are
    val head = Snapshots.headVersion(spark, root)
    Scd.merge(Seq((1L, Option.empty[String])).toDF("id", "seg"), root, "id", ts = 20)
    assert(Snapshots.headVersion(spark, root) === head)
    Scd.merge(Seq((1L, Some("V")), (2L, Option.empty[String])).toDF("id", "seg"),
      root, "id", ts = 30)
    assert(state(root) === Set(
      (1L, null, 10L, Some(30L)), (1L, "V", 30L, None),
      (2L, "B", 10L, Some(30L)), (2L, null, 30L, None)))
  }

  test("non-monotonic effective time is refused; replay via tag no-ops") {
    val root = tmp()
    Scd.merge(Seq((1L, "A")).toDF("id", "seg"), root, "id", ts = 100, tag = "b1")
    val e = intercept[IllegalArgumentException] {
      Scd.merge(Seq((1L, "B")).toDF("id", "seg"), root, "id", ts = 100)
    }
    assert(e.getMessage.contains("effective-time order"))

    Scd.merge(Seq((1L, "B")).toDF("id", "seg"), root, "id", ts = 200, tag = "b2")
    val afterB2 = state(root)
    // a replayed tagged batch (at-least-once delivery) changes nothing
    Scd.merge(Seq((1L, "B")).toDF("id", "seg"), root, "id", ts = 200, tag = "b2")
    assert(state(root) === afterB2)
  }

  test("only the changed keys' files rewrite — unchanged keys carry by reference") {
    val root = tmp()
    // clustered initial load: 4 files with tight id ranges
    Scd.merge(
      spark.range(1, 401).selectExpr("id", "concat('s', id % 7) AS seg")
        .repartitionByRange(4, $"id"),
      root, "id", ts = 1000, statsCols = Seq("id"))
    val v1 = Snapshots.headVersion(spark, root)

    // change 3 keys inside ONE file's range
    Scd.merge(
      Seq((10L, "CHANGED"), (20L, "CHANGED"), (30L, "CHANGED")).toDF("id", "seg"),
      root, "id", ts = 2000, statsCols = Seq("id"))
    val (added, removed) = Snapshots.diffFiles(spark, root, v1,
      Snapshots.headVersion(spark, root))
    assert(removed.size === 1, s"expected 1 rewritten file, got ${removed.size}")
    assert(added.nonEmpty)
    // and the history is right
    assert(Scd.current(spark, root).filter($"seg" === "CHANGED").count() === 3)
    assert(Scd.asOf(spark, root, 1500).filter($"seg" === "CHANGED").count() === 0)
  }

  test("enrich joins each fact to the version valid at ITS OWN time, never fans out") {
    val root = tmp()
    Scd.merge(Seq((1L, "A"), (2L, "B")).toDF("id", "seg"), root, "id", ts = 100)
    Scd.merge(Seq((1L, "X")).toDF("id", "seg"), root, "id", ts = 200)
    Scd.merge(Seq((1L, "Z"), (2L, "Y")).toDF("id", "seg"), root, "id", ts = 300)

    // facts straddle every epoch, incl. pre-history (ts=50) and an
    // unknown key (9): both keep NULL attrs — left join, facts never drop
    val facts = Seq(
      (10L, 1L, 50L), (11L, 1L, 150L), (12L, 1L, 250L), (13L, 1L, 350L),
      (14L, 2L, 150L), (15L, 2L, 350L), (16L, 9L, 150L))
      .toDF("fact_id", "id", "ts")
    val got = Scd.enrich(facts, root, "id", "ts")
      .select($"fact_id", $"seg").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      10L -> None, 11L -> Some("A"), 12L -> Some("X"), 13L -> Some("Z"),
      14L -> Some("B"), 15L -> Some("Y"), 16L -> None))
    // output cardinality == fact cardinality: intervals can't overlap
    assert(Scd.enrich(facts, root, "id", "ts").count() === facts.count())

    // a fact column colliding with a dimension attribute is refused loudly
    val bad = facts.withColumnRenamed("fact_id", "seg")
    assertThrows[IllegalArgumentException](Scd.enrich(bad, root, "id", "ts"))
  }
}
