package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{MergeClause, Snapshots}

/** Conditional MERGE INTO over snapshot tables: clause algebra
  * (first-match-wins, both-sides expressions), NOT MATCHED exactness, the
  * cardinality violation, and the copy-on-write carry-by-reference pin.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("mergeinto").toString + "/t"

  test("three-clause merge: delete beats update, update sees both sides, insert conforms") {
    val root = tmp()
    Snapshots.commit(
      Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("id", "s", "v"),
      root, statsCols = Seq("id"))
    // source matches 1 (update), 2 (overdrawn → delete), misses 4 (carry);
    // key 9 is new (insert); key 7 is new but fails the insert condition
    val src = Seq((1L, "A", 1.0), (2L, "B", 2.0), (9L, "I", 9.0), (7L, "X", -1.0))
      .toDF("id", "ns", "dv")
    Snapshots.mergeInto(src, root, "id", Seq(
      MergeClause.Delete(Some(col("t.v") < 0)),
      MergeClause.Update(Map("s" -> col("s.ns"), "v" -> (col("t.v") + col("s.dv")))),
      MergeClause.Insert(Map("s" -> col("s.ns"), "v" -> col("s.dv")),
        cond = Some(col("s.dv") > 0))))
    val got = Snapshots.read(spark, root)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set(
      (1L, "A", 11.0),  // updated: t.v + s.dv
      (3L, "c", 30.0),  // unmatched target: carried
      (4L, "d", 40.0),  // unmatched target: carried
      (9L, "I", 9.0)))  // inserted (2 deleted; 7 failed the insert cond)
  }

  test("clause order is first-match-wins: update before delete shields matched rows") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 10.0), (2L, -5.0)).toDF("id", "v"), root)
    Snapshots.mergeInto(Seq((1L, 0.0), (2L, 0.0)).toDF("id", "z"), root, "id", Seq(
      MergeClause.Update(Map("v" -> lit(99.0)), cond = Some(col("t.v") < 0)),
      MergeClause.Delete()))
    // row 2 hit the conditional update FIRST; row 1 fell through to delete
    assert(Snapshots.read(spark, root).as[(Long, Double)].collect().toSet ===
      Set((2L, 99.0)))
  }

  test("matched pair no clause accepts carries the target row unchanged") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), root)
    Snapshots.mergeInto(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "d"), root, "id", Seq(
      MergeClause.Update(Map("v" -> (col("t.v") + col("s.d"))),
        cond = Some(col("t.v") > 15))))
    assert(Snapshots.read(spark, root).as[(Long, Double)].collect().toSet ===
      Set((1L, 10.0), (2L, 22.0)))
  }

  test("empty-values insert takes source columns by name, null-filling the rest") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a", 1.0)).toDF("id", "s", "v"), root)
    // source carries id + v but no s column
    Snapshots.mergeInto(Seq((5L, 5.5)).toDF("id", "v"), root, "id",
      Seq(MergeClause.Insert()))
    val got = Snapshots.read(spark, root)
      .select($"id", coalesce($"s", lit("?")).as("s"), $"v")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 1.0), (5L, "?", 5.5)))
  }

  test("duplicate source keys are refused (SQL cardinality violation)") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 1.0)).toDF("id", "v"), root)
    val dup = Seq((1L, 2.0), (1L, 3.0)).toDF("id", "d")
    val e = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(dup, root, "id",
        Seq(MergeClause.Update(Map("v" -> col("s.d")))))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("typo'd SET / VALUES columns are refused, not silently dropped") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 1.0)).toDF("id", "v"), root)
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(Seq((1L, 2.0)).toDF("id", "d"), root, "id",
        Seq(MergeClause.Update(Map("w" -> col("s.d")))))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(Seq((1L, 2.0)).toDF("id", "d"), root, "id",
        Seq(MergeClause.Insert(Map("w" -> col("s.d")))))
    }
  }

  test("mergeInto rewrites only files the source keys can touch; rest carry by reference") {
    val root = tmp()
    val base = spark.range(0, 800)
      .select($"id", lit("old").as("s"), ($"id" % 9).cast("double").as("v"))
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Snapshots.commit(base, root, statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1)
    assert(m1.files.size === 8)

    // source keys confined to one 10-wide band + one brand-new key beyond
    // the table range: 1-2 of the 8 range-clustered files can be touched
    val src = spark.range(100, 110)
      .select($"id", lit("upd").as("ns"))
      .unionByName(Seq((5000L, "new")).toDF("id", "ns"))
    val v = Snapshots.mergeInto(src, root, "id", Seq(
      MergeClause.Update(Map("s" -> col("s.ns"))),
      MergeClause.Insert(Map("s" -> col("s.ns"), "v" -> lit(0.0)))),
      statsCols = Seq("id"))
    assert(v === 2L)
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6, s"only ${carried.size} of 8 files carried untouched")
    assert(carried.size < 8, "no file was rewritten — merge lost?")

    val got = Snapshots.read(spark, root)
    assert(got.count() === 801)
    assert(got.filter($"s" === "upd").select("id").as[Long].collect().toSet ===
      (100L to 109L).toSet)
    assert(got.filter($"id" === 5000L).select("s").as[String].head() === "new")
    // pinned history intact; stats index consistent over carried + rewritten
    assert(Snapshots.read(spark, root, 1).filter($"s" =!= "old").count() === 0)
    val statFiles = m2.stats.map(_.file).toSet
    val headFiles =
      m2.files.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(statFiles === headFiles, "mergeInto dropped or orphaned file stats")
  }

  test("NOT MATCHED BY SOURCE: full-sync updates/deletes unmentioned rows") {
    val root = tmp()
    Snapshots.commit(
      Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("id", "s", "v"),
      root, statsCols = Seq("id"))
    // feed mentions 1 (update) and 9 (insert); 2/3/4 are unmentioned:
    // 2 is overdrawn → by-source delete; 3/4 → by-source flag
    val feed = Seq((1L, "A"), (9L, "I")).toDF("id", "ns")
    Snapshots.mergeInto(feed, root, "id", Seq(
      MergeClause.Update(Map("s" -> col("s.ns"))),
      MergeClause.BySourceDelete(Some(col("t.v") < 0)),
      MergeClause.BySourceUpdate(Map("s" -> lit("STALE"))),
      MergeClause.Insert(Map("s" -> col("s.ns"), "v" -> lit(0.0)))))
    val got = Snapshots.read(spark, root)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set(
      (1L, "A", 10.0),      // matched update
      (3L, "STALE", 30.0),  // unmentioned: flagged
      (4L, "STALE", 40.0),  // unmentioned: flagged
      (9L, "I", 0.0)))      // inserted (2 deleted by-source)
  }

  test("by-source clause order is first-match-wins within its family") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 10.0), (2L, -5.0)).toDF("id", "v"), root)
    // update-before-delete: the conditional flag shields negative rows
    Snapshots.mergeInto(Seq((99L, 0.0)).toDF("id", "z"), root, "id", Seq(
      MergeClause.BySourceUpdate(Map("v" -> lit(99.0)), cond = Some(col("t.v") < 0)),
      MergeClause.BySourceDelete()))
    assert(Snapshots.read(spark, root).as[(Long, Double)].collect().toSet ===
      Set((2L, 99.0)))
  }

  test("insert-only merge against untouched band is exact (NOT MATCHED is global)") {
    val root = tmp()
    val base = spark.range(0, 400).select($"id", lit(1.0).as("v"))
      .repartitionByRange(4, $"id").sortWithinPartitions("id")
    Snapshots.commit(base, root, statsCols = Seq("id"))
    // keys 395..404: half exist (no-op under insert-only), half are new
    Snapshots.mergeInto(
      spark.range(395, 405).select($"id", lit(2.0).as("v")), root, "id",
      Seq(MergeClause.Insert()), statsCols = Seq("id"))
    val got = Snapshots.read(spark, root).as[(Long, Double)].collect().toSet
    assert(got === ((0L until 400L).map((_, 1.0)) ++
      (400L until 405L).map((_, 2.0))).toSet)
  }
}
