package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Non-additive schema evolution via column mapping: rename/drop as
  * metadata-only commits, stable physical names, both-generation reads,
  * stats pruning across renames, and the re-add-after-drop guard.
  */
class SchemaEvoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("evo").toString + "/t"

  test("rename is metadata-only; both file generations read under the new name") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 400).select($"id", ($"id" * 2).as("v")).repartition(4),
      root, statsCols = Seq("id"))
    val m1 = Snapshots.manifest(spark, root, 1)

    val v2 = Snapshots.renameColumn(spark, root, "v", "val")
    assert(v2 === 2L)
    val m2 = Snapshots.manifest(spark, root, 2)
    assert(m2.files === m1.files, "rename must not touch a single data file")

    // append a post-rename generation, written under the batch's new name
    Snapshots.commit(
      spark.range(400, 500).select($"id", ($"id" * 2).as("val")),
      root, append = true, statsCols = Seq("id"))

    val got = Snapshots.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "val"))
    // every row of BOTH generations surfaces with the right values
    assert(got.as[(Long, Long)].collect().toSet ===
      (0L until 500L).map(i => (i, i * 2)).toSet)
    // time travel to the pre-rename version keeps the OLD name
    assert(Snapshots.read(spark, root, 1).columns.toSeq === Seq("id", "v"))
  }

  test("stats pruning and copy-on-write merge keep working on a renamed key") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 800).select($"id", lit("old").as("s"))
        .repartitionByRange(8, $"id").sortWithinPartitions("id"),
      root, statsCols = Seq("id"))
    Snapshots.renameColumn(spark, root, "id", "key")
    // pruning consults the relabeled stats under the NEW logical name
    val m = Snapshots.manifest(spark, root, 2)
    assert(m.stats.count(_.col == "key") === 8, "stats not relabeled to the new name")
    assert(Snapshots.candidateFiles(m, "key", 250, 349).size <= 2)
    val pruned = Snapshots.readRange(spark, root, "key", 250, 349)
      .select("key").as[Long].collect().sorted
    assert(pruned.toSeq === (250L to 349L))
    // readWhere mines the analyst's predicate against the renamed column
    val rw = Snapshots.readWhere(spark, root, $"key" >= 250 && $"key" <= 349)
    assert(rw.count() === 100)

    // copy-on-write merge keyed on the renamed column: pruned rewrite, the
    // untouched generations carry by reference
    val v = Snapshots.merge(
      spark.range(100, 110).select($"id".as("key"), lit("new").as("s")),
      root, key = "key", statsCols = Seq("key"))
    val mAfter = Snapshots.manifest(spark, root, v)
    val carried = mAfter.files.toSet.intersect(m.files.toSet)
    assert(carried.size >= 6, s"only ${carried.size} of 8 files carried untouched")
    val rows = Snapshots.read(spark, root).as[(Long, String)].collect()
    assert(rows.length === 800)
    assert(rows.filter(_._2 == "new").map(_._1).toSet === (100L to 109L).toSet)
  }

  test("drop is metadata-only; a re-added column never resurrects old values") {
    val root = tmp()
    Snapshots.commit(
      Seq((1L, "secret1", 10.0), (2L, "secret2", 20.0)).toDF("id", "s", "v"),
      root)
    val m1 = Snapshots.manifest(spark, root, 1)
    val v2 = Snapshots.dropColumn(spark, root, "s")
    assert(v2 === 2L)
    assert(Snapshots.manifest(spark, root, 2).files === m1.files)
    assert(Snapshots.read(spark, root).columns.toSeq === Seq("id", "v"))
    // pinned history still shows the column
    assert(Snapshots.read(spark, root, 1).columns.contains("s"))

    // re-introduce a column NAMED s: old rows must read null, never the
    // dropped generation's values (fresh physical name)
    Snapshots.commit(Seq((3L, "fresh", 30.0)).toDF("id", "s", "v"),
      root, append = true)
    val got = Snapshots.read(spark, root)
      .select($"id", coalesce($"s", lit("<null>")).as("s"), $"v")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set(
      (1L, "<null>", 10.0), (2L, "<null>", 20.0), (3L, "fresh", 30.0)))
  }

  test("rename onto a dropped column's name is safe (physical stays distinct)") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "keepme", "dropme")).toDF("id", "a", "b"), root)
    Snapshots.dropColumn(spark, root, "b")
    Snapshots.renameColumn(spark, root, "a", "b")
    // b now means the OLD a — never the dropped b's bytes
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "keepme")))
  }

  test("merge after drop+re-add writes the fresh physical consistently") {
    val root = tmp()
    Snapshots.commit(
      spark.range(0, 100).select($"id", lit("x").as("tag0"), $"id".cast("double").as("v")),
      root, statsCols = Seq("id"))
    Snapshots.dropColumn(spark, root, "tag0")
    // a merge batch re-introducing the name: new physical assigned, and the
    // whole lifecycle (merge → read → append → read) stays coherent
    Snapshots.merge(
      spark.range(50, 60).select($"id", lit("m").as("tag0"), lit(0.0).as("v")),
      root, key = "id", statsCols = Seq("id"))
    val afterMerge = Snapshots.read(spark, root)
      .select($"id", coalesce($"tag0", lit("-")).as("t"), $"v")
      .as[(Long, String, Double)].collect()
    assert(afterMerge.count(_._2 == "m") === 10)
    assert(afterMerge.count(_._2 == "-") === 90, "old rows must read null tag0")
    Snapshots.commit(
      spark.range(100, 110).select($"id", lit("a").as("tag0"), lit(1.0).as("v")),
      root, append = true)
    val finalRows = Snapshots.read(spark, root)
      .select($"id", coalesce($"tag0", lit("-")).as("t"))
      .as[(Long, String)].collect()
    assert(finalRows.length === 110)
    assert(finalRows.count(_._2 == "a") === 10)
    assert(finalRows.count(_._2 == "m") === 10)
  }

  test("rename/drop refuse nonsense loudly") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    intercept[RuntimeException](Snapshots.renameColumn(spark, root, "nope", "x"))
    intercept[RuntimeException](Snapshots.renameColumn(spark, root, "s", "id"))
    intercept[RuntimeException](Snapshots.dropColumn(spark, root, "nope"))
    Snapshots.dropColumn(spark, root, "s")
    intercept[RuntimeException](Snapshots.dropColumn(spark, root, "id"))
  }
}
