package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** [[Snapshots.commitAll]] equivalence: the multi-batch commit must publish
  * EXACTLY the table the sequential per-batch commit loop published — same
  * rows, same per-file single-key layout, same stats index, same indexed
  * declaration — in one version instead of N. The per-key ingest queries
  * (q150/q152/q153) lean on that identity: their manifest-answered grouped
  * aggregates only hold if every staged file still carries its batch's
  * stats.
  */
class CommitAllSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("commitall").toString + "/t"

  private val rows = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
    (4L, "b", 40L), (5L, "c", 50L), (6L, "c", 60L))

  test("concurrent staging + one publish equals the sequential commit loop") {
    val df = rows.toDF("k", "g", "v")
    val keys = Seq("a", "b", "c")

    val seqRoot = tmp()
    keys.zipWithIndex.foreach { case (g, i) =>
      Snapshots.commit(df.filter(col("g") === g).repartition(1), seqRoot,
        append = i > 0, statsCols = Seq("g", "v"))
    }
    val allRoot = tmp()
    val v = Snapshots.commitAll(
      keys.map(g => df.filter(col("g") === g).repartition(1)), allRoot,
      statsCols = Seq("g", "v"))
    assert(v === 1L, "one publish, one version")

    // same rows
    val a = Snapshots.read(spark, allRoot).select("k", "g", "v")
      .as[(Long, String, Long)].collect().toSet
    val s = Snapshots.read(spark, seqRoot).select("k", "g", "v")
      .as[(Long, String, Long)].collect().toSet
    assert(a === s && a === rows.toSet)

    // same per-file stats index: every file single-key on g, v min/max per
    // file identical to the sequential loop's (compare as (g-range, v-range)
    // multisets — file names differ by construction)
    def statsOf(root: String): Set[(String, String, Double, Double)] = {
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      m.stats.groupBy(_.file).values.map { per =>
        val g = per.find(_.col == "g").get
        val vv = per.find(_.col == "v").get
        (g.slo, g.shi, vv.min, vv.max)
      }.toSet
    }
    assert(statsOf(allRoot) === statsOf(seqRoot))
    statsOf(allRoot).foreach { case (glo, ghi, _, _) =>
      assert(glo === ghi, "each staged file must stay single-key")
    }
  }

  test("append mode lands on the head and keeps its indexed declaration") {
    val root = tmp()
    Snapshots.commit(Seq((0L, "z", 0L)).toDF("k", "g", "v"), root,
      statsCols = Seq("k"))
    val v = Snapshots.commitAll(
      Seq("a", "b").map(g => rows.toDF("k", "g", "v").filter(col("g") === g)),
      root, append = true, statsCols = Seq("g"))
    assert(v === 2L)
    assert(Snapshots.read(spark, root).count() === 5)
    val meta = Snapshots.manifestMeta(spark, root, v)
    val (statsDecl, _) = meta.indexed.get
    assert(statsDecl.toSet === Set("k", "g"), "head's index unions with the batches'")
    // the pre-existing file carries forward by reference
    val m1 = Snapshots.manifest(spark, root, 1)
    val m2 = Snapshots.manifest(spark, root, 2)
    assert(m1.files.toSet.subsetOf(m2.files.toSet))
  }

  test("schema drift across batches is rejected") {
    val root = tmp()
    val e = intercept[IllegalArgumentException] {
      Snapshots.commitAll(
        Seq(Seq((1L, "a")).toDF("k", "g"), Seq((2L, "a", 1L)).toDF("k", "g", "v")),
        root)
    }
    assert(e.getMessage.contains("share one schema"))
  }
}
