package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** Per-file Bloom index for STRING keys: the pruning tier the numeric
  * min/max stats cannot provide for doc-id/hash-keyed corpus tables —
  * before it, every string-keyed merge/delete rewrote the whole table.
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("bloom").toString + "/t"

  private def docs(from: Int, until: Int, s: String) =
    spark.range(from, until)
      .select(format_string("doc%04d", $"id").as("doc"), lit(s).as("s"))

  test("string-keyed merge prunes by per-file blooms; rest carry by reference") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 800, "old").repartitionByRange(8, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    val m1 = Snapshots.manifest(spark, root, 1)
    assert(m1.files.size === 8)
    assert(m1.blooms.count(_.col == "doc") === 8, "one bloom per file expected")

    // upsert 10 keys confined to one clustered band: the other files'
    // blooms must reject them all and carry by reference
    val v = Snapshots.merge(docs(100, 110, "new"), root, "doc",
      bloomCols = Seq("doc"))
    assert(v === 2L)
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6,
      s"only ${carried.size} of 8 files carried — bloom pruning dead?")
    assert(carried.size < 8, "no file rewritten — upsert lost?")

    val got = Snapshots.read(spark, root).as[(String, String)].collect()
    assert(got.length === 800)
    assert(got.filter(_._2 == "new").map(_._1).toSet ===
      (100 until 110).map(i => f"doc$i%04d").toSet)
    // blooms survive the partial rewrite for every head file
    val bloomFiles = m2.blooms.map(_.file).toSet
    val headFiles =
      m2.files.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(bloomFiles === headFiles, "merge dropped or orphaned file blooms")
  }

  test("scattered string deletes prune per file membership") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 800, "x").repartitionByRange(8, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    val m1 = Snapshots.manifest(spark, root, 1)
    // three scattered keys: only their three home files can admit them
    // (modulo bloom false positives, which only widen the rewrite)
    val del = Seq("doc0050", "doc0450", "doc0750").toDF("doc")
    Snapshots.delete(del, root, "doc", bloomCols = Seq("doc"))
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 4, s"only ${carried.size} of 8 carried for 3 scattered keys")
    val ids = Snapshots.read(spark, root).select("doc").as[String].collect().toSet
    assert(ids.size === 797 && !ids("doc0050") && !ids("doc0450") && !ids("doc0750"))
  }

  test("a table without blooms stays conservative and correct") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 400, "old").repartitionByRange(4, $"doc").sortWithinPartitions("doc"),
      root) // no bloomCols
    Snapshots.merge(docs(10, 20, "new"), root, "doc")
    val got = Snapshots.read(spark, root).as[(String, String)].collect()
    assert(got.length === 400)
    assert(got.count(_._2 == "new") === 10)
  }

  test("readForKeys on a bloom-indexed string key is exact") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 800, "x").repartitionByRange(8, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    val keys = Seq("doc0123", "doc0456", "doc0789", "nope").toDF("doc")
    val got = Snapshots.readForKeys(spark, root, "doc", keys)
      .select("doc").as[String].collect().toSet
    assert(got === Set("doc0123", "doc0456", "doc0789"))
  }

  test("blooms carry through compactManifests and keep pruning") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 400, "a").repartitionByRange(4, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    Snapshots.commit(
      docs(400, 800, "b").repartitionByRange(4, $"doc").sortWithinPartitions("doc"),
      root, append = true, bloomCols = Seq("doc"))
    Snapshots.compactManifests(spark, root)
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.blooms.size === 8, "consolidation lost the bloom index")
    // pruning still live post-consolidation
    val cand = Snapshots.candidateFilesForStrings(m, "doc", Array("doc0001"))
    assert(cand.size <= 2, s"bloom pruning kept ${cand.size} of 8 files")
  }

  test("maintenance under a bloomCols policy re-collects the index") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 800, "x").repartitionByRange(8, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    graft.engine.Maintain.maintain(spark, root,
      graft.engine.MaintenancePolicy(
        compactTargetFiles = 4, bloomCols = Seq("doc"), vacuumKeepLast = 1))
    val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    assert(m.files.size === 4)
    assert(m.blooms.count(_.col == "doc") === 4,
      "compaction dropped the bloom index despite the policy")
    // note: plain repartition scatters keys across files, so membership
    // still prunes only when a key's bloom rejects — assert exactness, not
    // a carried count, on the post-compaction layout
    val got = Snapshots.readForKeys(spark, root, "doc",
      Seq("doc0010", "doc0500").toDF("doc")).select("doc").as[String].collect().toSet
    assert(got === Set("doc0010", "doc0500"))
  }

  test("readWhere prunes string equality and IN through the bloom index") {
    val root = tmp()
    Snapshots.commit(
      docs(0, 800, "x").repartitionByRange(8, $"doc").sortWithinPartitions("doc"),
      root, bloomCols = Seq("doc"))
    // equality: the analyst's own WHERE, no pruning API in sight
    val eq = Snapshots.readWhere(spark, root, $"doc" === "doc0123")
    assert(eq.inputFiles.length <= 2,
      s"equality scanned ${eq.inputFiles.length} of 8 files")
    assert(eq.select("doc").as[String].collect().toSeq === Seq("doc0123"))
    // IN list across two bands
    val in = Snapshots.readWhere(spark, root, $"doc".isin("doc0050", "doc0700"))
    assert(in.inputFiles.length <= 4,
      s"IN scanned ${in.inputFiles.length} of 8 files")
    assert(in.select("doc").as[String].collect().toSet === Set("doc0050", "doc0700"))
    // a conjunct the bloom can't mine stays conservative and exact
    val mixed = Snapshots.readWhere(spark, root,
      $"doc" === "doc0123" && length($"s") > 0)
    assert(mixed.count() === 1)
    // countWhere with a bloomed conjunct: exact via the scan path (a bloom
    // can prove absence, never full acceptance)
    assert(Snapshots.countWhere(spark, root, $"doc" === "doc0123") === 1L)
  }

  test("convertInPlace adopts a bloom index; merges prune from commit one") {
    val root = tmp()
    // a PLAIN directory, written without any snapshot machinery
    docs(0, 800, "old").repartitionByRange(8, $"doc").sortWithinPartitions("doc")
      .write.parquet(root)
    Snapshots.convertInPlace(spark, root, bloomCols = Seq("doc"))
    val m1 = Snapshots.manifest(spark, root, 1)
    assert(m1.blooms.count(_.col == "doc") === 8, "adoption skipped the bloom index")
    // first transactional merge prunes through the ADOPTED blooms
    Snapshots.merge(docs(100, 110, "new"), root, "doc", bloomCols = Seq("doc"))
    val m2 = Snapshots.manifest(spark, root, 2)
    val carried = m2.files.toSet.intersect(m1.files.toSet)
    assert(carried.size >= 6, s"only ${carried.size} of 8 adopted files carried")
    assert(Snapshots.read(spark, root).filter($"s" === "new").count() === 10)
  }

  test("bloomCols on a non-string column refuses loudly") {
    val root = tmp()
    val e = intercept[Exception] {
      Snapshots.commit(spark.range(0, 10).select($"id", lit("s").as("s")),
        root, bloomCols = Seq("id"))
    }
    assert(e.getMessage.contains("STRING"))
  }
}
