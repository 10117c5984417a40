package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.engine.Snapshots

/** Zero-copy adoption of plain parquet directories ([[Snapshots.convertInPlace]]):
  * the CONVERT-in-place migration path onto the snapshot layer.
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("conv").toString + "/t"

  private def listParquet(root: String): Seq[String] = {
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] = f.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Seq.empty
      else if (st.isDirectory) walk(st.getPath)
      else if (n.endsWith(".parquet")) Seq(st.getPath.toString)
      else Seq.empty
    }
    walk(new Path(root)).sorted
  }

  test("convert is zero-copy: v1 references the original files in place") {
    val root = tmp()
    (1L to 100L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(3).write.parquet(root)
    (101L to 120L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(2).write.mode("append").parquet(root)
    val before = listParquet(root)
    assert(before.size === 5)

    val v = Snapshots.convertInPlace(spark, root, statsCols = Seq("id"))
    assert(v === 1L)
    // the manifest names EXACTLY the pre-existing files — nothing rewritten,
    // nothing landed under data/
    val m = Snapshots.manifest(spark, root, 1)
    assert(m.files.sorted === before)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$root/data")))
    // snapshot read ≡ the original content, and per-file stats were
    // collected from the adopted files (each of the 5 files has an id range)
    assert(Snapshots.read(spark, root).as[(Long, String)].collect().toSet ===
      (1L to 120L).map(i => (i, s"s$i")).toSet)
    assert(m.stats.count(_.col == "id") === 5)
    // the directory still serves PLAIN parquet readers (gradual cutover:
    // _snapshots/ is underscore-prefixed, FileIndex listings skip it)
    assert(spark.read.parquet(root).count() === 120L)
  }

  test("adopted tables live the full lifecycle: append, merge, vacuum ownership") {
    val root = tmp()
    (1L to 50L).map(i => (i, i * 10L)).toDF("id", "v")
      .repartition(2).write.parquet(root)
    Snapshots.convertInPlace(spark, root, statsCols = Seq("id"))
    val adopted = Snapshots.manifest(spark, root, 1).files.toSet

    // append lands beside the adopted files; they carry by reference
    Snapshots.commit(Seq((51L, 510L)).toDF("id", "v"), root, append = true,
      statsCols = Seq("id"))
    val m2 = Snapshots.manifest(spark, root, 2)
    assert(adopted.subsetOf(m2.files.toSet))

    // copy-on-write merge: only the touched adopted files rewrite
    Snapshots.merge(Seq((1L, 999L)).toDF("id", "v"), root, key = "id",
      statsCols = Seq("id"))
    val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got(1L) === 999L && got(51L) === 510L && got.size === 51)

    // vacuum takes ownership: dropping history deletes the adopted files
    // that no retained manifest references, like any other data file
    Snapshots.vacuum(spark, root, keepLast = 1)
    val live = Snapshots.manifest(spark, root,
      Snapshots.headVersion(spark, root)).files.toSet
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    adopted.foreach { uri =>
      assert(f.exists(new Path(uri)) === live.contains(uri),
        s"$uri should exist iff still referenced")
    }
    assert(Snapshots.read(spark, root).as[(Long, Long)].collect().toMap.apply(1L) === 999L)
  }

  test("adopted per-file stats prune range reads on a clustered layout") {
    val root = tmp()
    // two plain writes with disjoint id ranges → tight per-file ranges
    (1L to 1000L).map(i => (i, i)).toDF("id", "v").coalesce(1).write.parquet(root)
    (1001L to 2000L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(root)
    Snapshots.convertInPlace(spark, root, statsCols = Seq("id"))
    val m = Snapshots.manifest(spark, root, 1)
    // a range probe inside the first write's span touches ONE of the two files
    assert(Snapshots.candidateFiles(m, "id", 10, 20).size === 1)
    assert(Snapshots.readRange(spark, root, "id", 10, 20).count() === 11L)
  }

  test("hive-partitioned layouts and basename collisions are refused loudly") {
    val root = tmp()
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$root/lang=en")
    val e = intercept[IllegalArgumentException] {
      Snapshots.convertInPlace(spark, root)
    }
    assert(e.getMessage.contains("hive-partitioned"))

    // duplicate basenames under different subdirs: fine without stats,
    // refused with stats (ColStats keys by basename)
    val root2 = tmp()
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(s"$root2/a")
    val f = new Path(root2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = listParquet(s"$root2/a").head
    f.mkdirs(new Path(s"$root2/b"))
    org.apache.hadoop.fs.FileUtil.copy(f, new Path(src), f,
      new Path(s"$root2/b/${new Path(src).getName}"), false,
      spark.sparkContext.hadoopConfiguration)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.convertInPlace(spark, root2, statsCols = Seq("id"))
    }
    assert(e2.getMessage.contains("basename"))
    assert(Snapshots.convertInPlace(spark, root2) === 1L)
    assert(Snapshots.read(spark, root2).count() === 2L)
  }

  test("converting twice, or over an existing snapshot table, is refused") {
    val root = tmp()
    Seq((1L, "a")).toDF("id", "s").write.parquet(root)
    Snapshots.convertInPlace(spark, root)
    val e = intercept[IllegalArgumentException] {
      Snapshots.convertInPlace(spark, root)
    }
    assert(e.getMessage.contains("already has a snapshot history"))
  }
}
