package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.engine.S3Like

/** Round-trip + multipart + multi-file-union suites mirroring the reference's
  * tests/test_s3.py patterns (SURVEY.md §5): write-then-read-back equality,
  * exact multipart key naming, sorted multipart total order, union matrix,
  * negative validation, empty match → None.
  */
class S3LikeSpec extends SparkSpec {
  import spark.implicits._

  // the reference's 4-row fixture (tests/test_s3.py:30, FIXTURES.md §1)
  def fixture: DataFrame =
    Seq((3L, "a"), (2L, "b"), (1L, "c"), (0L, "d")).toDF("col_1", "col_2")

  def tmp(): String = "file:" + Files.createTempDirectory("s3like").toString

  def sortedRows(df: DataFrame): Seq[(Long, String)] =
    df.select("col_1", "col_2").as[(Long, String)].collect().toSeq.sorted

  test("csv round-trip") {
    val dir = tmp() + "/key.csv"
    S3Like.putDf(fixture, dir, format = "csv")
    val back = S3Like.getDf(spark, dir, "csv")
    assert(back.columns.toSeq == Seq("col_1", "col_2"))
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("csv round-trip with custom separator (kwargs pass-through)") {
    val dir = tmp() + "/key.csv"
    S3Like.putDf(fixture, dir, format = "csv", options = Map("sep" -> ";"))
    val back = S3Like.getDf(spark, dir, "csv", options = Map("sep" -> ";"))
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("csv+gzip round-trip") {
    val dir = tmp() + "/key.csv"
    S3Like.putDf(fixture, dir, format = "csv", compression = Some("gzip"))
    val fsDir = new java.io.File(dir.stripPrefix("file:"))
    assert(fsDir.listFiles().exists(_.getName.endsWith(".csv.gz")), "gzip codec applied")
    val back = S3Like.getDf(spark, dir, "csv")
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("parquet round-trip") {
    val dir = tmp() + "/key.parquet"
    S3Like.putDf(fixture, dir, format = "parquet")
    assert(sortedRows(S3Like.getDf(spark, dir, "parquet")) == sortedRows(fixture))
  }

  test("partitioned write: hive directory layout, lossless read-back, validation") {
    val df = Seq((1L, "en", "x"), (2L, "fr", "y"), (3L, "en", "z"))
      .toDF("id", "lang", "txt")
    val dir = tmp() + "/docs"
    S3Like.putDf(df, dir, format = "parquet", partitionKeys = Seq("lang"))
    // the distributed form of the reference's prefix-keyed layout: one
    // directory per partition value
    val dirs = new java.io.File(dir.stripPrefix("file:"))
      .listFiles().map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs == Set("lang=en", "lang=fr"), s"unexpected partition dirs: $dirs")
    val back = S3Like.getDf(spark, dir, "parquet")
    assert(back.count() == 3)
    assert(back.filter($"lang" === "en").select("id").as[Long].collect().toSet == Set(1L, 3L))
    // a partition-column predicate prunes directories at plan time
    val pruned = back.filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(pruned).isDefined,
      s"lang predicate not in PartitionFilters:\n$pruned")
    intercept[IllegalArgumentException](
      S3Like.putDf(df, dir, format = "xlsx", partitionKeys = Seq("lang")))
    intercept[IllegalArgumentException](
      S3Like.putDf(df, dir, format = "parquet", partitionKeys = Seq("nope")))
    intercept[IllegalArgumentException](
      S3Like.putDf(df, dir, format = "parquet", partitionKeys = Seq("lang"), parts = 2))
  }

  test("orc round-trip and magic-byte sniff") {
    val dir = tmp() + "/key.orc"
    S3Like.putDf(fixture, dir, format = "orc")
    assert(sortedRows(S3Like.getDf(spark, dir, "orc")) == sortedRows(fixture))
    // mixed mode recognizes the 3-byte ORC header on an extension-less key
    val base = tmp()
    S3Like.putDf(fixture, s"$base/m/blob1", format = "orc", exactNaming = true)
    val back = S3Like.getDfFromKeys(spark, s"$base/m", format = "mixed").get
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("json round-trip") {
    val dir = tmp() + "/key.json"
    S3Like.putDf(fixture, dir, format = "json")
    val back = S3Like.getDf(spark, dir, "json").select("col_1", "col_2")
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("xlsx round-trip (reference format, self-contained codec)") {
    val dir = tmp() + "/key.xlsx"
    S3Like.putDf(fixture, dir, format = "xlsx")
    val back = S3Like.getDf(spark, dir, "xlsx")
    assert(back.columns.toSeq == Seq("col_1", "col_2"))
    assert(back.schema("col_1").dataType.typeName == "long")
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("xlsx multipart: reference key naming, ordered parts, union read-back") {
    val base = tmp()
    val dir = base + "/key.xlsx"
    S3Like.putDf(fixture, dir, format = "xlsx", parts = 3, sortKeys = Seq("col_1"))
    val fsDir = new java.io.File(base.stripPrefix("file:") + "/key")
    assert(fsDir.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq ==
      Seq("key.1.xlsx", "key.2.xlsx", "key.3.xlsx"))
    // parts are contiguous slices of the sorted frame: first part carries the
    // extra row (np.array_split sizing), ordering is global across parts
    val firstPart = S3Like.getDf(spark, base + "/key/key.1.xlsx", "xlsx")
    assert(firstPart.count() == 2)
    assert(sortedRows(firstPart) == Seq((0L, "d"), (1L, "c")))
    val back = S3Like.getDfFromKeys(spark, base + "/key", suffix = ".xlsx").get
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("xlsx multipart with more parts than rows skips empty workbooks") {
    val base = tmp()
    S3Like.putDf(fixture, base + "/key.xlsx", format = "xlsx", parts = 6,
      sortKeys = Seq("col_1"))
    val fsDir = new java.io.File(base.stripPrefix("file:") + "/key")
    assert(fsDir.listFiles().count(f => f.getName.endsWith(".xlsx")) == 4)
    val back = S3Like.getDfFromKeys(spark, base + "/key", suffix = ".xlsx").get
    assert(back.schema("col_1").dataType.typeName == "long")
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("object (pickle-analogue) round-trip preserves schema exactly") {
    val dir = tmp() + "/key.obj"
    val df = fixture.withColumn("ts", org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    S3Like.putDf(df, dir, format = "object")
    val back = S3Like.getDf(spark, dir, "object")
    assert(back.schema == df.schema)
    assert(back.count() == 4)
  }

  test("multipart names keep every basename segment: a.b.xlsx -> a/a.{i}.b.xlsx") {
    // reference composes part names from ALL segments (pandas_aws/s3.py:193-195)
    val base = tmp()
    S3Like.putDf(fixture, s"$base/a.b.xlsx", format = "xlsx", parts = 2,
      sortKeys = Seq("col_1"))
    val names = S3Like.listKeys(spark, s"$base/a").toSeq.sorted
    assert(names.map(_.split('/').takeRight(2).mkString("/")) ==
      Seq("a/a.1.b.xlsx", "a/a.2.b.xlsx"))
    // same rule on the rename pass: a.b.csv -> a/a.{i}.b.csv — written into a
    // SEPARATE folder (the xlsx parts above live under this base's /a too,
    // hence a fresh base)
    val base2 = tmp()
    S3Like.putDf(fixture, s"$base2/a.b.csv", format = "csv", parts = 2, exactNaming = true)
    val csvNames = S3Like.listKeys(spark, s"$base2/a").toSeq.sorted
    assert(csvNames.map(_.split('/').takeRight(2).mkString("/")) ==
      Seq("a/a.1.b.csv", "a/a.2.b.csv"))
    // an empty stem would produce hidden-file part names — rejected
    intercept[IllegalArgumentException](
      S3Like.putDf(fixture, s"$base/.xlsx", format = "xlsx", parts = 2))
  }

  test("multipart write only clears its own part files, not unrelated content") {
    val base = tmp()
    val dir = new java.io.File(base.stripPrefix("file:") + "/key")
    dir.mkdirs()
    val bystander = new java.io.File(dir, "precious.txt")
    java.nio.file.Files.write(bystander.toPath, "keep me".getBytes)
    // a stale part from a previous (larger) write must be cleared...
    val stale = new java.io.File(dir, "key.9.xlsx")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    S3Like.putDf(fixture, s"$base/key.xlsx", format = "xlsx", parts = 2,
      sortKeys = Seq("col_1"))
    val names = dir.listFiles().map(_.getName).toSet
    assert(!names.contains("key.9.xlsx"), "stale part not cleared")
    assert(names.contains("precious.txt"), "unrelated file destroyed by multipart write")
    assert(names.contains("key.1.xlsx") && names.contains("key.2.xlsx"))
  }

  test("multipart exact naming: mockfolder/key1.csv -> mockfolder/key1/key1.{1,2}.csv") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/mockfolder/key1.csv", format = "csv", parts = 2, exactNaming = true)
    val names = S3Like.listKeys(spark, s"$base/mockfolder").toSeq.sorted
    assert(names.map(_.split('/').takeRight(2).mkString("/")) ==
      Seq("key1/key1.1.csv", "key1/key1.2.csv"))
  }

  test("single-part exact naming writes the key verbatim") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/mockfolder/key1.csv", format = "csv", parts = 1, exactNaming = true)
    val names = S3Like.listKeys(spark, s"$base/mockfolder").toSeq
    assert(names.map(_.split('/').last) == Seq("key1.csv"))
  }

  test("sorted multipart reconstructs global order (reference tests/test_s3.py:173-183)") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/k.csv", format = "csv", parts = 2,
      sortKeys = Seq("col_1", "col_2"), exactNaming = true)
    val files = S3Like.listKeys(spark, s"$base/k").toSeq.sorted
    assert(files.size == 2)
    // concatenating part 1 then part 2 must give the globally sorted frame
    val parts = files.map(f => S3Like.getDf(spark, f, "csv").as[(Long, String)].collect().toSeq)
    val concat = parts.flatten
    assert(concat == concat.sorted, s"not globally sorted: $concat")
    assert(concat.map(_._1) == Seq(0L, 1L, 2L, 3L))
  }

  test("put_df rejects bad inputs (reference negative tests)") {
    intercept[IllegalArgumentException](S3Like.putDf(fixture, tmp(), format = "avro"))
    intercept[IllegalArgumentException](S3Like.putDf(fixture, tmp(), parts = 0))
    intercept[IllegalArgumentException](S3Like.putDf(fixture, tmp(), format = "parquet", compression = Some("gzip")))
    intercept[IllegalArgumentException](S3Like.putDf(fixture, tmp(), sortKeys = Seq("nope")))
    intercept[IllegalArgumentException](S3Like.getDf(spark, tmp(), "avro"))
  }

  test("listKeys: prefix + suffix filter + laziness") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/a/f1.csv", format = "csv", exactNaming = true)
    S3Like.putDf(fixture, s"$base/a/f2.parquet", format = "parquet", exactNaming = true)
    S3Like.putDf(fixture, s"$base/b/f3.csv", format = "csv", exactNaming = true)
    assert(S3Like.listKeys(spark, s"$base/a").size == 2)
    assert(S3Like.listKeys(spark, s"$base/a", suffix = ".csv").size == 1)
    assert(S3Like.listKeys(spark, base).size == 3)
    assert(S3Like.listKeys(spark, s"$base/missing").isEmpty)
  }

  test("getDfFromKeys: per-suffix dispatch unions heterogeneous formats") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/u/f1.csv", format = "csv", exactNaming = true)
    S3Like.putDf(fixture, s"$base/u/f2.csv", format = "csv", exactNaming = true)
    S3Like.putDf(fixture, s"$base/u/f3.parquet", format = "parquet", exactNaming = true)
    val got = S3Like.getDfFromKeys(spark, s"$base/u").get
    assert(got.count() == 12)
    assert(got.agg(org.apache.spark.sql.functions.sum("col_1")).as[Long].head() == 18L) // 6*3
  }

  test("getDfFromKeys: mixed mode sniffs magic bytes") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/m/data1", format = "csv", exactNaming = true)
    S3Like.putDf(fixture, s"$base/m/data2", format = "parquet", exactNaming = true)
    S3Like.putDf(fixture, s"$base/m/data3", format = "xlsx")
    val got = S3Like.getDfFromKeys(spark, s"$base/m", format = "mixed").get
    assert(got.count() == 12)
  }

  test("getDfFromKeys: no matches -> None (reference tests/test_s3.py:301-303)") {
    assert(S3Like.getDfFromKeys(spark, tmp() + "/empty").isEmpty)
  }

  test("getDfFromKeys: ragged schemas union by name with nulls") {
    val base = tmp()
    S3Like.putDf(fixture, s"$base/r/f1.parquet", format = "parquet", exactNaming = true)
    S3Like.putDf(fixture.withColumnRenamed("col_2", "col_3"), s"$base/r/f2.parquet", format = "parquet", exactNaming = true)
    val got = S3Like.getDfFromKeys(spark, s"$base/r").get
    assert(got.columns.toSet == Set("col_1", "col_2", "col_3"))
    assert(got.count() == 8)
    assert(got.filter(got("col_3").isNull).count() == 4)
  }

  test("schema evolution: getDf(mergeSchema) unifies drifted parquet under one prefix") {
    // a lake directory accretes files over months; late files gain columns.
    // A plain read takes one footer's schema (whichever file wins) and can
    // silently DROP the new column — the mergeSchema option is the engine's
    // contract for reading drifted data: union of all file schemas, nulls
    // where a file predates a column
    val dir = tmp() + "/evolved"
    fixture.write.parquet(dir)
    fixture.withColumn("col_new", org.apache.spark.sql.functions.col("col_1") * 10)
      .write.mode("append").parquet(dir)
    val merged = S3Like.getDf(spark, dir, "parquet", Map("mergeSchema" -> "true"))
    assert(merged.columns.toSet == Set("col_1", "col_2", "col_new"))
    assert(merged.count() == 8)
    assert(merged.filter(merged("col_new").isNull).count() == 4)
    assert(merged.filter(merged("col_new") === merged("col_1") * 10).count() == 4)
  }
}
