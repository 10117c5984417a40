package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.engine.{Compact, S3Like}

/** Small-files compaction: needy partitions collapse to their
  * byte-proportional file count, healthy partitions are untouched (files,
  * mod times), and the data survives bit-identically.
  */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = "file:" + Files.createTempDirectory("compact").toString

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir.stripPrefix("file:")).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("compaction collapses a fragmented partition and leaves healthy ones alone") {
    val base = tmp() + "/lake"
    // lang=aa fragmented into ~8 files; lang=bb written compactly
    val frag = (1 to 400).map(i => (i.toLong, "aa", s"text $i")).toDF("id", "lang", "text")
      .repartition(8)
    frag.write.partitionBy("lang").parquet(base)
    val healthy = (1 to 400).map(i => (i.toLong + 1000, "bb", s"text $i")).toDF("id", "lang", "text")
      .coalesce(1)
    healthy.write.mode("append").partitionBy("lang").parquet(base)

    val aaBefore = partFiles(s"$base/lang=aa")
    val bbBefore = partFiles(s"$base/lang=bb").map(f => (f.getName, f.lastModified))
    assert(aaBefore.size == 8 && bbBefore.size == 1)
    val before = spark.read.parquet(base).as[(Long, String, String)].collect().toSet

    val stats = Compact.compact(spark, base)
    assert(stats.partitions == 1, "only lang=aa needed compaction")
    assert(stats.filesBefore == 8 && stats.filesAfter == 1,
      s"expected 8 -> 1 files, got ${stats.filesBefore} -> ${stats.filesAfter}")
    // healthy partition byte-untouched (same files, same mod times)
    assert(partFiles(s"$base/lang=bb").map(f => (f.getName, f.lastModified)) == bbBefore)
    // data identical, and the read-back sees the compacted layout
    assert(spark.read.parquet(base).as[(Long, String, String)].collect().toSet == before)
    // second run is a no-op
    assert(Compact.compact(spark, base) == Compact.Stats(0, 0, 0))
  }

  test("byte-proportional targets split an oversized partition into several files") {
    val base = tmp() + "/lake2"
    (1 to 2000).map(i => (i.toLong, "aa", "x" * 100)).toDF("id", "lang", "text")
      .repartition(16)
      .write.partitionBy("lang").parquet(base)
    val bytes = partFiles(s"$base/lang=aa").map(_.length).sum
    // target a third of the data per file → desired = 3
    val stats = Compact.compact(spark, base, targetFileBytes = bytes / 3 + 1)
    assert(stats.partitions == 1 && stats.filesBefore == 16)
    assert(stats.filesAfter >= 2 && stats.filesAfter <= 3,
      s"expected 2-3 salted output files, got ${stats.filesAfter}")
    assert(spark.read.parquet(base).count() == 2000)
  }

  test("guards: unpartitioned trees and streaming-manifest trees are rejected") {
    val flat = tmp() + "/flat"
    Seq((1L, "a")).toDF("id", "v").write.parquet(flat)
    intercept[IllegalArgumentException](Compact.compact(spark, flat))

    val manifested = tmp() + "/stream"
    Seq((1L, "aa", "t")).toDF("id", "lang", "text")
      .write.partitionBy("lang").parquet(manifested)
    new java.io.File(manifested.stripPrefix("file:"), "_spark_metadata").mkdirs()
    val e = intercept[IllegalArgumentException](Compact.compact(spark, manifested))
    assert(e.getMessage.contains("_spark_metadata"))
  }
}
