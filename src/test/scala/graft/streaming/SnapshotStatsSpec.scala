package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.engine.Snapshots

/** Pins the round-11 statistics contract of the DSv2 snapshot scan
  * (SnapshotSource.scala): a BATCH scan reports the manifest's exact
  * DV-adjusted row count (so the optimizer can broadcast a filtered
  * dimension without sampling), while a scan claimed for STREAMING — whose
  * input is a commit diff, not the head snapshot — and a scan over a
  * not-yet-committed table both report UNKNOWN instead of a wrong or
  * planning-time-throwing estimate. Also pins the Spark-ordering
  * assumption the streaming flag rides on: `toMicroBatchStream` precedes
  * any `estimateStatistics` call on the same scan.
  */
class SnapshotStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("snapstats").toString + "/t"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def scanOf(root: String): SnapshotScan =
    new SnapshotScan(schema, schema, root, "earliest", false, None)

  test("a batch scan reports the exact DV-adjusted manifest row count") {
    val root = tmp()
    Snapshots.commit(
      spark.range(1, 101).select($"id", ($"id" * 10L).as("v"))
        .repartitionByRange(2, $"id"),
      root, statsCols = Seq("id"))
    Snapshots.deleteWhere(spark, root, $"id" <= 10L, mergeOnRead = true)
    val st = scanOf(root).estimateStatistics()
    assert(st.numRows.isPresent && st.numRows.getAsLong === 90L)
    assert(st.sizeInBytes.isPresent && st.sizeInBytes.getAsLong > 0L)
  }

  test("a scan claimed for streaming reports unknown statistics") {
    val root = tmp()
    Snapshots.commit(Seq((1L, 1L)).toDF("id", "v"), root)
    val scan = scanOf(root)
    // MicroBatchExecution claims the scan for streaming BEFORE any stats
    // call — the flag rides on that ordering (see SnapshotScan comment)
    scan.toMicroBatchStream(Files.createTempDirectory("ckpt").toString)
    val st = scan.estimateStatistics()
    assert(!st.numRows.isPresent,
      "head-snapshot rows must not be attributed to a commit-diff input")
    assert(!st.sizeInBytes.isPresent)
  }

  test("a scan over a not-yet-committed table reports unknown, not a throw") {
    val root = tmp() // no commit ever lands here
    val st = scanOf(root).estimateStatistics()
    assert(!st.numRows.isPresent && !st.sizeInBytes.isPresent)
  }
}
