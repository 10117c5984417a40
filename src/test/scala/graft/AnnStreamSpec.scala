package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.AnnStream

/** Streaming IVF index maintenance: a trigger-built index answers searches
  * identically to a one-shot batch build, replays are idempotent, and the
  * probe scan is partition-pruned to the probed cells.
  */
class AnnStreamSpec extends SparkSpec {

  private def emb: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")

  private val centroids = AnnStream.seedCentroids(emb, "vec_id", "embedding", stride = 100)

  private def queries: DataFrame = emb.filter(col("vec_id") % 50 === 0)

  private def tmp(): String =
    "file:" + Files.createTempDirectory("annidx").toString

  private def results(indexDir: String, nprobe: Int): Seq[(Long, Long, Int, Double)] =
    AnnStream.search(queries, "vec_id", "embedding", centroids, indexDir,
      k = 5, nprobe = nprobe)
      .orderBy("query_id", "rank")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

  test("trigger-built index ≡ one-shot batch index, for nprobe 1 and 2") {
    val batchIdx = tmp()
    AnnStream.ingestBatch(emb, "vec_id", "embedding", centroids, batchIdx, 0L)

    // same corpus in three trigger-sized slices
    val streamIdx = tmp()
    val slices = Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2))
    slices.zipWithIndex.foreach { case (s, i) =>
      AnnStream.ingestBatch(s, "vec_id", "embedding", centroids, streamIdx, i.toLong)
    }

    val one = results(batchIdx, 1)
    assert(one.nonEmpty)
    assert(results(streamIdx, 1) === one)
    val two = results(streamIdx, 2)
    assert(results(batchIdx, 2) === two)
    // nprobe=2's candidate set contains nprobe=1's: recall can only improve,
    // so every returned cosine at a given rank is >= the nprobe=1 one
    val c1 = one.map(r => (r._1, r._3) -> r._4).toMap
    two.foreach { case (q, _, rk, cs) =>
      c1.get((q, rk)).foreach(c => assert(cs >= c - 1e-12)) }
  }

  test("a replayed trigger leaves the index and its answers unchanged") {
    val idx = tmp()
    val b0 = emb.filter(col("vec_id") < 250)
    val b1 = emb.filter(col("vec_id") >= 250)
    AnnStream.ingestBatch(b0, "vec_id", "embedding", centroids, idx, 0L)
    AnnStream.ingestBatch(b1, "vec_id", "embedding", centroids, idx, 1L)
    val before = results(idx, 1)
    AnnStream.ingestBatch(b1, "vec_id", "embedding", centroids, idx, 1L) // replay
    assert(results(idx, 1) === before)
  }

  test("the probe scan is partition-pruned to the probed cells") {
    val idx = tmp()
    AnnStream.ingestBatch(emb, "vec_id", "embedding", centroids, idx, 0L)
    val one = AnnStream.search(
      emb.filter(col("vec_id") === 100), "vec_id", "embedding",
      centroids, idx, k = 5, nprobe = 1)
    val plan = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell#"),
      s"probe scan not pruned on cell:\n$plan")
    assert(one.count() === 5)
  }

  test("maintain(): the streaming entry point builds the same index") {
    import java.io.File
    val srcDir = Files.createTempDirectory("annsrc").toFile
    // two source files → two triggers (maxFilesPerTrigger=1)
    Seq(emb.filter(col("vec_id") < 250), emb.filter(col("vec_id") >= 250))
      .zipWithIndex.foreach { case (df, i) =>
        val tmpd = Files.createTempDirectory("annpart").toFile
        df.coalesce(1).write.mode("overwrite").parquet("file:" + tmpd)
        val part = tmpd.listFiles().find(_.getName.endsWith(".parquet")).get
        val target = new File(srcDir, s"b$i.parquet")
        Files.move(part.toPath, target.toPath)
        assert(target.setLastModified(1700000000000L + i * 60000L))
      }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + srcDir)
    val idx = tmp()
    val q = AnnStream.maintain(stream, "vec_id", "embedding", centroids, idx,
      "file:" + Files.createTempDirectory("annchk"))
    try q.processAllAvailable() finally q.stop()

    val batchIdx = tmp()
    AnnStream.ingestBatch(emb, "vec_id", "embedding", centroids, batchIdx, 0L)
    assert(results(idx, 1) === results(batchIdx, 1))
  }
}
