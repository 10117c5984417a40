package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Retrieval
import graft.streaming.RetrievalStream

/** Standing BM25 index: a trigger-built index answers the fixed query-term
  * search bit-identically to the batch q76 computation over the same
  * corpus, and replayed triggers leave the index unchanged.
  */
class RetrievalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  private def tmp(): String =
    "file:" + Files.createTempDirectory("bm25idx").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms", "score", "rank")
      .as[(Long, Int, Double, Int)].collect().toSeq

  test("trigger-built index search ≡ the batch q76 result, bit for bit") {
    val idx = tmp()
    Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
      .zipWithIndex.foreach { case (slice, i) =>
        RetrievalStream.ingestBatch(slice, "doc_id", "text", idx, i.toLong)
      }
    val streamed = rows(RetrievalStream.search(
      spark, idx, Retrieval.QueryTerms, 10))
    val batch = rows(SparkEntry.queries("q76_bm25_topk")(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "index-derived (tf, dl, stats) diverged from the batch computation")
  }

  test("a replayed trigger leaves the index and its answers unchanged") {
    val idx = tmp()
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    RetrievalStream.ingestBatch(b0, "doc_id", "text", idx, 0L)
    RetrievalStream.ingestBatch(b1, "doc_id", "text", idx, 1L)
    val before = rows(RetrievalStream.search(spark, idx, Retrieval.QueryTerms, 10))
    RetrievalStream.ingestBatch(b1, "doc_id", "text", idx, 1L) // replay
    assert(rows(RetrievalStream.search(spark, idx, Retrieval.QueryTerms, 10)) === before)
  }

  test("maintain(): the streaming entry point builds the same index") {
    import java.io.File
    val srcDir = Files.createTempDirectory("bm25src").toFile
    Seq(docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
      .zipWithIndex.foreach { case (df, i) =>
        val tmpd = Files.createTempDirectory("bm25part").toFile
        df.coalesce(1).write.mode("overwrite").parquet("file:" + tmpd)
        val part = tmpd.listFiles().find(_.getName.endsWith(".parquet")).get
        val target = new File(srcDir, s"b$i.parquet")
        Files.move(part.toPath, target.toPath)
        assert(target.setLastModified(1700000000000L + i * 60000L))
      }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet("file:" + srcDir)
    val idx = tmp()
    val q = RetrievalStream.maintain(stream, "doc_id", "text", idx,
      "file:" + Files.createTempDirectory("bm25chk"))
    try q.processAllAvailable() finally q.stop()
    assert(rows(RetrievalStream.search(spark, idx, Retrieval.QueryTerms, 10)) ===
      rows(SparkEntry.queries("q76_bm25_topk")(spark, sf)))
  }
}
