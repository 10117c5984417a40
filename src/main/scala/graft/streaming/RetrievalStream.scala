package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType
import graft.functions.TextOps
import graft.queries.Retrieval

/** Standing BM25 retrieval index — the streaming form of q76. A batch
  * retrieval re-tokenizes the ENTIRE corpus per query set; here each
  * arriving document is tokenized exactly once, and a query reads only its
  * terms' postings.
  *
  * Per trigger, three idempotent `batch=<id>` directories:
  *  - `postings/` (term, doc_id, tf) — the inverted index, SORTED BY TERM
  *    within each file so a term-probe's predicate skips row groups by
  *    footer min/max (the layout the probe pays for);
  *  - `doclen/` (doc_id, dl) — the per-doc normalizer;
  *  - `stats/` one (n, sum_dl) row — the corpus scalars, ADDITIVE across
  *    batches, so query-time stats are an aggregate over one tiny row per
  *    trigger, never a corpus scan.
  *
  * [[search]] probes: postings filtered to the query terms (hits-sized),
  * df derived from the probe itself, document lengths SEMI-JOINED to the
  * hit docs before the score join (the corpus-sized doclen relation is
  * filtered, not shuffled whole), stats folded from the per-batch rows —
  * then the EXACT q76 scoring tree ([[Retrieval.bm25TopK]], shared code),
  * so the streamed index scores bit-identically to the batch query; the
  * spec pins that equality end to end. Replayed triggers overwrite their
  * own directories: at-least-once delivery, exactly-once index states.
  */
object RetrievalStream {

  def maintain(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) ingestBatch(batch, idCol, textCol, indexDir, batchId)
      }
      .start()

  /** One trigger's ingest: tokenize once, land postings/doclen/stats under
    * the batch's own directories. Public as the one-shot batch build. */
  def ingestBatch(
      batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, batchId: Long): Unit = {
    val toks = batch
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("t"))
      .localCheckpoint(true) // tokenize once: postings, doclen and stats all read it
    toks.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$indexDir/postings/batch=$batchId")
    val dl = toks.select(col("doc_id"), size(col("t")).cast(LongType).as("dl"))
    dl.write.mode("overwrite").parquet(s"$indexDir/doclen/batch=$batchId")
    dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats/batch=$batchId")
  }

  /** BM25 top-k for `terms` against the accumulated index — the q76
    * scoring tree over index-derived inputs. */
  def search(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String, terms: Seq[String], k: Int): DataFrame = {
    val tf = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms: _*))
      .select("doc_id", "term", "tf")
    // hit docs only: the doclen scan is pre-filtered by the (bounded) hit
    // set rather than shuffled whole into the score join
    val hitDocs = tf.select("doc_id").distinct()
    val dl = spark.read.parquet(s"$indexDir/doclen")
      .join(broadcast(hitDocs), Seq("doc_id"), "left_semi")
      .select("doc_id", "dl")
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n")).as("n"),
        (sum(col("sum_dl")).cast("double") / sum(col("n"))).as("avgdl"))
    Retrieval.bm25TopK(tf, dl, stats, k)
  }
}
