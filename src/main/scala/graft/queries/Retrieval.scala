package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.TextOps

/** Keyword retrieval over `documents` (LLM-pipeline extension): BM25
  * scoring of a fixed query-term set and global top-k — the lexical half
  * of a retrieval index (the embedding half is queries.Similarity), and
  * the standard relevance gate when mining a 100 TB corpus for
  * domain-targeted training data.
  *
  * Determinism contract: the classic BM25 idf is `ln((N-df+0.5)/(df+0.5))`;
  * `ln` is only 1-ulp-accurate and not identically rounded across libm
  * implementations, so this operator uses the log-free rational idf
  * `(N-df+0.5)/(df+0.5)` — a strictly monotone transform of the same
  * statistic (rankings for single-term queries are identical; multi-term
  * mixes weigh rare terms more steeply). Every remaining operation is an
  * IEEE-correctly-rounded +,-,*,/ over the same expression tree in both
  * engines, per-term scores are quantized to DECIMAL(18,9), and the
  * document score is the ORDER-FREE exact decimal sum of its term scores
  * — so ranking and output are bit-exact cross-engine with no float-sum
  * nondeterminism (same trick as Det.dsum / Similarity's ed postings).
  *
  * Scale shape: one token-explode pass filtered to the query terms (tf
  * relation ∝ hits, not corpus), doc lengths as a narrow projection, df
  * and corpus stats as tiny aggregates broadcast back, and the final
  * global top-k is TakeOrderedAndProject — no corpus-sized shuffle
  * anywhere, so the plan is scan-bound at 100 TB.
  */
object Retrieval {

  /** Fixed query-term set (a user parameter in library use). */
  val QueryTerms: Seq[String] = Seq("spark", "vector", "stream")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** The BM25 scoring tree over its three input relations — shared by the
    * batch query (q76) and the standing-index form
    * ([[graft.streaming.RetrievalStream]]), so both score identically BY
    * CONSTRUCTION and the streamed index is checked purely on whether it
    * reproduces the same (tf, dl, stats) inputs.
    *
    * @param tf    (doc_id, term, tf) — already filtered to the query terms
    * @param dl    (doc_id, dl) document lengths (hit docs must be present;
    *              extra docs are fine — only joined rows score)
    * @param stats one row (n, avgdl) of corpus scalars
    */
  def bm25TopK(tf: DataFrame, dl: DataFrame, stats: DataFrame, topK: Int = TopK): DataFrame = {
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // mirror the oracle's expression tree exactly: every op is an IEEE
    // correctly-rounded double op, so bit-exactness needs identical shape
    val idf = (col("n").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val tfw = (col("tf").cast(DoubleType) * lit(K1 + 1.0)) /
      (col("tf").cast(DoubleType) +
        lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast(DoubleType) / col("avgdl"))))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * tfw).cast(DecimalType(18, 9)).as("s"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).cast(IntegerType).as("n_terms"), sum(col("s")).as("sd"))
      .orderBy(col("sd").desc, col("doc_id"))
      .limit(topK)
      // rank over the k surviving rows only (single-partition window on
      // a limit-k relation — constant work regardless of corpus size)
      .select(col("doc_id"), col("n_terms"),
        round(col("sd").cast(DoubleType), 9).as("score"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sd").desc, col("doc_id"))).cast(IntegerType).as("rank"))
      .orderBy("rank")
  }

  val queries: Seq[OracleQuery] = Seq(
    // ---- q76: BM25 top-k — tf from a term-filtered token explode, df and
    //           avgdl as broadcast scalars, exact-decimal score sum,
    //           global top-10. ----
    OracleQuery(
      "q76_bm25_topk",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |                 CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |q(term) AS (VALUES ${QueryTerms.map(t => s"('$t')").mkString(", ")}),
         |tf AS (
         |  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) x
         |  JOIN q ON q.term = x.w
         |  GROUP BY doc_id, w),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    CAST(((CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
         |      * ((CAST(tf.tf AS DOUBLE) * ${K1 + 1.0}) /
         |         (CAST(tf.tf AS DOUBLE) + $K1 * (${1.0 - B} + $B * (CAST(dl.dl AS DOUBLE) / stats.avgdl))))
         |      AS DECIMAL(18,9)) AS s
         |  FROM tf JOIN df ON df.term = tf.term JOIN dl ON dl.doc_id = tf.doc_id, stats),
         |agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms, SUM(s) AS sd
         |        FROM scored GROUP BY doc_id)
         |SELECT doc_id, n_terms, round(CAST(sd AS DOUBLE), 9) AS score,
         |  CAST(row_number() OVER (ORDER BY sd DESC, doc_id) AS INTEGER) AS rank
         |FROM agg ORDER BY sd DESC, doc_id LIMIT $TopK""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val toks = docs(spark, dir).repartition(parts)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val dl = toks.select(col("doc_id"), size(col("t")).cast(LongType).as("dl"))
      // corpus scalars: one tiny agg row, broadcast into every score
      val stats = dl.agg(
        count(lit(1)).as("n"),
        (sum(col("dl")).cast(DoubleType) / count(col("dl"))).as("avgdl"))
      val tf = toks
        .select(col("doc_id"), explode(col("t")).as("term"))
        .filter(col("term").isin(QueryTerms: _*)) // pushed below the explode's input scan
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
      bm25TopK(tf, dl, stats)
    },
  )
}
