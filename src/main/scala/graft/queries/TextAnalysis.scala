package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.TextOps

/** Text-analysis operators over `documents` (LLM-pipeline extensions:
  * token counting, quality scoring, language-ID heuristic, fingerprinting).
  *
  * All metrics are integers or a SINGLE IEEE division of two exactly-equal
  * integers — bit-identical across engines with no decimal scaffolding.
  * Every operator is a per-row expression tree (codegen'd, no shuffle except
  * the final small aggregation), so cost is one streaming pass over the
  * corpus regardless of scale.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "un")
  private val stopFr = Seq("le", "les", "des", "et", "une", "est")

  /** q72 chunk geometry: 500-char windows advancing 400 chars (100 overlap). */
  val ChunkSize = 500
  val ChunkStep = 400

  val queries: Seq[OracleQuery] = Seq(
    // ---- q22: token counting rolled up per language ----
    OracleQuery(
      "q22_token_stats",
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
        |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS INTEGER) AS n_alnum
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(n_alnum) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS avg_token_len
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      docs(spark, dir)
        .select(col("lang"), col("n_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.alnumChars(col("text")).as("n_alnum"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          sum("n_chars").as("total_chars"),
          (sum("n_tokens").cast(DoubleType) / count(lit(1))).as("avg_tokens"),
          (sum("n_alnum").cast(DoubleType) / sum("n_tokens").cast(DoubleType)).as("avg_token_len"))
        .orderBy("lang")
    },

    // ---- q23: per-document quality scoring ----
    OracleQuery(
      "q23_doc_quality",
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
         |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS INTEGER) AS n_alnum,
         |    CAST(len(regexp_extract_all(lower(text), '${sqlStopRe(stopEn)}')) AS INTEGER) AS stop_hits,
         |    CAST(length(text) AS INTEGER) AS text_len
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |  CAST(n_alnum AS DOUBLE) / n_tokens AS avg_token_len,
         |  CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
         |  CAST(n_alnum AS DOUBLE) / text_len AS alnum_ratio
         |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      docs(spark, dir)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.alnumChars(col("text")).as("n_alnum"),
          TextOps.stopwordHits(col("text"), stopEn).as("stop_hits"),
          length(col("text")).as("text_len"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_alnum").cast(DoubleType) / col("n_tokens")).as("avg_token_len"),
          (col("stop_hits").cast(DoubleType) / col("n_tokens")).as("stopword_ratio"),
          (col("n_alnum").cast(DoubleType) / col("text_len")).as("alnum_ratio"))
        .orderBy("doc_id")
    },

    // ---- q24: n-gram/stopword language-ID heuristic ----
    OracleQuery(
      "q24_lang_id",
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(lower(text), '${sqlStopRe(stopEn)}')) AS INTEGER) AS en_hits,
         |    CAST(len(regexp_extract_all(lower(text), '${sqlStopRe(stopEs)}')) AS INTEGER) AS es_hits,
         |    CAST(len(regexp_extract_all(lower(text), '${sqlStopRe(stopFr)}')) AS INTEGER) AS fr_hits
         |  FROM documents)
         |SELECT doc_id, lang, en_hits, es_hits, fr_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang
         |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      docs(spark, dir)
        .select(col("doc_id"), col("lang"),
          TextOps.stopwordHits(col("text"), stopEn).as("en_hits"),
          TextOps.stopwordHits(col("text"), stopEs).as("es_hits"),
          TextOps.stopwordHits(col("text"), stopFr).as("fr_hits"))
        .withColumn("pred_lang",
          when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
            .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
            .when(col("fr_hits") > 0, "fr")
            .otherwise("und"))
        .orderBy("doc_id")
    },

    // ---- q25: document fingerprinting (content hash + min-shingle hash) ----
    OracleQuery(
      "q25_fingerprint",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
        |shf AS (SELECT doc_id, min(md5(s)) AS min_shingle_fp FROM sh GROUP BY doc_id)
        |SELECT toks.doc_id,
        |  md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS content_fp,
        |  shf.min_shingle_fp
        |FROM toks LEFT JOIN shf ON toks.doc_id = shf.doc_id
        |ORDER BY toks.doc_id""".stripMargin) { (spark, dir) =>
      val t = TextOps.tokens(col("text"))
      docs(spark, dir)
        .select(col("doc_id"),
          TextOps.contentFingerprint(t).as("content_fp"),
          TextOps.minShingleFingerprint(TextOps.shingles(t, 3)).as("min_shingle_fp"))
        .orderBy("doc_id")
    },

    // ---- q72: document chunking — fixed-size overlapping character
    //           windows, the standard pre-embedding splitter (a retrieval
    //           index embeds chunks, not whole documents, and the overlap
    //           keeps boundary-straddling context retrievable). Chunk k of
    //           a doc starts at k·(size − overlap); every doc yields at
    //           least one chunk (short docs = themselves). Pure integer
    //           arithmetic + substring + md5, so the result is hash-exact
    //           cross-engine; the plan is a narrow map + explode — codegen,
    //           zero shuffles, embarrassingly parallel at any corpus size. ----
    OracleQuery(
      "q72_chunking",
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |    unnest(range(((greatest(n - $ChunkSize, 0) + ${ChunkStep - 1}) // $ChunkStep) + 1)) AS k
         |  FROM t)
         |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
         |  CAST(k * $ChunkStep + 1 AS INTEGER) AS chunk_start,
         |  CAST(length(substring(text, k * $ChunkStep + 1, $ChunkSize)) AS INTEGER) AS chunk_len,
         |  md5(substring(text, k * $ChunkStep + 1, $ChunkSize)) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (spark, dir) =>
      val n = length(col("text"))
      // (max(n - size, 0) + step - 1) / step + 1, integer semantics: the
      // double division is exact for any corpus-plausible length and the
      // int cast truncates = floor on the non-negative operand
      val nChunks = ((greatest(n - lit(ChunkSize), lit(0)) + lit(ChunkStep - 1))
        / lit(ChunkStep)).cast(IntegerType) + lit(1)
      val start = col("k") * ChunkStep + 1
      docs(spark, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), nChunks - 1)).as("k"))
        .select(col("doc_id"), col("k").cast(IntegerType).as("chunk_id"),
          start.cast(IntegerType).as("chunk_start"),
          length(expr(s"substring(text, k * $ChunkStep + 1, $ChunkSize)")).cast(IntegerType).as("chunk_len"),
          md5(expr(s"substring(text, k * $ChunkStep + 1, $ChunkSize)")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    },

    // ---- q79: PII masking + deterministic pseudonymization — the scrub
    //           pass every identifier-bearing table gets before entering a
    //           training corpus. Two complementary transforms: MASK the
    //           digit runs for display (`Customer#*********`) and replace
    //           the raw identifier with a deterministic hash pseudonym —
    //           deterministic so the pseudonym PRESERVES JOINABILITY: the
    //           order counts here flow through the customer key and attach
    //           to the pseudonym, proving downstream relational structure
    //           survives the scrub. Both transforms are per-row codegen'd
    //           expressions (zero shuffle beyond the order-count agg); the
    //           regex is shared Java/RE2 syntax so masking is bit-exact
    //           cross-engine. ----
    OracleQuery(
      "q79_pii_pseudonymize",
      """WITH pseudo AS (
        |  SELECT c_custkey, md5(c_name) AS pseudo_id,
        |    regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
        |    CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INTEGER) AS n_digits,
        |    c_mktsegment
        |  FROM customer),
        |oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |       FROM orders GROUP BY o_custkey)
        |SELECT p.pseudo_id, p.masked_name, p.n_digits, p.c_mktsegment,
        |  COALESCE(oc.n_orders, 0) AS n_orders
        |FROM pseudo p LEFT JOIN oc ON oc.o_custkey = p.c_custkey
        |ORDER BY p.pseudo_id""".stripMargin) { (spark, dir) =>
      val pseudo = Tables(spark, dir, "customer")
        .select(col("c_custkey"),
          md5(col("c_name")).as("pseudo_id"),
          regexp_replace(col("c_name"), "[0-9]", "*").as("masked_name"),
          length(regexp_replace(col("c_name"), "[^0-9]", "")).cast(IntegerType).as("n_digits"),
          col("c_mktsegment"))
      val oc = Tables(spark, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      pseudo.join(oc, col("o_custkey") === col("c_custkey"), "left")
        .select(col("pseudo_id"), col("masked_name"), col("n_digits"),
          col("c_mktsegment"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("pseudo_id")
    },

    // ---- q112: BPE TOKENIZER TRAINING — learn a real merge table ON the
    //            corpus (Sennrich-style: word-frequency pair counting,
    //            greedy left-to-right application, count-then-lexicographic
    //            tie-break). The corpus is scanned ONCE (word counting);
    //            every round after is vocabulary-sized — the Zipf bound is
    //            what makes tokenizer training a 100 TB operator. The
    //            oracle is the SAME algorithm unrolled round by round in
    //            SQL: symbols live in one sentinel-wrapped string, merge
    //            application is plain non-regex replace (left-to-right
    //            non-overlap semantics are identical in every engine), so
    //            the learned merges, their ranks, AND their weighted
    //            counts hash-match exactly — ties, overlaps and all. ----
    OracleQuery("q112_bpe_merges", bpeOracleSql(BpeRounds)) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Bpe.learn(docs(spark, dir), "text", BpeRounds)
        .map(m => (m.rank, m.left, m.right, m.n)).toDF()
        .toDF("merge_rank", "merge_left", "merge_right", "n")
        .orderBy("merge_rank")
    },

    // ---- q113: TOKEN ACCOUNTING THROUGH THE LEARNED TOKENIZER — the
    //            upgrade of the regex token proxy (q22): encode the whole
    //            corpus with q112's corpus-fitted merge table (row-local
    //            replace chain, no shuffle, no UDF) and account tokens per
    //            source — the number that prices a training run and drives
    //            mixture weights. The oracle re-learns AND re-encodes in
    //            SQL, so the end-to-end train→encode→account pipeline is
    //            hash-gated, approximation-free. ----
    OracleQuery("q113_bpe_token_budget", bpeEncodeSql(BpeRounds)) { (spark, dir) =>
      val d = docs(spark, dir)
      val merges = graft.operators.Bpe.learn(d, "text", BpeRounds)
      graft.operators.Bpe.encode(d, "text", merges)
        .groupBy("source")
        .agg(sum(col("n_tokens")).cast(LongType).as("total_tokens"),
          count(lit(1)).as("n_docs"),
          (sum(col("n_tokens")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("avg_tokens"))
        .orderBy("source")
    },
  )

  // final + literal = compile-time constant (safe to reference from the
  // `queries` initializer above regardless of declaration order)
  private final val BpeRounds = 12

  /** The shared BPE-learning CTE chain, machine-unrolled: v0 = char-wrapped
    * word vocab; round r counts adjacent wrapped pairs from v(r-1), takes
    * the (count DESC, pair ASC) argmax (b_r), and applies it with plain
    * `replace`. Sentinels are chr(1)/chr(2) — exactly
    * graft.operators.Bpe.{L,R}. */
  private def bpeLearnCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT chr(1) || t[i] || chr(2) || chr(1) || t[i+1] || chr(2) AS pair,
         |    CAST(sum(freq) AS BIGINT) AS c
         |  FROM (SELECT freq,
         |          string_split(trim(seq, chr(1) || chr(2)), chr(2) || chr(1)) AS t
         |        FROM v${r - 1}),
         |       unnest(generate_series(1, len(t) - 1)) AS g(i)
         |  GROUP BY 1),
         |b$r AS MATERIALIZED (SELECT pair, c FROM p$r ORDER BY c DESC, pair LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT word, freq,
         |    replace(seq, b.pair, replace(b.pair, chr(2) || chr(1), '')) AS seq
         |  FROM v${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split_regex(
       |      regexp_replace(lower(text), '[' || chr(1) || '-' || chr(3) || ']', '', 'g'),
       |      '\\s+')) AS word
       |    FROM documents) u
       |  WHERE word <> '' GROUP BY word),
       |v0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seq
       |  FROM w),
       |$rounds""".stripMargin
  }

  private def bpeOracleSql(k: Int): String = {
    val union = (1 to k)
      .map(r => s"SELECT $r AS merge_rank, pair, c FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""${bpeLearnCtes(k)}
       |SELECT merge_rank,
       |  string_split(trim(pair, chr(1) || chr(2)), chr(2) || chr(1))[1] AS merge_left,
       |  string_split(trim(pair, chr(1) || chr(2)), chr(2) || chr(1))[2] AS merge_right,
       |  c AS n
       |FROM ($union)
       |ORDER BY merge_rank""".stripMargin
  }

  /** The encode oracle: wrap every document, apply the k learned merges in
    * rank order, then count tokens as occurrences of the chr(1)
    * symbol-opener — one token per wrapped symbol. The merge pairs are
    * HOISTED into a one-row relation cross-joined onto the corpus (plain
    * column refs in the replace chain — a per-row scalar subquery makes
    * the engine re-evaluate the lookup 60k × k times), and the applied
    * chain materializes once in its own CTE so the length diff doesn't
    * evaluate it twice. */
  private def bpeEncodeSql(k: Int): String = {
    val pairCols = (1 to k).map(r => s"(SELECT pair FROM b$r) AS q$r").mkString(",\n    ")
    val applied = (1 to k).foldLeft("seq0") { (acc, r) =>
      s"replace($acc, m.q$r, replace(m.q$r, chr(2) || chr(1), ''))"
    }
    s"""${bpeLearnCtes(k)},
       |m AS MATERIALIZED (SELECT
       |    $pairCols),
       |enc0 AS MATERIALIZED (
       |  SELECT source,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(lower(text), '[' || chr(1) || '-' || chr(3) || ']', '', 'g'),
       |        '\\s+', chr(3), 'g'),
       |      '([^' || chr(3) || '])', chr(1) || '\\1' || chr(2), 'g') AS seq0
       |  FROM documents),
       |encA AS MATERIALIZED (SELECT source, $applied AS seqk FROM enc0, m),
       |enc AS (
       |  SELECT source,
       |    CAST(length(seqk) - length(replace(seqk, chr(1), '')) AS BIGINT)
       |      AS n_tokens
       |  FROM encA)
       |SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** \b-anchored alternation usable by both Java regex and RE2. */
  private def sqlStopRe(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")
}
