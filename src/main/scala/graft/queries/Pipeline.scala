package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.TextOps
import graft.operators.MinHashLSH

/** Capstone: the composed training-data-prep pipeline — quality gate →
  * exact dedup → near-dup removal → embedding join → corpus stats — as ONE
  * oracle-checked query. This is the shape a 100 TB pre-training data job
  * actually runs; every stage is one of the already-verified operators, and
  * because each stage is deterministic the entire composition hash-matches
  * DuckDB end to end.
  *
  * Scale shape: narrow filters → fingerprint window (exchange on fp) →
  * df-capped MinHash-LSH near-dup (band-bucket equi join, candidates only —
  * the q28 path, NOT an unguarded postings self-join: a hot shingle like a
  * common trigram would make a raw `sh ⋈ sh ON s` carry df² pairs through
  * one reducer at 100 TB) → anti join on doc id → equi join to embeddings →
  * tiny aggregate. No stage is all-pairs, none materializes on the driver.
  */
object Pipeline {

  /** Shingles occurring in more than this many docs carry no near-dup signal
    * and are dropped before signatures/verification (MinHashLSH.dfCapped). */
  val DfCap = 100

  val queries: Seq[OracleQuery] = Seq(
    OracleQuery(
      "q39_training_pipeline",
      s"""WITH base AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
        |    md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\\s+'))), ' ')) AS fp
        |  FROM documents),
        |quality AS (SELECT * FROM base WHERE n_tokens >= 30),
        |kept1 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM quality) q WHERE rn = 1),
        |toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM kept1),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
        |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $DfCap),
        |sh AS (SELECT * FROM sh0 WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.s = sh0.s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |mh AS (
        |  SELECT doc_id, g.i AS i, min(md5(CAST(g.i AS VARCHAR) || ':' || s)) AS h
        |  FROM sh, unnest(generate_series(0, 11)) AS g(i)
        |  GROUP BY doc_id, g.i),
        |bands AS (
        |  SELECT doc_id,
        |    md5(CAST(i // 3 AS VARCHAR) || '|' || string_agg(h, ',' ORDER BY i)) AS bkey
        |  FROM mh GROUP BY doc_id, i // 3),
        |cb AS (
        |  SELECT doc_id, bkey FROM (
        |    SELECT doc_id, bkey, count(*) OVER (PARTITION BY bkey) AS bsz FROM bands) t
        |  WHERE bsz <= ${graft.operators.MinHashLSH.BandBucketCap}),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM cb a JOIN cb b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT c.d1, c.d2, count(*) AS inter
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.d1
        |  JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
        |  GROUP BY c.d1, c.d2),
        |neardup AS (
        |  SELECT DISTINCT d2 AS dup_id
        |  FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
        |kept2 AS (
        |  SELECT k.* FROM kept1 k
        |  WHERE NOT EXISTS (SELECT 1 FROM neardup d WHERE d.dup_id = k.doc_id)),
        |joined AS (
        |  SELECT k.doc_id, k.lang, k.n_tokens, k.n_chars, e.label
        |  FROM kept2 k JOIN embeddings e ON e.vec_id = k.doc_id)
        |SELECT lang, label, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM joined GROUP BY lang, label
        |ORDER BY lang, label""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val toks = TextOps.tokens(col("text"))
      // round-robin repartition, deliberately (r20 probe): hash-by-doc_id
      // removes the sortBeforeRepartition pass but clumps the few thousand
      // CPU-heavy rows (Poisson) and measured SLOWER — perfect spread wins
      // when per-row regex work dominates; the input is a deterministic
      // parquet scan, so round-robin stays retry-safe (guide §2.5)
      val base = Tables(spark, dir, "documents").repartition(parts)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.contentFingerprint(toks).as("fp"))
      val quality = base.filter(col("n_tokens") >= 30)
      val kept1 = quality
        .withColumn("rn", row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // postings persisted BEFORE the df-cap: dfCapped references them twice
      // (hot-shingle counts + the anti-join left side), and unpersisted that
      // re-ran the whole posexplode + per-doc window pass — the single most
      // expensive stage of the pipeline — a second time (r20, guide §1/§2.4)
      val post = TextOps.shinglePostings(kept1.select("doc_id", "text"), "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = MinHashLSH.dfCapped(post, DfCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // signatures and Jaccard denominators from ONE hash-grouped pass over
      // the postings (two separate groupBys before — r20, guide §2.4), and
      // band-bucket candidates from the shared signature relation
      val mhn = MinHashLSH.signaturesWithSizes(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Jaccard denominators ride the band keys (4 rows per doc) into the
      // candidate pair — the two sizes joins the ≥0.5 gate used to pay are
      // gone (r20; n is functionally dependent on doc_id, so the extra
      // grouping keys change no group)
      val bk = MinHashLSH.cappedBandKeys(MinHashLSH.bandKeys(mhn, keep = Seq("n")))
      val cand = bk.as("a")
        .join(bk.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .distinct()
      val pairs = cand
        .join(sh.as("a"), col("a.doc_id") === col("d1"))
        .join(sh.as("b"), col("b.doc_id") === col("d2") && col("b.s") === col("a.s"))
        .groupBy("d1", "d2", "na", "nb").agg(count(lit(1)).as("inter"))
      val dupIds = pairs
        .filter(col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")) >= 0.5)
        .select(col("d2").as("dup_id")).distinct()
      val kept2 = kept1.join(dupIds, col("dup_id") === col("doc_id"), "left_anti")
      val joined = kept2.join(Tables(spark, dir, "embeddings"),
        col("vec_id") === col("doc_id"))
      joined.groupBy("lang", "label")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          sum("n_chars").as("total_chars"))
        .orderBy("lang", "label")
    },
  )
}
