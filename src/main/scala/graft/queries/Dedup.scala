package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.TextOps
import graft.operators.Components

/** Deduplication operators over `documents` (LLM-pipeline extensions):
  * exact (canonical-fingerprint) dedup, exact n-gram Jaccard via an inverted
  * shingle index, MinHash+LSH near-dup with candidate verification, and
  * SimHash signatures.
  *
  * Scale design: none of these ever compares all document pairs. Jaccard
  * pairs come from a df-capped postings self-join keyed on shingle (cost ∝
  * Σ df² per shingle with df ≤ DfCap, so per-key work is bounded by a
  * constant, not corpus²); LSH pairs come from band-key buckets (cost ∝
  * bucket sizes). Both are groupBy/join plans Catalyst shuffles on content
  * keys — embarrassingly parallel at 100 TB.
  * MinHash/SimHash use md5 of explicit strings so the DuckDB oracle (and any
  * other engine) reproduces signatures bit-for-bit — LSH is probabilistic in
  * recall but fully deterministic given the hash family, so even its misses
  * are identical across engines and the whole pipeline stays oracle-checked.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Shared oracle prelude: tokens and distinct 3-gram shingles. */
  private val shinglesSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Distinct 3-gram shingle postings (doc_id, s) — codegen'd posexplode +
    * lead pipeline (TextOps.shinglePostings), persisted because every dedup
    * query feeds it to 2–4 downstream subplans. The local corpus is one
    * parquet file → one input split, so spread rows across the session's
    * shuffle parallelism first (on a real cluster the scan already has that
    * many splits and this exchange is ~free vs. the expression work).
    * Spread BY doc_id, not round-robin: the shingle window partitions on
    * doc_id, so hash distribution here satisfies it and the window's own
    * exchange of the full token stream disappears (r19; ids are dense, so
    * the hash spread is as even as round-robin). */
  private def rawPostings(spark: SparkSession, dir: String): DataFrame =
    TextOps.shinglePostings(
      docs(spark, dir).repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id")),
      "doc_id", "text", 3)

  private def postings(spark: SparkSession, dir: String): DataFrame =
    rawPostings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  val queries: Seq[OracleQuery] = Seq(
    // ---- q26: exact dedup on the canonical content fingerprint,
    //           deterministic keep-first-by-id ----
    OracleQuery(
      "q26_exact_dedup",
      """WITH f AS (
        |  SELECT doc_id, lang, source,
        |    md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\s+'))), ' ')) AS content_fp
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source, content_fp,
        |    CAST(row_number() OVER (PARTITION BY content_fp ORDER BY doc_id) AS INTEGER) AS rn,
        |    count(*) OVER (PARTITION BY content_fp) AS group_size
        |  FROM f)
        |SELECT doc_id, lang, source, content_fp, group_size
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val byFp = Window.partitionBy("content_fp")
      docs(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          TextOps.contentFingerprint(TextOps.tokens(col("text"))).as("content_fp"))
        .withColumn("rn", row_number().over(byFp.orderBy("doc_id")))
        .withColumn("group_size", count(lit(1)).over(byFp))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "content_fp", "group_size")
        .orderBy("doc_id")
    },

    // ---- q90: KEEP-BEST exact dedup — q26's clustering with the survivor
    //           rule a production corpus actually wants: within each
    //           duplicate cluster keep the HIGHEST-QUALITY copy, not the
    //           lowest-id one (crawl dups differ in boilerplate/truncation;
    //           keep-first throws away the clean copy whenever it arrived
    //           later). Quality here is the exact integer alnum-char count
    //           (more real content wins; doc_id breaks ties), so the
    //           argmax is bit-deterministic cross-engine — same window
    //           shape and cost as q26, only the ORDER BY changes. ----
    OracleQuery(
      "q90_keep_best_dedup",
      """WITH f AS (
        |  SELECT doc_id, lang, source,
        |    md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\s+'))), ' ')) AS content_fp,
        |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS quality
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source, content_fp, quality,
        |    CAST(row_number() OVER (PARTITION BY content_fp ORDER BY quality DESC, doc_id) AS INTEGER) AS rn,
        |    count(*) OVER (PARTITION BY content_fp) AS group_size
        |  FROM f)
        |SELECT doc_id, lang, source, content_fp, quality, group_size
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val byFp = Window.partitionBy("content_fp")
      docs(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          TextOps.contentFingerprint(TextOps.tokens(col("text"))).as("content_fp"),
          TextOps.alnumChars(col("text")).cast("long").as("quality"))
        .withColumn("rn",
          row_number().over(byFp.orderBy(col("quality").desc, col("doc_id"))))
        .withColumn("group_size", count(lit(1)).over(byFp))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "content_fp", "quality", "group_size")
        .orderBy("doc_id")
    },

    // ---- q27: exact n-gram Jaccard near-dup pairs via inverted index.
    //           Postings are df-capped (MinHashLSH.dfCapped) before the
    //           self-join: a corpus-common trigram would otherwise put df²
    //           pairs through one shuffle key — the capped join's per-key
    //           work is ≤ DfCap², a constant, and the dropped shingles are
    //           exactly the ones carrying no near-dup signal. Jaccard is
    //           "exact within the capped shingle set" (sizes from the same
    //           capped postings), matching the q39 capstone's semantics. ----
    OracleQuery(
      "q27_jaccard_pairs",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents),
         |sh0 AS (
         |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
         |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
         |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > ${Pipeline.DfCap}),
         |sh AS (SELECT * FROM sh0 WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.s = sh0.s)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
         |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
         |FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
         |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
         |ORDER BY d1, d2""".stripMargin) { (spark, dir) =>
      // postings persisted below the df-cap (the shared [[postings]] helper):
      // dfCapped references them twice — hot counts + anti-join left — and
      // unpersisted that re-ran the posexplode + per-doc window pass twice
      val sh = graft.operators.MinHashLSH.dfCapped(postings(spark, dir), Pipeline.DfCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      jaccardSelect(pairs, sizes)
    },

    // ---- q28: MinHash (12 hashes) + LSH (4 bands × 3 rows) near-dup:
    //           band-bucket candidates, then exact-Jaccard verification of
    //           candidates only — the 100 TB path ----
    OracleQuery(
      "q28_minhash_lsh",
      s"""$shinglesSql,
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
         |  GROUP BY c.d1, c.d2)
         |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
         |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
         |FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
         |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
         |ORDER BY d1, d2""".stripMargin) { (spark, dir) =>
      val sh = postings(spark, dir)
      // candidate generation factored into operators.MinHashLSH (single-pass
      // 12-min-agg signatures + band-bucket equi join) — shared with the q39
      // capstone so the "100 TB path" is one implementation, tested twice.
      // Signatures and Jaccard denominators come from ONE fused aggregate
      // pass over the postings (two groupBys before — r20, guide §2.4).
      val mhn = graft.operators.MinHashLSH.signaturesWithSizes(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the Jaccard denominators ride the band keys (4 rows per doc) into
      // the candidate pair itself — the two sizes joins the gate used to
      // pay are gone (r20; n is functionally dependent on doc_id, so the
      // extra grouping keys change no group)
      val bk = graft.operators.MinHashLSH.cappedBandKeys(
        graft.operators.MinHashLSH.bandKeys(mhn, keep = Seq("n")))
      val cand = bk.as("a")
        .join(bk.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .distinct()
      val pairs = cand
        .join(sh.as("a"), col("a.doc_id") === col("d1"))
        .join(sh.as("b"), col("b.doc_id") === col("d2") && col("b.s") === col("a.s"))
        .groupBy("d1", "d2", "na", "nb").agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter"))
      pairs.filter(jac >= 0.5)
        .select(col("d1"), col("d2"), col("inter"), jac.as("jaccard"))
        .orderBy("d1", "d2")
    },

    // ---- q75: estimated-Jaccard candidate scoring — q28's band-bucket
    //           candidates, but VERIFIED from the signatures alone
    //           (matches/12), never touching the postings again. Exact
    //           verification's per-pair cost is a join over both docs'
    //           shingle postings (corpus-sized relation); the estimate's is
    //           a codegen'd 12-way equality sum over two fixed-width rows
    //           (one row per doc). At 100 TB this is the first-line verify;
    //           exact Jaccard (q28) is reserved for borderline pairs. md5
    //           determinism makes even the estimation ERROR reproducible,
    //           so the whole probabilistic path stays oracle-checked. ----
    OracleQuery(
      "q75_minhash_estimate",
      s"""$shinglesSql,
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
         |est AS (
         |  SELECT c.d1, c.d2,
         |    CAST(count(*) FILTER (WHERE ma.h = mb.h) AS BIGINT) AS matches
         |  FROM cand c
         |  JOIN mh ma ON ma.doc_id = c.d1
         |  JOIN mh mb ON mb.doc_id = c.d2 AND mb.i = ma.i
         |  GROUP BY c.d1, c.d2)
         |SELECT d1, d2, matches, matches / 12.0 AS est_jaccard
         |FROM est WHERE matches >= 6 ORDER BY d1, d2""".stripMargin) { (spark, dir) =>
      val sh = postings(spark, dir)
      // one wide row per doc, read three times (band keys + both join
      // sides) — without the persist the 12-min-agg over postings reruns ×3
      val mh = graft.operators.MinHashLSH.signatures(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bk = graft.operators.MinHashLSH.cappedBandKeys(
        graft.operators.MinHashLSH.bandKeys(mh))
      val cand = bk.as("a")
        .join(bk.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      graft.operators.MinHashLSH.estimatedJaccard(cand, mh)
        .filter(col("matches") >= 6)
        .select(col("d1"), col("d2"), col("matches"),
          (col("matches") / lit(12.0)).as("est_jaccard"))
        .orderBy("d1", "d2")
    },

    // ---- q77: cross-document repeated-span detection — the n-gram-
    //           granular form of exact-substring dedup (the "remove
    //           verbatim-repeated passages" pass a training corpus gets
    //           after doc-level dedup; suffix-array substring dedup at
    //           8-token resolution). A span = an 8-token window at a
    //           position; a span is DUPLICATED when its gram occurs in ≥2
    //           distinct documents. Per doc: span count, duplicated-span
    //           count, duplication ratio — the signal that drives
    //           drop-or-trim policy. Plan shape at 100 TB: positional
    //           postings (narrow explode + one per-doc window pass), one
    //           exchange on the gram hash for the distinct-doc count, and
    //           the join back is co-partitioned on the same key (no second
    //           shuffle of the postings side). Gram df is a partial-agg-
    //           friendly count — no per-key state beyond a long. ----
    OracleQuery(
      "q77_dup_spans",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |spans AS (
        |  SELECT doc_id, i AS pos,
        |    md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7]) AS g
        |  FROM toks, unnest(generate_series(1, len(t) - 7)) AS gs(i)),
        |gdf AS (SELECT g, count(DISTINCT doc_id) AS ndocs FROM spans GROUP BY g),
        |per AS (
        |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(count(*) FILTER (WHERE gdf.ndocs >= 2) AS BIGINT) AS n_dup
        |  FROM spans s JOIN gdf ON gdf.g = s.g GROUP BY s.doc_id)
        |SELECT doc_id, n_spans, n_dup,
        |  round(CAST(n_dup AS DOUBLE) / CAST(n_spans AS DOUBLE), 9) AS dup_ratio
        |FROM per WHERE n_dup > 0 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val spans = TextOps.positionalShingles(
          docs(spark, dir).repartition(parts, col("doc_id")), "doc_id", "text", 8)
        .select(col("doc_id"), md5(col("s")).as("g"))
      val gdf = spans.groupBy("g").agg(countDistinct(col("doc_id")).as("ndocs"))
      spans.join(gdf, "g") // co-partitioned with gdf's exchange key
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          count(when(col("ndocs") >= 2, lit(1))).as("n_dup"))
        .filter(col("n_dup") > 0)
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
          round(col("n_dup").cast(DoubleType) / col("n_spans").cast(DoubleType), 9)
            .as("dup_ratio"))
        .orderBy("doc_id")
    },

    // ---- q50: winnowing fingerprints — rolling min over windows of 4
    //           consecutive shingle hashes (the MOSS/winnowing selection
    //           rule): position-aware, so it localizes matches, unlike the
    //           set-global min-shingle of q25. One window pass per doc. ----
    OracleQuery(
      "q50_winnowing",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |shp AS (
        |  SELECT doc_id, i AS pos, md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
        |wins AS (
        |  SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM shp)
        |SELECT DISTINCT doc_id, fp FROM wins
        |ORDER BY doc_id, fp""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val shp = TextOps.positionalShingles(
          docs(spark, dir).repartition(parts, col("doc_id")), "doc_id", "text", 3)
        .select(col("doc_id"), col("pos"), md5(col("s")).as("h"))
      val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
      shp.select(col("doc_id"), min(col("h")).over(win).as("fp"))
        .distinct()
        .orderBy("doc_id", "fp")
    },

    // ---- q29: SimHash-32 signatures (bit-vote over distinct tokens) ----
    OracleQuery(
      "q29_simhash",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |tok AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, unnest(t) AS w FROM toks) q),
        |votes AS (
        |  SELECT doc_id, g.j AS j,
        |    CASE WHEN SUM(CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), 1 + g.j // 4, 1)) - 1)
        |                             >> (3 - g.j % 4)) & 1 = 1 THEN 1 ELSE -1 END) >= 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM tok, unnest(generate_series(0, 31)) AS g(j)
        |  GROUP BY doc_id, g.j)
        |SELECT doc_id, CAST(SUM(bit * CAST(pow(2, j) AS BIGINT)) AS BIGINT) AS simhash
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val tok = docs(spark, dir)
        .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      // all 32 bit-votes as aggregate columns of ONE groupBy pass: no ×32
      // row explosion, one shuffle instead of two, and subexpression
      // elimination computes md5(w) once per row across the 32 votes. Each
      // column contributes its weight 2^j directly, so the signature is a
      // plain sum of the aggregated columns.
      def vote(j: Int) = expr(
        s"CASE WHEN (shiftright(instr('0123456789abcdef', substr(md5(w), ${1 + j / 4}, 1)) - 1, " +
          s"${3 - j % 4}) & 1) = 1 THEN 1 ELSE -1 END")
      val bitCols = (0 until 32).map(j =>
        when(sum(vote(j)) >= 0, lit(1L << j)).otherwise(lit(0L)).as(s"b$j"))
      tok
        .groupBy("doc_id")
        .agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 32).map(j => col(s"b$j")).reduce(_ + _).as("simhash"))
        .orderBy("doc_id")
    },

    // ---- q67: fuzzy (edit-distance) near-dup — blocking + verify, the
    //           record-linkage shape for SHORT strings where shingles are
    //           too coarse (titles, product names, author fields). Candidate
    //           generation is operators.Fuzzy: the user block key
    //           (type, size) — whose cardinality is fixed by the schema, so
    //           alone it would grow blocks linearly with the corpus — is
    //           refined with a length band (±1-band probe = EXACT recall,
    //           since bandWidth 4 > maxDist 3 means matching pairs differ
    //           by at most one band) and a block-size cap that bounds
    //           per-block pair work to cap² regardless of corpus size.
    //           The oracle applies the same cap exclusion; the band probe
    //           changes nothing it could observe (lossless by construction),
    //           so its SQL keeps the simpler unbanded join over the capped
    //           rows. levenshtein (codegen, exact integers both engines)
    //           verifies candidates only. ----
    OracleQuery(
      "q67_fuzzy_neardup",
      s"""WITH p0 AS (
         |  SELECT p_partkey, p_name, p_type, p_size,
         |    CAST(length(p_name) // ${graft.operators.Fuzzy.BandWidth} AS INTEGER) AS band
         |  FROM part),
         |p AS (
         |  SELECT * FROM (
         |    SELECT p0.*, count(*) OVER (PARTITION BY p_type, p_size, band) AS bc
         |    FROM p0) q
         |  WHERE bc <= ${graft.operators.Fuzzy.BlockCap})
         |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         |  a.p_name AS name_a, b.p_name AS name_b,
         |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
         |FROM p a JOIN p b
         |  ON a.p_type = b.p_type AND a.p_size = b.p_size
         |  AND a.p_partkey < b.p_partkey
         |  AND abs(length(a.p_name) - length(b.p_name)) <= 3
         |WHERE levenshtein(a.p_name, b.p_name) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
      fuzzyPairs(spark, dir)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
        .orderBy("id_a", "id_b")
    },

    // ---- q68: dedup CLUSTER resolution — connected components over the
    //           q67 fuzzy pair list (graft.operators.Components, hash-min
    //           label propagation). Pair emitters give edges; a keep-one
    //           policy needs the transitive closure: A~B and B~C put A and
    //           C in one cluster though they were never compared. The
    //           representative (= cluster id = min member id) is the kept
    //           doc; is_keeper marks it. The oracle walks the same closure
    //           with a recursive CTE — fine over the pair list's scale,
    //           while the Spark side's per-round shuffles are the form that
    //           survives a corpus-sized graph. ----
    OracleQuery(
      "q68_dup_clusters",
      s"""WITH RECURSIVE p0 AS (
         |  SELECT p_partkey, p_name, p_type, p_size,
         |    CAST(length(p_name) // ${graft.operators.Fuzzy.BandWidth} AS INTEGER) AS band
         |  FROM part),
         |p AS (
         |  SELECT * FROM (
         |    SELECT p0.*, count(*) OVER (PARTITION BY p_type, p_size, band) AS bc
         |    FROM p0) q
         |  WHERE bc <= ${graft.operators.Fuzzy.BlockCap}),
         |pairs AS (
         |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
         |  FROM p a JOIN p b
         |    ON a.p_type = b.p_type AND a.p_size = b.p_size
         |    AND a.p_partkey < b.p_partkey
         |    AND abs(length(a.p_name) - length(b.p_name)) <= 3
         |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |sym AS (SELECT id_a AS s, id_b AS t FROM pairs
        |        UNION SELECT id_b, id_a FROM pairs),
        |reach(s, t) AS (
        |  SELECT s, s FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM reach r JOIN sym ON r.t = sym.s)
        |SELECT s AS p_partkey, MIN(t) AS cluster,
        |  (MIN(t) = s) AS is_keeper
        |FROM reach GROUP BY s
        |ORDER BY cluster, p_partkey""".stripMargin) { (spark, dir) =>
      Components.connected(fuzzyPairs(spark, dir), "id_a", "id_b")
        .select(col("v").as("p_partkey"), col("c").as("cluster"),
          (col("c") === col("v")).as("is_keeper"))
        .orderBy("cluster", "p_partkey")
    },

    // ---- q111: CORPUS OVERLAP MATRIX — exact pairwise shingle-Jaccard
    //            between SOURCES, the pre-dedup diagnostic for a corpus
    //            assembled from multiple dumps ("how much of dump B is
    //            already in dump A?" decides dedup order and mixture
    //            weights BEFORE paying the doc-level pass). Scale shape:
    //            everything aggregates to the (source, shingle) level
    //            FIRST, so the self-join keys on the shingle with per-key
    //            cost ≤ |sources|² — bounded by the source count (a
    //            handful), never the corpus; contrast the doc-level
    //            postings joins, which need df caps. One shuffle to the
    //            distinct, one to the pair count. ----
    OracleQuery(
      "q111_source_overlap",
      """WITH toks AS (
        |  SELECT source, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 9) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.source = src_a
        |JOIN sizes sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin) { (spark, dir) =>
      val sh = TextOps.shinglePostings(
          docs(spark, dir).repartition(
            spark.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id")),
          "doc_id", "text", 3, keep = Seq("source"))
        .select(col("source"), col("s")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
      // one aggregation to the per-shingle SOURCE SET, then a row-local
      // pair explode — half the shuffle of a sh⋈sh self-join, same exact
      // output (the sorted set makes src_a < src_b by construction; pair
      // fan-out per shingle is ≤ C(|sources|, 2), saturating as the corpus
      // grows, so past saturation total cost is linear in shingle count)
      val bySrcSet = sh.groupBy("s")
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .filter(size(col("srcs")) > 1)
      val jac = col("n_common").cast(DoubleType) /
        (col("sa.n") + col("sb.n") - col("n_common"))
      bySrcSet
        .select(col("srcs"), posexplode(col("srcs")).as(Seq("i", "src_a")))
        .select(col("i"), col("src_a"), posexplode(col("srcs")).as(Seq("j", "src_b")))
        .filter(col("i") < col("j"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
        .join(sizes.as("sa"), col("sa.source") === col("src_a"))
        .join(sizes.as("sb"), col("sb.source") === col("src_b"))
        .select(col("src_a"), col("src_b"), col("n_common"),
          round(jac, 9).as("jaccard"))
        .orderBy("src_a", "src_b")
    },
  )

  /** q67/q68's shared candidate pipeline: (type, size, length-band)-blocked,
    * block-capped fuzzy name pairs verified by levenshtein ≤ 3 — see
    * [[graft.operators.Fuzzy]] for the scale contract. */
  private def fuzzyPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Fuzzy.pairs(
        Tables(spark, dir, "part")
          .select("p_partkey", "p_name", "p_type", "p_size"),
        idCol = "p_partkey", strCol = "p_name",
        blockCols = Seq("p_type", "p_size"), maxDist = 3)
      .withColumnsRenamed(Map("s_a" -> "name_a", "s_b" -> "name_b"))

  /** Shared tail: attach set sizes, compute Jaccard, filter ≥ 0.5. */
  private def jaccardSelect(pairs: DataFrame, sizes: DataFrame): DataFrame = {
    val jac = col("inter").cast(DoubleType) /
      (col("sa.n") + col("sb.n") - col("inter"))
    pairs
      .join(sizes.as("sa"), col("sa.doc_id") === col("d1"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("d2"))
      .filter(jac >= 0.5)
      .select(col("d1"), col("d2"), col("inter"), jac.as("jaccard"))
      .orderBy("d1", "d2")
  }
}
