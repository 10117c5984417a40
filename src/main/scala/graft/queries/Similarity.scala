package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.VecOps

/** Similarity search over `embeddings` (LLM-pipeline extension):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed ANN as the scale path.
  *
  * Both are bit-exact oracle-checked (see [[VecOps]] for the decimal
  * widening contract and [[graft.plans.VecQuant]] for the array-form exact
  * arithmetic these queries execute: every score the oracle computes over
  * exploded decimal/scaled-long postings is reproduced bit-for-bit by one
  * whole-stage-codegen loop over the quantized arrays). The LSH variants
  * derive hyperplane signs from md5, so bucket assignment — and therefore
  * even their recall misses — is identical in any engine: the probabilistic
  * index is still a deterministic function of the data.
  *
  * Scale shape: queries are a small broadcast relation probed against the
  * corpus (no corpus shuffle for brute-force); LSH verification joins touch
  * candidate PAIRS only — one row per pair, not pair×dim posting rows —
  * with cost ∝ Σ bucket². At 100 TB the bucket key (or IVF centroid id)
  * becomes the partition key and each executor ranks its buckets locally.
  */
object Similarity {

  private val K = 5

  /** Shared oracle prelude: decimal postings + norms + query subset. */
  private val edSql =
    """WITH ed AS (
      |  SELECT vec_id, i, xd, CAST(xd * 1000000000 AS BIGINT) AS xl
      |  FROM (SELECT vec_id, i, CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) AS xd
      |        FROM (SELECT vec_id, unnest(embedding) AS x,
      |                     unnest(generate_series(1, len(embedding))) AS i
      |              FROM embeddings) w) u),
      |norms AS (SELECT vec_id, sqrt(CAST(SUM(xd*xd) AS DOUBLE)) AS nrm
      |          FROM ed GROUP BY vec_id)""".stripMargin

  // Output rounds cosine to 9 digits: the exact-decimal dot is cast to
  // double once per engine, and DuckDB's decimal→double goes through two
  // roundings (int128→double, then ·10^-scale) vs. the JVM's one — a 1-ulp
  // wobble that 9-digit rounding absorbs. Ranking uses the full value
  // (1 ulp cannot reorder distinct candidates).
  private val rankTailSql =
    """SELECT query_id, cand_id, CAST(rn AS INTEGER) AS rank,
      |  round(cosine, 9) AS cosine
      |FROM (SELECT query_id, cand_id, cosine,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY cosine DESC, cand_id) AS rn
      |      FROM cos) r
      |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  /** Array-form quantized corpus: ONE row per vector, `q<scale>` holding
    * the exact 10^scale-scaled long view of every element
    * ([[graft.plans.QuantizeScaled]]). The exploded (vec_id, i, x) posting
    * form this replaces pushed dim rows per vector through every dot's
    * exchange + hash aggregate; the array form computes the SAME exact
    * integer arithmetic in one codegen loop per PAIR ([[graft.plans.DotI64]]
    * / [[graft.plans.DotDecDouble]]), so candidate verification shuffles
    * pairs, not pair×dim postings, and the per-dot aggregations (with
    * their exchanges) vanish from the plan. Quantization runs once per
    * vector; the relation is persisted because every downstream stage
    * (norms, centroids, both verify sides) re-reads it. */
  private def evq(
      spark: SparkSession,
      dir: String,
      scale: Int,
      qCol: String,
      extra: Seq[String] = Nil): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    Tables(spark, dir, "embeddings")
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .select(col("vec_id") +: extra.map(col) :+
        call_function("quantize_scaled", col("embedding"), lit(scale)).as(qCol): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** PQ codeword argmin per (vector, subspace): the smallest (d2, k) over
    * the candidate codewords, ties to the smaller k — exactly the oracle's
    * `row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) = 1`. As a
    * window that form SORTS the full (vector × codeword) relation (the
    * PQ-encode stage was q80/q102's single heaviest stage); as a MIN over
    * the order-preserving encoding d2·64 + k it aggregates MAP-SIDE
    * (HashAggregate — decimal buffers are UnsafeRow-mutable) and shuffles
    * one row per (vec_id, m). decimal(38,0) because a valid long d2 times
    * 64 can overflow a long (ANSI would throw); k < 64 by construction
    * (codebook ids are the first-64 vec_ids), so the modulus decodes it
    * exactly. */
  private[graft] def pqArgmin(enc: DataFrame): DataFrame =
    enc
      .groupBy("vec_id", "m")
      .agg(min(col("d2").cast(DecimalType(38, 0)) * 64 + col("k")).as("__dk"))
      .select(col("vec_id"), col("m"),
        pmod(col("__dk"), lit(64)).cast(LongType).as("k"))

  /** Exact integer dot of two scaled-long arrays (≡ SUM over the exploded
    * postings' products, bit-for-bit). */
  private def dotq(a: Column, b: Column): Column =
    call_function("dot_i64", a, b)

  /** Exact decimal dot of two 1e9-scaled arrays rendered as DOUBLE
    * (≡ CAST(SUM(xd·xd') AS DOUBLE) over the DECIMAL(18,9) postings). */
  private def dot9(a: Column, b: Column): Column =
    call_function("dot_dec_double", a, b, lit(18))

  /** The scale-9 corpus (vec_id, q9) — the DECIMAL(18,9) family's view. */
  private def ev9(spark: SparkSession, dir: String): DataFrame =
    evq(spark, dir, 9, "q9")

  /** L2 norms off the array view: (vec_id, nrm) — the exact decimal sum of
    * squares, one sqrt (≡ [[VecOps.norms]] over the exploded postings). */
  private def nrm9(e: DataFrame): DataFrame =
    e.select(col("vec_id"), sqrt(dot9(col("q9"), col("q9"))).as("nrm"))

  /** ±1 hyperplane sign rows (p, parr: array<long> of 64 md5-derived signs)
    * — the array twin of the exploded (p, i, sgn) relation: a sign vote is
    * then one dot_i64(vector, plane) instead of 64 posting-join rows. */
  private def planeArrays(spark: SparkSession, planes: Int): DataFrame =
    spark.range(0, planes)
      .select(col("id").cast(IntegerType).as("p"))
      .select(col("p"), expr(
        """transform(sequence(1, 64), i ->
          |  CASE WHEN instr('0123456789abcdef',
          |    substr(md5(concat(cast(p as string), ',', cast(i as string))), 1, 1)) - 1 >= 8
          |  THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)""".stripMargin).as("parr"))

  /** cosine = dot / (|a| |b|) and top-K ranking — shared tail. */
  private def rankTail(dots: DataFrame, nrm: DataFrame): DataFrame = {
    val cos = dots
      .join(nrm.as("nq"), col("nq.vec_id") === col("query_id"))
      .join(nrm.as("nc"), col("nc.vec_id") === col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (col("dot") / (col("nq.nrm") * col("nc.nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    cos.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"),
        round(col("cosine"), 9).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** The scale-6 corpus (vec_id [, extra...], q6) — the 1e6-scaled long
    * view the quantized-dot queries ride ([[evq]]). */
  private def ev6(spark: SparkSession, dir: String, extra: Seq[String] = Nil): DataFrame =
    evq(spark, dir, 6, "q6", extra)

  /** Shared oracle prelude for the quantized (1e6 long) postings. */
  private val ed6Sql =
    """WITH ed6 AS (
      |  SELECT vec_id, i,
      |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS xm
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |               unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings) u),
      |n6 AS (SELECT vec_id, CAST(SUM(xm*xm) AS BIGINT) AS nsq FROM ed6 GROUP BY vec_id)""".stripMargin

  /** ANN via IVF — deterministic seed centroids, nearest-centroid cell
    * assignment, exact search within the query's top-`nprobe` cells.
    * Every score is exact (long dots < 2^53 → exact doubles), so even
    * cell-boundary effects are identical across engines. nprobe=1 searches
    * the query's own cell only (fastest, misses near-border neighbors);
    * nprobe=2 re-ranks the two closest cells, the standard recall fix for
    * border queries — its candidate set strictly contains nprobe=1's. At
    * scale the cell count grows ~√N with the corpus and nprobe trades
    * recall for probes, all under the same bucketed-equi-join plan. */
  private def ivfQuery(name: String, nprobe: Int): OracleQuery =
    OracleQuery(
      name,
      s"""$ed6Sql,
         |cent AS (SELECT * FROM ed6 WHERE vec_id % 250 = 1),
         |cdots AS (
         |  SELECT v.vec_id, c.vec_id AS c_id, CAST(SUM(v.xm * c.xm) AS BIGINT) AS dot6
         |  FROM ed6 v JOIN cent c ON c.i = v.i GROUP BY 1, 2),
         |ranked AS (
         |  SELECT cd.vec_id, cd.c_id,
         |    row_number() OVER (PARTITION BY cd.vec_id
         |      ORDER BY CAST(cd.dot6 AS DOUBLE) / sqrt(CAST(nc.nsq AS DOUBLE)) DESC, cd.c_id) AS rn
         |  FROM cdots cd JOIN n6 nc ON nc.vec_id = cd.c_id),
         |assign AS (SELECT vec_id, c_id FROM ranked WHERE rn = 1),
         |probes AS (SELECT vec_id, c_id FROM ranked WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS cand_id
         |  FROM probes q JOIN assign v ON v.c_id = q.c_id AND v.vec_id <> q.vec_id
         |  WHERE q.vec_id % 100 = 0),
         |dots AS (
         |  SELECT c.query_id, c.cand_id, CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot6
         |  FROM cand c
         |  JOIN ed6 a ON a.vec_id = c.query_id
         |  JOIN ed6 b ON b.vec_id = c.cand_id AND b.i = a.i
         |  GROUP BY 1, 2),
         |cos AS (
         |  SELECT query_id, cand_id,
         |    CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
         |  FROM dots JOIN n6 na ON na.vec_id = query_id
         |            JOIN n6 nb ON nb.vec_id = cand_id)
         |SELECT query_id, cand_id, CAST(rn AS INTEGER) AS rank, cosine
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, cand_id) AS rn FROM cos) r
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
      val e = ev6(spark, dir)
      val n6 = e.select(col("vec_id"), dotq(col("q6"), col("q6")).as("nsq"))
      val cent = e.filter(col("vec_id") % 250 === 1)
        .select(col("vec_id").as("c_id"), col("q6").as("cq"))
      // vector × centroid scores: one codegen dot per pair — the posting
      // form shuffled pair×dim rows through a hash aggregate here
      val cdots = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("c_id"), dotq(col("q6"), col("cq")).as("dot6"))
      val score = col("dot6").cast(DoubleType) / sqrt(col("nc.nsq").cast(DoubleType))
      val assignW = Window.partitionBy(col("cd.vec_id")).orderBy(score.desc, col("c_id"))
      val ranked = cdots.as("cd")
        .join(n6.as("nc"), col("nc.vec_id") === col("c_id"))
        .withColumn("rn", row_number().over(assignW))
        .select(col("cd.vec_id").as("vid"), col("c_id"), col("rn"))
        // cache only the ≤nprobe rows per vector both consumers read, not
        // the full |vectors|×|centroids| ranking
        .filter(col("rn") <= nprobe)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assign = ranked.filter(col("rn") === 1)
      val probes = ranked // already filtered to rn <= nprobe above
      val cand = probes.as("q").filter(col("q.vid") % 100 === 0)
        .join(assign.as("v"), col("v.c_id") === col("q.c_id") && col("v.vid") =!= col("q.vid"))
        .select(col("q.vid").as("query_id"), col("v.vid").as("cand_id"))
        .distinct()
      val dots = cand
        .join(e.as("a"), col("a.vec_id") === col("query_id"))
        .join(e.as("b"), col("b.vec_id") === col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          dotq(col("a.q6"), col("b.q6")).as("dot6"))
      val cos = dots
        .join(n6.as("na"), col("na.vec_id") === col("query_id"))
        .join(n6.as("nb"), col("nb.vec_id") === col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          (col("dot6").cast(DoubleType) /
            (sqrt(col("na.nsq").cast(DoubleType)) * sqrt(col("nb.nsq").cast(DoubleType)))).as("cosine"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
      cos.withColumn("rank", row_number().over(w).cast(IntegerType))
        .filter(col("rank") <= K)
        .select("query_id", "cand_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    }

  val queries: Seq[OracleQuery] = Seq(
    // ---- q43/q52: IVF ANN, nprobe=1 and the nprobe=2 border-recall fix ----
    ivfQuery("q43_ann_ivf", 1),
    ivfQuery("q52_ann_ivf_probe2", 2),

    // ---- q42: embedding-cosine near-dup pairs, (label × LSH band) blocked ----
    // Elements quantize to 1e6-scaled longs (DECIMAL(18,6) rounding, then an
    // exact integer view): dot products and norm squares stay in codegen
    // long arithmetic, and every long here is < 2^53 so the long→double
    // casts are EXACT — cosine is bit-identical across engines with no
    // rounding escape hatch needed.
    //
    // Blocking: label alone is NOT a scale-safe block key (block size grows
    // ∝ N/|labels| and the pair space goes quadratic within a label). The
    // block key here is (label, hyperplane band key): 8 bands of 3
    // md5-derived random hyperplanes each, so every band splits each label
    // into 2³ buckets and exact dots are computed only for same-block pairs.
    // Planes-per-band is the block-size knob — it grows with log(N) in
    // production (each extra plane halves the block) while bands recover
    // recall; 8×3 here keeps every cosine≥0.4 pair of the test corpus while
    // bounding any single block at 1/8 of a label. Recall misses, like all
    // LSH in this repo, are a deterministic function of the data (md5 signs),
    // so the query stays bit-exact oracle-checkable.
    OracleQuery(
      "q42_embedding_neardup",
      """WITH ed6 AS (
        |  SELECT vec_id, label, i,
        |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS xm
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings) u),
        |n6 AS (SELECT vec_id, CAST(SUM(xm*xm) AS BIGINT) AS nsq FROM ed6 GROUP BY vec_id),
        |planes AS (
        |  SELECT p, i,
        |    CASE WHEN strpos('0123456789abcdef',
        |           substr(md5(CAST(p AS VARCHAR) || ',' || CAST(i AS VARCHAR)), 1, 1)) - 1 >= 8
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM unnest(generate_series(0, 23)) AS gp(p),
        |       unnest(generate_series(1, 64)) AS gi(i)),
        |bits AS (
        |  SELECT ed6.vec_id, planes.p,
        |    CASE WHEN SUM(planes.sgn * ed6.xm) >= 0 THEN '1' ELSE '0' END AS b
        |  FROM ed6 JOIN planes ON planes.i = ed6.i
        |  GROUP BY ed6.vec_id, planes.p),
        |sig AS (SELECT vec_id, string_agg(b, '' ORDER BY p) AS sig FROM bits GROUP BY vec_id),
        |lab AS (SELECT DISTINCT vec_id, label FROM ed6),
        |vecs AS (
        |  SELECT s.vec_id, lab.label,
        |    CAST(k AS VARCHAR) || '|' || substr(s.sig, k*3 + 1, 3) AS bkey
        |  FROM sig s JOIN lab ON lab.vec_id = s.vec_id,
        |       unnest(generate_series(0, 7)) AS gk(k)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2, a.label AS label
        |  FROM vecs a JOIN vecs b ON b.label = a.label AND b.bkey = a.bkey
        |    AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT c.v1, c.v2, c.label, CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot6
        |  FROM cand c
        |  JOIN ed6 a ON a.vec_id = c.v1
        |  JOIN ed6 b ON b.vec_id = c.v2 AND b.i = a.i
        |  GROUP BY 1, 2, 3),
        |cos AS (
        |  SELECT v1, v2, label,
        |    CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
        |  FROM dots JOIN n6 na ON na.vec_id = v1 JOIN n6 nb ON nb.vec_id = v2)
        |SELECT v1, v2, label, cosine FROM cos
        |WHERE cosine >= 0.4 ORDER BY v1, v2""".stripMargin) { (spark, dir) =>
      val nBands = 8
      val ppb = 3 // planes per band — the block-size knob (see scaladoc)
      val e = ev6(spark, dir, Seq("label"))
      val n6 = e.select(col("vec_id"), dotq(col("q6"), col("q6")).as("nsq"))
      // 24 hyperplanes × 64 dims of md5-derived ±1 signs (tiny, broadcast);
      // a sign vote is one codegen dot against the plane's ±1 array
      val bits = e.crossJoin(broadcast(planeArrays(spark, nBands * ppb)))
        .select(col("vec_id"), col("p"),
          when(dotq(col("q6"), col("parr")) >= 0, "1").otherwise("0").as("b"))
      val sig = bits.groupBy("vec_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("b")))), x => x.getField("b")),
          "").as("sig"))
      val lab = e.select("vec_id", "label").distinct()
      val vecs = sig.join(lab, "vec_id")
        .select(col("vec_id"), col("label"),
          explode(array((0 until nBands).map(k =>
            concat(lit(s"$k|"), substring(col("sig"), k * ppb + 1, ppb))): _*)).as("bkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = vecs.as("a")
        .join(vecs.as("b"), col("b.label") === col("a.label") && col("b.bkey") === col("a.bkey")
          && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"), col("a.label").as("label"))
        .distinct()
      val dots = cand
        .join(e.select("vec_id", "q6").as("a"), col("a.vec_id") === col("v1"))
        .join(e.select("vec_id", "q6").as("b"), col("b.vec_id") === col("v2"))
        .select(col("v1"), col("v2"), col("label"),
          dotq(col("a.q6"), col("b.q6")).as("dot6"))
      dots
        .join(n6.as("na"), col("na.vec_id") === col("v1"))
        .join(n6.as("nb"), col("nb.vec_id") === col("v2"))
        .select(col("v1"), col("v2"), col("label"),
          (col("dot6").cast(DoubleType) /
            (sqrt(col("na.nsq").cast(DoubleType)) * sqrt(col("nb.nsq").cast(DoubleType)))).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy("v1", "v2")
    },

    // ---- q30: brute-force cosine top-5 for sampled query vectors ----
    OracleQuery(
      "q30_cosine_topk",
      s"""$edSql,
         |q AS (SELECT * FROM ed WHERE vec_id % 100 = 0),
         |dots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    CAST(SUM(q.xd * c.xd) AS DOUBLE) AS dot
         |  FROM q JOIN ed c ON c.i = q.i AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |cos AS (
         |  SELECT query_id, cand_id, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON nq.vec_id = query_id
         |            JOIN norms nc ON nc.vec_id = cand_id)
         |$rankTailSql""".stripMargin) { (spark, dir) =>
      val e = ev9(spark, dir)
      val nrm = nrm9(e)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("q9").as("qq"))
      // queries are small — broadcast them so the corpus never shuffles;
      // one codegen dot per (vector, query) pair, no aggregation
      val dots = e
        .join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          dot9(col("q9"), col("qq")).as("dot"))
      rankTail(dots, nrm)
    },

    // ---- q31: ANN via random-hyperplane LSH — 4 hash TABLES × 8 planes
    //           (OR-amplification: candidates union across tables) PLUS
    //           MULTI-PROBE (round 8): each query probes its own bucket
    //           AND the 8 buckets at Hamming distance 1, in ascending
    //           |margin| order (margin = the exact integer sign vote
    //           SUM(sgn·xl); the lowest-|margin| plane is the one a true
    //           neighbor most likely lands on the other side of). Probing
    //           neighbor buckets multiplies the chance of meeting a true
    //           neighbor WITHOUT new tables or any corpus-side cost: the
    //           index is built once, only the tiny query side fans out
    //           (9 probes × 4 tables per query), and every join stays
    //           bucket-equi. The flip list is margin-ordered so its length
    //           is the recall-vs-cost knob at 100 TB (probe fewer, lowest-
    //           margin-first, when buckets are hot). Measured at sf0.1 this
    //           corpus is a weak-similarity regime (true-neighbor cosine
    //           ≈0.38 → ~62% per-bit agreement): one bucket per table gave
    //           recall@5 = 0.08; Hamming-1 multi-probe lifts it ~6× (see
    //           RecallSpec floors). Margins are exact integers, so probe
    //           order — and therefore the candidate set — is bit-identical
    //           in any engine. ----
    OracleQuery(
      "q31_ann_lsh",
      s"""$edSql,
         |planes AS (
         |  SELECT p, i,
         |    CASE WHEN strpos('0123456789abcdef',
         |           substr(md5(CAST(p AS VARCHAR) || ',' || CAST(i AS VARCHAR)), 1, 1)) - 1 >= 8
         |         THEN 1 ELSE -1 END AS sgn
         |  FROM unnest(generate_series(0, 31)) AS gp(p),
         |       unnest(generate_series(1, 64)) AS gi(i)),
         |bits AS (
         |  SELECT ed.vec_id, planes.p, SUM(planes.sgn * ed.xl) AS s
         |  FROM ed JOIN planes ON planes.i = ed.i
         |  GROUP BY ed.vec_id, planes.p),
         |tb AS (
         |  SELECT vec_id, p // 8 AS t,
         |    CAST(SUM(CASE WHEN s >= 0 THEN 1 << (p % 8) ELSE 0 END) AS INTEGER) AS sig
         |  FROM bits GROUP BY vec_id, p // 8),
         |flipord AS (
         |  SELECT vec_id, p // 8 AS t, p % 8 AS pos,
         |    row_number() OVER (PARTITION BY vec_id, p // 8 ORDER BY abs(s), p) AS r
         |  FROM bits),
         |masks AS (
         |  SELECT vec_id, t, 0 AS mask FROM tb WHERE vec_id % 100 = 0
         |  UNION ALL
         |  SELECT vec_id, t, 1 << pos FROM flipord
         |  WHERE vec_id % 100 = 0 AND r <= 8
         |  UNION ALL
         |  SELECT a.vec_id, a.t, (1 << a.pos) | (1 << b.pos)
         |  FROM flipord a JOIN flipord b
         |    ON b.vec_id = a.vec_id AND b.t = a.t AND a.r < b.r AND b.r <= 4
         |  WHERE a.vec_id % 100 = 0),
         |qprobe AS (
         |  SELECT m.vec_id, m.t, CAST(xor(tb.sig, m.mask) AS INTEGER) AS psig
         |  FROM masks m JOIN tb ON tb.vec_id = m.vec_id AND tb.t = m.t),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM qprobe q JOIN tb c
         |    ON c.t = q.t AND c.sig = q.psig AND c.vec_id <> q.vec_id),
         |dots AS (
         |  SELECT cand.query_id, cand.cand_id,
         |    CAST(SUM(a.xd * b.xd) AS DOUBLE) AS dot
         |  FROM cand
         |  JOIN ed a ON a.vec_id = cand.query_id
         |  JOIN ed b ON b.vec_id = cand.cand_id AND b.i = a.i
         |  GROUP BY 1, 2),
         |cos AS (
         |  SELECT query_id, cand_id, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON nq.vec_id = query_id
         |            JOIN norms nc ON nc.vec_id = cand_id)
         |$rankTailSql""".stripMargin) { (spark, dir) =>
      val e = ev9(spark, dir)
      val nrm = nrm9(e)
      // 4 tables × 8 hyperplanes × 64 dims of md5-derived ±1 signs (tiny,
      // broadcast). A sign vote is one codegen dot of the 1e9-scaled array
      // against the plane's ±1 array — integer math; keep the raw vote s:
      // its sign is the bit, its magnitude the multi-probe margin
      val bits = e.crossJoin(broadcast(planeArrays(spark, 32)))
        .select(col("vec_id"), col("p"), dotq(col("q9"), col("parr")).as("s"))
      // per (vector, table): the 8-bit integer signature (bucket key within
      // the table — probing a neighbor bucket is just an XOR mask) and the
      // flip order — plane positions ascending by |margin|, the multi-probe
      // schedule. Referenced by both sides of the candidate join (the query
      // side explodes probes, so exchange reuse can't kick in) — persist
      val tb = bits
        .groupBy(col("vec_id"), (col("p") / 8).cast(IntegerType).as("t"))
        .agg(
          expr("int(sum(case when s >= 0 then shiftleft(1, int(p % 8)) else 0 end))").as("sig"),
          expr("transform(array_sort(collect_list(struct(abs(s) as m, p))), x -> int(x.p % 8))")
            .as("flips"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // query-side probes only: home bucket (mask 0) + all 8 Hamming-1
      // flips + Hamming-2 pairs among the 4 lowest-|margin| bits — 15
      // probes × 4 tables per query, all on the tiny query side. The two
      // slice bounds (8, 4) are the probe-budget knobs at 100 TB.
      val probes = tb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id"), col("t"), col("sig"), explode(concat(
          array(lit(0)),
          expr("transform(flips, pos -> shiftleft(1, pos))"),
          expr("""flatten(transform(slice(flips, 1, 4), a ->
                    transform(filter(slice(flips, 1, 4), b -> b > a),
                              b -> shiftleft(1, a) | shiftleft(1, b))))"""))).as("mask"))
        .select(col("vec_id"), col("t"), expr("sig ^ mask").as("psig"))
      val cand = probes.as("q")
        .join(tb.as("c"), col("c.t") === col("q.t") && col("c.sig") === col("q.psig")
          && col("c.vec_id") =!= col("q.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"))
        .distinct() // a pair colliding in several tables/probes verifies once
      val dots = cand
        .join(e.as("va"), col("va.vec_id") === col("query_id"))
        .join(e.as("vb"), col("vb.vec_id") === col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          dot9(col("va.q9"), col("vb.q9")).as("dot"))
      rankTail(dots, nrm)
    },

    // ---- q78: semantic dedup (SemDeDup) — cluster the embedding space
    //           around deterministic seed centroids (nearest-centroid
    //           assignment, exactly the IVF cell step of q43/q52), then
    //           prune WITHIN each cell: a vector is dropped when a
    //           lower-id cell-mate sits at cosine ≥ 0.4 (keep-first, same
    //           canonical-survivor rule as q26/q42). This is the published
    //           SemDeDup pipeline shape: the cell bounds the pairwise
    //           verify, so total work is Σ cell²·d with cell size the
    //           scale knob (centroid count grows with the corpus — here
    //           vec_id % 100, the seed rule of the IVF queries — so cells
    //           stay bounded at 100 TB and each cell's verify is local to
    //           its shuffle partition). All dots ride the exact scaled-
    //           long view (ed6): cell boundaries and cosines are
    //           bit-identical cross-engine, keeping even this
    //           cluster-then-prune pipeline oracle-checked. ----
    OracleQuery(
      "q78_semantic_dedup",
      s"""$ed6Sql,
         |cent AS (SELECT * FROM ed6 WHERE vec_id % 100 = 1),
         |cdots AS (
         |  SELECT v.vec_id, c.vec_id AS c_id, CAST(SUM(v.xm * c.xm) AS BIGINT) AS dot6
         |  FROM ed6 v JOIN cent c ON c.i = v.i GROUP BY 1, 2),
         |assign AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT cd.vec_id, cd.c_id,
         |      row_number() OVER (PARTITION BY cd.vec_id
         |        ORDER BY CAST(cd.dot6 AS DOUBLE) / sqrt(CAST(nc.nsq AS DOUBLE)) DESC, cd.c_id) AS rn
         |    FROM cdots cd JOIN n6 nc ON nc.vec_id = cd.c_id) r
         |  WHERE rn = 1),
         |mem AS (SELECT ed6.vec_id, a.cell, ed6.i, ed6.xm
         |        FROM ed6 JOIN assign a ON a.vec_id = ed6.vec_id),
         |dots AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2, CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot6
         |  FROM mem a JOIN mem b ON b.cell = a.cell AND b.i = a.i AND a.vec_id < b.vec_id
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT DISTINCT v2 AS vec_id FROM dots
         |  JOIN n6 na ON na.vec_id = v1 JOIN n6 nb ON nb.vec_id = v2
         |  WHERE CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) >= 0.4)
         |SELECT a.vec_id, a.cell, (dup.vec_id IS NULL) AS kept
         |FROM assign a LEFT JOIN dup ON dup.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin) { (spark, dir) =>
      val e6 = ev6(spark, dir)
      val n6 = e6.select(col("vec_id"), dotq(col("q6"), col("q6")).as("nsq"))
      // seed centroids: a few rows per √N-ish stride — tiny, broadcast
      val cent = e6.filter(col("vec_id") % 100 === 1)
        .select(col("vec_id").as("c_id"), col("q6").as("cq"))
      val cdots = e6.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("c_id"), dotq(col("q6"), col("cq")).as("dot6"))
      val byVec = Window.partitionBy(col("vec_id")).orderBy(
        (col("dot6").cast(DoubleType) / sqrt(col("c_nsq").cast(DoubleType))).desc,
        col("c_id"))
      val assign = cdots.join(
          n6.select(col("vec_id").as("nc_id"), col("nsq").as("c_nsq")),
          col("nc_id") === col("c_id"))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id").as("cell"))
      // cell-tagged vectors feed both sides of the within-cell verify: the
      // self-join emits one row per cell-mate PAIR (not pair×dim postings),
      // each verified by one codegen dot
      val mem = e6.join(assign, "vec_id")
        .select(col("vec_id"), col("cell"), col("q6"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dots = mem.as("a")
        .join(mem.as("b"), col("b.cell") === col("a.cell")
          && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          dotq(col("a.q6"), col("b.q6")).as("dot6"))
      val dup = dots
        .join(n6.as("na"), col("na.vec_id") === col("v1"))
        .join(n6.as("nb"), col("nb.vec_id") === col("v2"))
        .filter(col("dot6").cast(DoubleType) /
          (sqrt(col("na.nsq").cast(DoubleType)) * sqrt(col("nb.nsq").cast(DoubleType))) >= 0.4)
        .select(col("v2").as("vec_id")).distinct()
        .withColumn("rm", lit(1))
      assign.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("rm").isNull.as("kept"))
        .orderBy("vec_id")
    },

    // ---- q80: ANN via product quantization (PQ/ADC) — the third ANN
    //           family next to hyperplane-LSH (q31) and IVF (q43/q52),
    //           and the one whose POINT is memory: a 64-dim float vector
    //           is 256 bytes, its PQ code is M=8 nibble-sized ids — the
    //           whole corpus's codes fit in executor RAM at 100 TB while
    //           the raw vectors cannot. Encode: split dims into 8
    //           subspaces, per subspace assign the nearest of K=16
    //           codewords (deterministic codebook: the first-16 vectors'
    //           subvectors; exact integer L2 on the scaled-long view,
    //           ties to the smaller codeword). Query: one tiny M×K
    //           lookup table of exact codeword dots per query (ADC),
    //           approx score = 8 LUT adds per candidate instead of a
    //           64-dim dot; top-20 shortlist by approx score, exact
    //           rerank of the shortlist only. Everything through the
    //           shortlist is BIGINT-exact, so even PQ's approximation
    //           ERROR is reproducible cross-engine and the full
    //           pipeline stays oracle-checked. ----
    OracleQuery(
      "q80_pq_adc",
      s"""$ed6Sql,
         |sub AS (SELECT vec_id, CAST((i - 1) // 8 AS INTEGER) AS m, i, xm FROM ed6),
         |cb AS (SELECT m, vec_id AS k, i, xm AS cxm FROM sub WHERE vec_id < 64),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.k,
         |    CAST(SUM((s.xm - cb.cxm) * (s.xm - cb.cxm)) AS BIGINT) AS d2
         |  FROM sub s JOIN cb ON cb.m = s.m AND cb.i = s.i
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, m, k FROM (
         |    SELECT vec_id, m, k,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
         |    FROM enc) r WHERE rn = 1),
         |qlut AS (
         |  SELECT e.vec_id AS query_id, cb.m, cb.k,
         |    CAST(SUM(e.xm * cb.cxm) AS BIGINT) AS pdot
         |  FROM ed6 e JOIN cb ON cb.i = e.i
         |  WHERE e.vec_id % 100 = 0
         |  GROUP BY 1, 2, 3),
         |approx AS (
         |  SELECT l.query_id, c.vec_id AS cand_id, CAST(SUM(l.pdot) AS BIGINT) AS adot
         |  FROM codes c JOIN qlut l ON l.m = c.m AND l.k = c.k
         |  WHERE c.vec_id <> l.query_id
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS rn
         |    FROM approx) r WHERE rn <= 60),
         |dots AS (
         |  SELECT s.query_id, s.cand_id, CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot6
         |  FROM short s
         |  JOIN ed6 a ON a.vec_id = s.query_id
         |  JOIN ed6 b ON b.vec_id = s.cand_id AND b.i = a.i
         |  GROUP BY 1, 2)
         |SELECT query_id, cand_id, CAST(rn AS INTEGER) AS rank, round(cosine, 9) AS cosine
         |FROM (
         |  SELECT query_id, cand_id,
         |    CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY
         |      CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) DESC,
         |      cand_id) AS rn
         |  FROM dots JOIN n6 na ON na.vec_id = query_id JOIN n6 nb ON nb.vec_id = cand_id) z
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
      val e6 = ev6(spark, dir)
      val n6 = e6.select(col("vec_id"), dotq(col("q6"), col("q6")).as("nsq"))
      // per-subspace slices: 8 rows per vector (posexplode pos = the
      // 0-based subspace id m), each an 8-long subvector array
      val sub = e6.select(col("vec_id"),
        posexplode(array((0 until 8).map(m =>
          slice(col("q6"), m * 8 + 1, 8)): _*)).as(Seq("m", "sq")))
      // codebook: first-64 vectors' subvectors — tiny (M×K rows), broadcast
      val cb = sub.filter(col("vec_id") < 64)
        .select(col("m").as("cm"), col("vec_id").as("k"), col("sq").as("csq"))
      // encode: exact integer L2 per (vector, subspace, codeword) — one
      // codegen loop per candidate codeword, no posting aggregation
      val enc = sub
        .join(broadcast(cb), col("cm") === col("m"))
        .select(col("vec_id"), col("m"), col("k"),
          call_function("l2_i64", col("sq"), col("csq")).as("d2"))
      val codes = pqArgmin(enc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ADC lookup table: per query, exact dot with every codeword — tiny
      val qlut = sub.filter(col("vec_id") % 100 === 0)
        .join(broadcast(cb), col("cm") === col("m"))
        .select(col("vec_id").as("query_id"), col("cm").as("lm"), col("k").as("lk"),
          dotq(col("sq"), col("csq")).as("pdot"))
      // approx score: 8 LUT adds per candidate — codes ⋈ broadcast LUT,
      // the corpus-sized relation never shuffles for the probe
      val approx = codes
        .join(broadcast(qlut), col("lm") === col("m") && col("lk") === col("k")
          && col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id").as("cand_id"))
        .agg(sum(col("pdot")).as("adot"))
      val byQ = Window.partitionBy("query_id").orderBy(col("adot").desc, col("cand_id"))
      val short = approx.withColumn("rn", row_number().over(byQ))
        .filter(col("rn") <= 60).select("query_id", "cand_id")
      // exact rerank of the shortlist only (quantized-exact dots + norms)
      val dots = short
        .join(e6.select(col("vec_id"), col("q6")).as("a"),
          col("a.vec_id") === col("query_id"))
        .join(e6.select(col("vec_id"), col("q6")).as("b"),
          col("b.vec_id") === col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          dotq(col("a.q6"), col("b.q6")).as("dot6"))
      val cosine = col("dot6").cast(DoubleType) /
        (sqrt(col("na.nsq").cast(DoubleType)) * sqrt(col("nb.nsq").cast(DoubleType)))
      val byQc = Window.partitionBy("query_id").orderBy(cosine.desc, col("cand_id"))
      dots
        .join(n6.as("na"), col("na.vec_id") === col("query_id"))
        .join(n6.as("nb"), col("nb.vec_id") === col("cand_id"))
        .withColumn("rank", row_number().over(byQc).cast(IntegerType))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank"),
          round(cosine, 9).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- q102: IVF-PQ hybrid — the 100 TB ANN shape. q80's ADC scans
    //            EVERY code (that is why its recall holds, and why its
    //            cost is a full pass — cheap adds, but still O(corpus)
    //            per query wave); q43/q52's IVF scans probed cells only
    //            but pays full exact dots inside them. The hybrid
    //            composes the two prunings: IVF cell assignment first
    //            (corpus partitioned by nearest centroid — at scale the
    //            codes are STORED cell-partitioned, so a probe reads
    //            probed cells' codes only, ~nprobe/√N of the corpus),
    //            then ADC within the probed cells (8 LUT adds per
    //            candidate instead of a 64-dim dot), top-60 shortlist,
    //            exact rerank. nprobe=4 buys back the border-neighbor
    //            recall that cell bucketing costs under this corpus's
    //            weak-similarity regime (see RecallSpec). Every stage
    //            stays BIGINT-exact → the full pipeline, approximation
    //            error included, is oracle-checked. ----
    OracleQuery(
      "q102_ann_ivfpq",
      s"""$ed6Sql,
         |cent AS (SELECT * FROM ed6 WHERE vec_id % 250 = 1),
         |cdots AS (
         |  SELECT v.vec_id, c.vec_id AS c_id, CAST(SUM(v.xm * c.xm) AS BIGINT) AS dot6
         |  FROM ed6 v JOIN cent c ON c.i = v.i GROUP BY 1, 2),
         |ranked AS (
         |  SELECT cd.vec_id, cd.c_id,
         |    row_number() OVER (PARTITION BY cd.vec_id
         |      ORDER BY CAST(cd.dot6 AS DOUBLE) / sqrt(CAST(nc.nsq AS DOUBLE)) DESC, cd.c_id) AS rn
         |  FROM cdots cd JOIN n6 nc ON nc.vec_id = cd.c_id),
         |assign AS (SELECT vec_id, c_id FROM ranked WHERE rn = 1),
         |probes AS (SELECT vec_id, c_id FROM ranked
         |           WHERE rn <= 5 AND vec_id % 100 = 0),
         |sub AS (SELECT vec_id, CAST((i - 1) // 8 AS INTEGER) AS m, i, xm FROM ed6),
         |cb AS (SELECT m, vec_id AS k, i, xm AS cxm FROM sub WHERE vec_id < 64),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.k,
         |    CAST(SUM((s.xm - cb.cxm) * (s.xm - cb.cxm)) AS BIGINT) AS d2
         |  FROM sub s JOIN cb ON cb.m = s.m AND cb.i = s.i
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, m, k FROM (
         |    SELECT vec_id, m, k,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
         |    FROM enc) r WHERE rn = 1),
         |qlut AS (
         |  SELECT e.vec_id AS query_id, cb.m, cb.k,
         |    CAST(SUM(e.xm * cb.cxm) AS BIGINT) AS pdot
         |  FROM ed6 e JOIN cb ON cb.i = e.i
         |  WHERE e.vec_id % 100 = 0
         |  GROUP BY 1, 2, 3),
         |cand AS (
         |  SELECT DISTINCT p.vec_id AS query_id, v.vec_id AS cand_id
         |  FROM probes p JOIN assign v ON v.c_id = p.c_id AND v.vec_id <> p.vec_id),
         |approx AS (
         |  SELECT c.query_id, c.cand_id, CAST(SUM(l.pdot) AS BIGINT) AS adot
         |  FROM cand c
         |  JOIN codes cd ON cd.vec_id = c.cand_id
         |  JOIN qlut l ON l.query_id = c.query_id AND l.m = cd.m AND l.k = cd.k
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS rn
         |    FROM approx) r WHERE rn <= 60),
         |dots AS (
         |  SELECT s.query_id, s.cand_id, CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot6
         |  FROM short s
         |  JOIN ed6 a ON a.vec_id = s.query_id
         |  JOIN ed6 b ON b.vec_id = s.cand_id AND b.i = a.i
         |  GROUP BY 1, 2)
         |SELECT query_id, cand_id, CAST(rn AS INTEGER) AS rank, round(cosine, 9) AS cosine
         |FROM (
         |  SELECT query_id, cand_id,
         |    CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY
         |      CAST(dot6 AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) DESC,
         |      cand_id) AS rn
         |  FROM dots JOIN n6 na ON na.vec_id = query_id JOIN n6 nb ON nb.vec_id = cand_id) z
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
      val e6 = ev6(spark, dir)
      val n6 = e6.select(col("vec_id"), dotq(col("q6"), col("q6")).as("nsq"))
      // IVF: nearest-centroid assignment for the corpus, top-4 probes for
      // the query subset (exactly q43/q52's machinery, wider probe)
      val cent = e6.filter(col("vec_id") % 250 === 1)
        .select(col("vec_id").as("c_id"), col("q6").as("cq"))
      val cdots = e6.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("c_id"), dotq(col("q6"), col("cq")).as("dot6"))
      val score = col("dot6").cast(DoubleType) / sqrt(col("nc.nsq").cast(DoubleType))
      val assignW = Window.partitionBy(col("cd.vec_id")).orderBy(score.desc, col("c_id"))
      val ranked = cdots.as("cd")
        .join(n6.as("nc"), col("nc.vec_id") === col("c_id"))
        .withColumn("rn", row_number().over(assignW))
        .select(col("cd.vec_id").as("vid"), col("c_id"), col("rn"))
        .filter(col("rn") <= 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assign = ranked.filter(col("rn") === 1)
      val probes = ranked.filter(col("vid") % 100 === 0)
      // PQ: 8 subspaces × 16 codewords, exact integer L2 argmin (q80)
      val sub = e6.select(col("vec_id"),
        posexplode(array((0 until 8).map(m =>
          slice(col("q6"), m * 8 + 1, 8)): _*)).as(Seq("m", "sq")))
      val cb = sub.filter(col("vec_id") < 64)
        .select(col("m").as("cm"), col("vec_id").as("k"), col("sq").as("csq"))
      val enc = sub
        .join(broadcast(cb), col("cm") === col("m"))
        .select(col("vec_id"), col("m"), col("k"),
          call_function("l2_i64", col("sq"), col("csq")).as("d2"))
      val codes = pqArgmin(enc)
      val qlut = sub.filter(col("vec_id") % 100 === 0)
        .join(broadcast(cb), col("cm") === col("m"))
        .select(col("vec_id").as("query_id"), col("cm").as("lm"), col("k").as("lk"),
          dotq(col("sq"), col("csq")).as("pdot"))
      // candidates = probed cells' members; ADC runs on THESE codes only —
      // the cell partition is the scan pruning, the LUT adds are the
      // per-candidate cost
      val cand = probes.as("p")
        .join(assign.as("v"),
          col("v.c_id") === col("p.c_id") && col("v.vid") =!= col("p.vid"))
        .select(col("p.vid").as("query_id"), col("v.vid").as("cand_id"))
        .distinct()
      val approx = cand
        .join(codes, col("vec_id") === col("cand_id"))
        .join(broadcast(qlut),
          col("lm") === col("m") && col("lk") === col("k") &&
            qlut("query_id") === cand("query_id"))
        .groupBy(cand("query_id"), col("cand_id"))
        .agg(sum(col("pdot")).as("adot"))
      val byQ = Window.partitionBy("query_id").orderBy(col("adot").desc, col("cand_id"))
      val short = approx.withColumn("rn", row_number().over(byQ))
        .filter(col("rn") <= 60).select("query_id", "cand_id")
      val dots = short
        .join(e6.select(col("vec_id"), col("q6")).as("a"),
          col("a.vec_id") === col("query_id"))
        .join(e6.select(col("vec_id"), col("q6")).as("b"),
          col("b.vec_id") === col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          dotq(col("a.q6"), col("b.q6")).as("dot6"))
      val cosine = col("dot6").cast(DoubleType) /
        (sqrt(col("na.nsq").cast(DoubleType)) * sqrt(col("nb.nsq").cast(DoubleType)))
      val byQc = Window.partitionBy("query_id").orderBy(cosine.desc, col("cand_id"))
      dots
        .join(n6.as("na"), col("na.vec_id") === col("query_id"))
        .join(n6.as("nb"), col("nb.vec_id") === col("cand_id"))
        .withColumn("rank", row_number().over(byQc).cast(IntegerType))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank"),
          round(cosine, 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
  )
}
