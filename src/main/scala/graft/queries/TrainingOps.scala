package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.TextOps
import graft.operators.PrefixSum

/** Training-data curation operators a 100 TB pre-training pipeline runs
  * between "raw corpus" and "tokenizer input" (LLM-pipeline extensions; no
  * reference analogue). Everything is exact integer / md5 arithmetic so each
  * op is bit-identical in any engine — including the sampling, whose
  * keep/drop decision is a deterministic function of the row, not an RNG.
  *
  * Scale shapes: packing prefix-sums through the two-level parallel scan
  * (operators.PrefixSum), sampling and repetition scoring are narrow
  * per-row expression maps, and the quantile summary reduces per lang.
  */
object TrainingOps {

  /** Tokens-per-sequence budget for q53/q59 packing (a GPT-style 2k context). */
  val PackBudget = 2048

  /** Shared packing prelude, Spark side: documents with token counts and
    * the PrefixSum-assigned bin id (see q53's scaladoc for why this is the
    * two-level scan and not one window per language). */
  private def binned(spark: SparkSession, dir: String, extra: Seq[String]): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val d = Tables(spark, dir, "documents")
      .select((Seq("doc_id", "lang") ++ extra).map(col) :+
        TextOps.tokenCount(col("text")).as("n_tokens"): _*)
    PrefixSum.exclusive(d, Seq("lang"), "doc_id", "n_tokens", parts, "prior")
      .withColumn("bin", expr(s"CAST(prior div $PackBudget AS BIGINT)"))
  }

  /** Shared packing prelude, oracle side (same semantics as one window —
    * DuckDB's input fits one node). */
  private def binsSql(extra: String): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,$extra
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM d)""".stripMargin

  val queries: Seq[OracleQuery] = Seq(
    // ---- q53: sequence packing — assign docs to fixed-token-budget
    //           training bins by exclusive prefix sum (deterministic
    //           doc_id order within lang). The prefix sum runs through
    //           operators.PrefixSum's two-level parallel scan, NOT a
    //           single window over lang — with ~5 languages a plain
    //           Window.partitionBy(lang) would drag the whole corpus
    //           through 5 tasks at 100 TB. The oracle states the same
    //           semantics as one window (DuckDB's input fits one node). ----
    OracleQuery(
      "q53_sequence_packing",
      s"""${binsSql("")}
         |SELECT lang, CAST(prior // $PackBudget AS BIGINT) AS bin,
         |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
         |FROM c GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin) { (spark, dir) =>
      binned(spark, dir, Nil)
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast(LongType).as("bin_tokens"))
        .orderBy("lang", "bin")
    },

    // ---- q59: packed-sequence materialization — the companion to q53
    //           that actually builds each training sequence: documents of a
    //           bin concatenated in doc_id order (newline-joined), emitted
    //           as an md5 digest so the oracle row stays small. Spark has
    //           no ordered string_agg; the deterministic form is
    //           sort-the-collected-structs then join — per-bin arrays are
    //           budget-bounded (~budget/min_doc_tokens docs), so the
    //           interpreted transform touches dozens of elements, never the
    //           corpus. ----
    OracleQuery(
      "q59_packed_sequences",
      s"""${binsSql(" text,")}
         |SELECT lang, CAST(prior // $PackBudget AS BIGINT) AS bin,
         |  count(*) AS n_docs,
         |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS seq_digest
         |FROM c GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin) { (spark, dir) =>
      binned(spark, dir, Seq("text"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          md5(array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")),
            "\n")).as("seq_digest"))
        .orderBy("lang", "bin")
    },

    // ---- q54: stratified deterministic sampling — per-language keep rates
    //           (the data-mixing step that rebalances a corpus before
    //           training). The keep decision hashes the doc id through md5
    //           and compares the first byte to the language's rate, so the
    //           "random" sample is a pure function of the row: identical
    //           across engines, retries, and reruns — no RNG, no seed
    //           plumbing, no resample drift at 1000 executors. ----
    OracleQuery(
      "q54_stratified_sample",
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hv
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM h
        |  WHERE hv < CASE WHEN lang = 'en' THEN 64 ELSE 192 END)
        |SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val h = expr(
        "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1) * 16" +
          " + instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 2, 1)) - 1")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), h.as("hv"))
        // downsample the overrepresented language to 25%, keep 75% elsewhere
        .filter(col("hv") < when(col("lang") === "en", 64).otherwise(192))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast(LongType).as("total_chars"))
        .orderBy("lang")
    },

    // ---- q55: corpus quality distribution — exact interpolated quantiles
    //           of tokens-per-doc per language (the summary a curation run
    //           reports before/after each filter stage). Scale note: Spark's
    //           exact percentile keeps per-group state ∝ DISTINCT values,
    //           not rows — fine for a bounded integer domain like token
    //           counts; for unbounded/continuous measures switch to
    //           approx_percentile (mergeable t-digest), which this oracle
    //           can't check bit-exactly but shares the same plan shape. ----
    OracleQuery(
      "q55_token_quantiles",
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_tokens, 0.25), 9) AS p25,
        |  round(quantile_cont(n_tokens, 0.5), 9) AS p50,
        |  round(quantile_cont(n_tokens, 0.9), 9) AS p90
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_tokens, 0.25)"), 9).as("p25"),
          round(expr("percentile(n_tokens, 0.5)"), 9).as("p50"),
          round(expr("percentile(n_tokens, 0.9)"), 9).as("p90"))
        .orderBy("lang")
    },

    // ---- q56: repetition-ratio quality filter (Gopher-style): the share
    //           of the document owned by its most frequent token. High
    //           max-token-share flags degenerate/boilerplate docs. All
    //           integer counts; the final ratio is one int/int double
    //           division — identical IEEE result in any engine. ----
    OracleQuery(
      "q56_repetition_filter",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
        |agg AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_c, CAST(SUM(c) AS BIGINT) AS n_tok
        |  FROM tc GROUP BY doc_id)
        |SELECT doc_id, max_c, n_tok,
        |  CAST(max_c AS DOUBLE) / n_tok AS top_share
        |FROM agg
        |WHERE CAST(max_c AS DOUBLE) / n_tok > 0.12
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val share = col("max_c").cast(DoubleType) / col("n_tok")
      Tables(spark, dir, "documents").repartition(parts)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max("c").cast(LongType).as("max_c"), sum("c").cast(LongType).as("n_tok"))
        .select(col("doc_id"), col("max_c"), col("n_tok"), share.as("top_share"))
        .filter(share > 0.12)
        .orderBy("doc_id")
    },

    // ---- q57: vocabulary heavy hitters — global token frequencies, top
    //           50 (the corpus summary a tokenizer-training run starts
    //           from). The count is a map-side-combined aggregation on the
    //           token key; the top-k is TakeOrderedAndProject (per-partition
    //           heaps merged on the driver), never a global sort exchange —
    //           rank is attached afterwards over the 50 survivors only. ----
    OracleQuery(
      "q57_vocab_topk",
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |f AS (SELECT w, count(*) AS freq FROM tok GROUP BY w)
        |SELECT w, CAST(freq AS BIGINT) AS freq, CAST(rn AS INTEGER) AS rank
        |FROM (SELECT w, freq,
        |        row_number() OVER (ORDER BY freq DESC, w) AS rn FROM f) r
        |WHERE rn <= 50 ORDER BY rank""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val top = Tables(spark, dir, "documents").repartition(parts)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w"))
        .limit(50)
      // rank over the 50 survivors — partitioned by a constant: same single
      // tiny partition the post-top-k data already is, but declared, so the
      // global-window degradation warning (meant for big inputs) stays quiet
      top.withColumn("rank",
          row_number().over(Window.partitionBy(lit(0)).orderBy(col("freq").desc, col("w"))).cast(IntegerType))
        .select(col("w"), col("freq").cast(LongType).as("freq"), col("rank"))
        .orderBy("rank")
    },

    // ---- q58: eval-set decontamination — exact-fingerprint overlap
    //           between a held-out source and the rest of the corpus (the
    //           check every pre-training run owes its eval suite). The
    //           match key is the canonical content fingerprint, so the
    //           join is a hash-equi join on fp — bucketed, never all-pairs,
    //           and robust to word order/repetition like q26. ----
    OracleQuery(
      "q58_eval_contamination",
      """WITH f AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\s+'))), ' ')) AS fp
        |  FROM documents),
        |ev AS (SELECT doc_id, fp FROM f WHERE source = 'src0'),
        |tr AS (SELECT doc_id, fp FROM f WHERE source <> 'src0')
        |SELECT ev.doc_id AS eval_doc, count(*) AS n_train_dups
        |FROM ev JOIN tr ON tr.fp = ev.fp
        |GROUP BY ev.doc_id ORDER BY eval_doc""".stripMargin) { (spark, dir) =>
      // both sides of the overlap join derive from this projection —
      // persist so the corpus is scanned and fingerprinted once
      val f = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.contentFingerprint(TextOps.tokens(col("text"))).as("fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ev = f.filter(col("source") === "src0").select(col("doc_id").as("eval_doc"), col("fp"))
      val tr = f.filter(col("source") =!= "src0").select(col("fp"))
      ev.join(tr, "fp")
        .groupBy("eval_doc").agg(count(lit(1)).as("n_train_dups"))
        .orderBy("eval_doc")
    },

    // ---- q69: decontamination at lake scale — Bloom-sketch semi-join
    //           reduction (operators.Bloom). q58 answers "which eval docs
    //           leaked?"; this answers the production question "which TRAIN
    //           docs must I drop?", and does it without ever shuffling the
    //           train side: the eval fingerprints aggregate into one
    //           mergeable Bloom sketch, the corpus is pre-filtered by
    //           `might_contain` right above its scan (no false negatives),
    //           and only the surviving sliver pays the exact verify semi
    //           join that removes the sketch's false positives. The
    //           composite is EXACTLY the semi join — hence this oracle. ----
    OracleQuery(
      "q69_bloom_decontaminate",
      """WITH f AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\s+'))), ' ')) AS fp
        |  FROM documents),
        |ev AS (SELECT fp FROM f WHERE source = 'src0'),
        |tr AS (SELECT doc_id, fp FROM f WHERE source <> 'src0')
        |SELECT tr.doc_id AS doc_id
        |FROM tr WHERE EXISTS (SELECT 1 FROM ev WHERE ev.fp = tr.fp)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val f = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.contentFingerprint(TextOps.tokens(col("text"))).as("fp"))
      val ev = f.filter(col("source") === "src0").select("fp")
      val tr = f.filter(col("source") =!= "src0").select("doc_id", "fp")
      graft.operators.Bloom.semiJoin(tr, "fp", ev, "fp", expectedItems = 10000L)
        .select("doc_id").orderBy("doc_id")
    },

    // ---- q74: mixture rebalancing to TARGET proportions — q54's fixed
    //           per-stratum rates, but with the rates COMPUTED from the
    //           corpus (rate_l = target_l / actual_l, balanced target
    //           here), which is how a real data-mixture step works: you
    //           declare the mixture, the engine measures the corpus and
    //           derives the keep rates. The keep decision stays a pure
    //           function of the row AND the corpus stats, with no floats
    //           anywhere in the decision: keep iff
    //           hv * actual_l * n_langs < 256 * total  (all BIGINT cross-
    //           multiplication of hv/256 < target/actual), so over-target
    //           strata downsample to the target and under-target strata
    //           keep everything (hv ≤ 255 makes the inequality vacuous) —
    //           min(1, rate) for free, and bit-identical in any engine.
    //           Scale: the stats pass reads two pruned columns and yields
    //           one row per stratum; that sliver broadcasts back onto the
    //           corpus scan, so the corpus itself is never shuffled — the
    //           only exchanges move per-stratum partials. ----
    OracleQuery(
      "q74_mixture_rebalance",
      """WITH stats AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS actual
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(actual) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM stats),
        |h AS (
        |  SELECT doc_id, lang, n_chars,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hv
        |  FROM documents),
        |kept AS (
        |  SELECT h.lang, h.n_chars, t.total
        |  FROM h JOIN stats s ON s.lang = h.lang CROSS JOIN tot t
        |  WHERE hv * s.actual * t.n_langs < 256 * t.total)
        |SELECT lang, count(*) AS n_docs_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
        |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(max(total) AS DOUBLE), 9) AS kept_share
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val d = Tables(spark, dir, "documents")
      val stats = d.groupBy("lang").agg(sum("n_chars").cast(LongType).as("actual"))
      val tot = stats.agg(sum("actual").cast(LongType).as("total"),
        count(lit(1)).as("n_langs"))
      val rates = stats.crossJoin(tot)
      val h = expr(
        "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1) * 16" +
          " + instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 2, 1)) - 1")
      d.select(col("doc_id"), col("lang"), col("n_chars"), h.cast(LongType).as("hv"))
        .join(broadcast(rates), Seq("lang"))
        .filter(col("hv") * col("actual") * col("n_langs") < lit(256L) * col("total"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum("n_chars").cast(LongType).as("chars_kept"),
          max("total").as("t"))
        .select(col("lang"), col("n_docs_kept"), col("chars_kept"),
          round(col("chars_kept").cast(DoubleType) / col("t").cast(DoubleType), 9).as("kept_share"))
        .orderBy("lang")
    },

    // ---- q89: N-GRAM eval decontamination — the partial-overlap form of
    //           q58/q69 (which catch whole-document duplication by
    //           fingerprint). The classic pre-training hygiene step: a
    //           TRAIN document is contaminated when it shares any 8-token
    //           gram with the held-out eval set — quoting a benchmark
    //           answer inside an otherwise-novel page, which no
    //           whole-document fingerprint can see. Plan shape at 100 TB:
    //           both sides reduce to (doc, gram-hash) postings (narrow
    //           explode); the join is equi on the gram hash with the
    //           EVAL side tiny (eval suites are thousands of docs —
    //           broadcastable, so the train corpus never shuffles);
    //           boilerplate grams are df-capped on the train side (the
    //           q27/q39 discipline — a navigation-bar 8-gram in every
    //           page is not contamination, and uncapped it alone would
    //           pair with eval quadratically). md5 gram hashing keeps the
    //           join key fixed-width; the oracle applies the identical
    //           cap, so the capped semantics stay hash-checked. ----
    OracleQuery(
      "q89_ngram_decontamination",
      s"""WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |        t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]) AS gh
        |  FROM toks, unnest(generate_series(1, len(t) - 7)) AS s(i)),
        |ev AS (SELECT doc_id, gh FROM g WHERE source = 'src0'),
        |tr0 AS (SELECT doc_id, gh FROM g WHERE source <> 'src0'),
        |hot AS (SELECT gh FROM tr0 GROUP BY gh HAVING count(*) > ${Pipeline.DfCap}),
        |tr AS (SELECT * FROM tr0 WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.gh = tr0.gh))
        |SELECT tr.doc_id AS train_doc,
        |  CAST(count(DISTINCT tr.gh) AS BIGINT) AS n_shared_grams,
        |  CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
        |FROM tr JOIN ev ON ev.gh = tr.gh
        |GROUP BY tr.doc_id ORDER BY train_doc""".stripMargin) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents").select("doc_id", "source", "text")
      // ONE tokenize+shingle pass feeds both branches: the (doc, gram-hash,
      // source) postings persist, so the dominant cost — tokenizing and
      // shingling the corpus — runs once, where per-branch derivation
      // re-scanned and re-tokenized `documents` for each side
      val g = TextOps.shinglePostings(docs, "doc_id", "text", 8, keep = Seq("source"))
        .select(col("doc_id"), col("source"), md5(col("s")).as("gh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ev = g.filter(col("source") === "src0")
        .select(col("doc_id").as("eval_doc"), col("gh"))
      val tr0 = g.filter(col("source") =!= "src0")
        .select(col("doc_id").as("train_doc"), col("gh"))
      val hot = tr0.groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df") > Pipeline.DfCap).select("gh")
      val tr = tr0.join(hot, Seq("gh"), "left_anti")
      // explicit broadcast of the EVAL side: eval suites are bounded
      // (thousands of docs) while the train corpus is the 100 TB side — an
      // AQE threshold change must never silently shuffle the train
      // postings on this join (PlanSpec pins the BroadcastHashJoin)
      tr.join(org.apache.spark.sql.functions.broadcast(ev), "gh")
        .groupBy("train_doc")
        .agg(countDistinct("gh").as("n_shared_grams"),
          countDistinct("eval_doc").as("n_eval_docs"))
        .orderBy("train_doc")
    },

    // ---- q94: deterministic HOLDOUT carve-out — exactly k docs per
    //           stratum become the eval split, the complement trains (the
    //           fixed-BUDGET companion to q54's keep-RATE sampling: "50
    //           eval docs per language", not "25% of each"). Rank = md5 of
    //           a salted doc id, so membership is a pure function of the
    //           row: the same doc is in the same split on every engine,
    //           retry, and rerun, and a re-carve after the corpus grows
    //           moves as few docs as possible (ranks of surviving docs
    //           never change relative order). ONE pass: the rank labels
    //           both splits in the same window — no anti-join of "rest
    //           minus sample", which at 100 TB would re-shuffle the corpus
    //           a second time. Cost = one lang-keyed exchange + per-stratum
    //           sort; both split aggregates ride the same scan. ----
    OracleQuery(
      "q94_holdout_split",
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('holdout:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN rn <= 50 THEN 'holdout' ELSE 'train' END AS split,
        |  count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM r GROUP BY lang, split ORDER BY lang, split""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("__h"), col("doc_id"))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("__h", md5(concat(lit("holdout:"), col("doc_id").cast("string"))))
        .withColumn("split",
          when(row_number().over(w) <= 50, "holdout").otherwise("train"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast(LongType).as("total_chars"))
        .orderBy("lang", "split")
    },
  )
}
