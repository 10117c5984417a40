package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression: the properties that make these queries hold up
  * at 100 TB must stay visible in the plan — filter/projection pushdown into
  * the parquet scan, partial (map-side) aggregation, broadcast joins for
  * dimension tables, and top-k without a global sort exchange. A refactor
  * that silently loses one of these still returns correct rows; this suite
  * is what catches it.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("simple"))

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "filter not pushed")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_discount:double,l_shipdate"),
      "column pruning lost")
  }

  test("q01: aggregation is partial+final (map-side combine before exchange)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "scan filter not pushed")
  }

  test("q06: star joins broadcast every dimension") {
    val p = plan("q06_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, "dimensions not broadcast")
  }

  test("q07: rank filter inserts WindowGroupLimit (map-side top-k before the exchange)") {
    // Spark's InferWindowGroupLimit turns `row_number() <= k` into a
    // partial group-limit BELOW the shuffle: each task forwards at most k
    // rows per key instead of its whole partition — the property that makes
    // window top-k survive 100 TB groups. A filter rewrite that breaks the
    // rank-predicate pattern silently loses it; this pins it.
    val p = plan("q07_topk_per_customer")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "partial+final WindowGroupLimit lost — full groups would shuffle")
  }

  test("q82: the approved-source join prunes fact partitions at RUNTIME (DPP)") {
    // the dim (approved sources) is computed from the corpus, so plan-time
    // partition pruning cannot apply; dynamic partition pruning must turn
    // the broadcast dim into a partition filter on the fact scan — at scale
    // the fact side reads only the approved sources' directories
    val p = plan("q82_dpp_approved_sources")
    assert(p.contains("dynamicpruning"),
      "no dynamic partition pruning — every source directory would be read")
  }

  test("q09: global top-k plans as TakeOrderedAndProject (no sort exchange)") {
    val p = plan("q09_top_orders")
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to global sort")
    assert(!p.contains("Exchange rangepartitioning"), "unexpected global sort exchange")
  }

  test("q30: query vectors broadcast against the corpus postings") {
    val p = plan("q30_cosine_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "query side not broadcast — corpus would shuffle")
  }

  test("q04: EXISTS plans as a semi join, not an aggregate-join rewrite") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"), "semi-join shape lost")
  }

  test("no extension query ever plans an all-pairs join") {
    // the scale contract of the dedup/text family: candidate generation is
    // always a key-equi join (shingle / band / bucket / length-band), never
    // a cartesian or nested-loop product
    Seq("q27_jaccard_pairs", "q28_minhash_lsh", "q39_training_pipeline",
        "q67_fuzzy_neardup", "q69_bloom_decontaminate", "q77_dup_spans",
        "q86_referential_audit", "q89_ngram_decontamination").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
    // the vector family's scoring joins (corpus × centroids / hyperplanes /
    // query subset) are INTENTIONAL full products of the corpus with a
    // broadcast-small relation — since round 19 they stream the corpus once
    // against the broadcast side (BroadcastNestedLoopJoin; output
    // cardinality identical to the old posting equi-join-on-i form, input
    // rows dim× fewer). The guard here is that no such join may DEGRADE to
    // a non-broadcast CartesianProduct (both sides shuffled to every task —
    // the true all-pairs catastrophe), and every candidate VERIFY join
    // stays key-equi (asserted per query below: bkey / cell / c_id keys).
    Seq("q30_cosine_topk", "q31_ann_lsh", "q42_embedding_neardup",
        "q43_ann_ivf", "q52_ann_ivf_probe2", "q78_semantic_dedup",
        "q80_pq_adc", "q102_ann_ivfpq").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q27: jaccard postings are df-capped (anti join) before the self-join") {
    // the cap's left-anti join against the hot-shingle set is what bounds
    // per-key join work to DfCap²; losing it regresses to an unbounded
    // Σ df² shuffle on corpus-common trigrams
    val p = plan("q27_jaccard_pairs")
    assert(p.contains("LeftAnti"), "df-cap anti join lost — postings self-join unbounded again")
  }

  test("q69: the corpus side is Bloom-pre-filtered below the verify semi join") {
    // the scale contract of the sketch-broadcast decontamination: the
    // might_contain predicate must sit on the big side's scan path (so only
    // sketch survivors pay the join), and the verify must stay a semi join
    val p = plan("q69_bloom_decontaminate")
    assert(p.contains("might_contain"), "Bloom pre-filter lost — corpus pays the full join")
    assert(p.contains("LeftSemi"), "exact verify is not a semi join")
    val filterAt = p.indexOf("might_contain")
    val joinAt = p.indexOf("LeftSemi")
    assert(joinAt < filterAt, "pre-filter does not sit below the semi join")
  }

  test("q39: near-dup candidates come from band buckets, not a postings self-join") {
    // the shuffle keys must include the LSH band key; a regression back to
    // the raw `sh ⋈ sh ON s` shape would drop `bkey` from the plan entirely
    val p = plan("q39_training_pipeline")
    assert(p.contains("bkey"), "band-bucket candidate join lost (raw shingle self-join?)")
  }

  test("q42: pair blocking is the composite (label, band-key), not label alone") {
    val p = plan("q42_embedding_neardup")
    assert(p.contains("bkey"), "hyperplane band key lost from the blocking join")
  }

  test("q76: df/stats relations broadcast; top-k never globally sorts the corpus") {
    // the scale contract of BM25: the corpus-sized relations (tf, dl) are
    // only ever probed by BROADCAST tiny sides (df, the 1-row stats), and
    // the final top-k must not range-shuffle the scored relation
    val p = plan("q76_bm25_topk")
    assert(p.contains("BroadcastExchange"), "df/stats side not broadcast — corpus would shuffle")
    assert(!p.contains("Exchange rangepartitioning"), "top-k fell back to a global sort exchange")
  }

  test("q78: centroids broadcast; within-cell verify is keyed on the cell") {
    // SemDeDup's scale contract: assignment probes a BROADCAST centroid
    // relation (the corpus never shuffles for it), and the pairwise verify
    // join is equi-keyed on the cell id so its cost is Σ cell², not corpus²
    val p = plan("q78_semantic_dedup")
    assert(p.contains("BroadcastExchange"), "centroid side not broadcast")
    assert(p.contains("cell"), "cell key lost from the within-cell verify join")
  }

  test("q67: fuzzy candidate join is keyed on the length band, and capped") {
    // the scale contract of operators.Fuzzy: the (type, size) user key has
    // schema-fixed cardinality, so the length band must stay in the join
    // key (losing it regresses pair work to quadratic-in-corpus) and the
    // block-count window (the cap) must sit on the banded key too
    val p = plan("q67_fuzzy_neardup")
    assert(p.contains("__probe") && p.contains("__band_b"),
      "length-band probe lost from the fuzzy candidate join key")
    assert(p.contains("__bc"), "block-size cap window lost")
  }

  test("q28: LSH band buckets are capped below the candidate self-join") {
    // the scale contract of MinHashLSH.candidatePairs: a family of (near-)
    // identical docs shares signatures and lands in one band bucket, so an
    // uncapped bucket pairs quadratically. The __bsz count window (the cap)
    // must sit on bkey BELOW the self-join, and it must not introduce a
    // second exchange — the window's bkey partitioning is exactly the
    // join's, so the exchange is computed once and reused
    val p = plan("q28_minhash_lsh")
    assert(p.contains("__bsz"), "band-bucket cap window lost from q28's candidate path")
    assert(p.contains("windowspecdefinition(bkey"),
      "cap window no longer partitions on the band key — it must share the " +
        "join's bkey exchange (statically or via AQE reuse), never add one")
    assert("Filter \\(*__bsz".r.findFirstIn(p).isDefined ||
      p.contains("(__bsz"), "cap filter lost below the candidate join")
  }

  test("q51: salted aggregation plans two aggregation stages") {
    val p = plan("q51_salted_skew_agg")
    // partial+final per groupBy phase → ≥4 HashAggregates over ≥2 exchanges
    assert("HashAggregate".r.findAllIn(p).length >= 4, "two-phase agg collapsed")
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2,
      "salted phase lost its own exchange")
  }

  test("q70: salted join shuffles on the composite (key, salt)") {
    val p = plan("q70_salted_skew_join")
    assert(p.contains("__salt"), "salt column lost from the join")
    assert(p.contains("SortMergeJoin"), "salted join not a shuffle join")
    assert(!p.contains("BroadcastHashJoin"), "replicated dimension got broadcast — salt is dead weight")
  }

  test("q57: vocab top-k plans as TakeOrderedAndProject before ranking") {
    val p = plan("q57_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), "heavy-hitter top-k fell back to global sort")
  }

  test("q62: sliding windows expand then partially aggregate") {
    // the 4×-expanded rows must shrink in a partial HashAggregate BEFORE
    // the exchange: in parent-first plan text that is
    // final agg → Exchange → partial agg → Expand
    val p = plan("q62_sliding_windows")
    val exch = p.indexOf("Exchange hashpartitioning")
    val expand = p.indexOf("Expand")
    val partialAgg = p.lastIndexOf("HashAggregate")
    assert(exch >= 0 && expand >= 0, "expand or hash exchange lost")
    assert(exch < partialAgg && partialAgg < expand,
      "partial aggregation does not sit between the exchange and the expand")
  }

  test("q53: prefix sum is the two-level scan, not one window per language") {
    val p = plan("q53_sequence_packing")
    // local pass + chunk-offset pass → two Window nodes over a range exchange
    assert("Window".r.findAllIn(p).length >= 2, "two-level scan collapsed to one window")
    assert(p.contains("Exchange rangepartitioning"), "order-contiguous chunking lost")
  }

  test("q63: lang predicate prunes partition directories at plan time") {
    // the point of the partitioned layout: the lang filter must land in
    // PartitionFilters (directory pruning), not only in data filters
    val p = plan("q63_partition_pruned")
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined,
      "lang predicate not in PartitionFilters — partitioned scan reads every directory")
  }

  test("q73: composed layout prunes brand directories at plan time") {
    // the partition half of the partitionKeys × zorderKeys composition;
    // ZOrderSpec pins the in-directory file-skipping half
    val p = plan("q73_partitioned_zorder")
    assert("PartitionFilters: \\[[^\\]]*p_brand".r.findFirstIn(p).isDefined,
      "brand predicate not in PartitionFilters — composed scan reads every directory")
  }

  test("q65: nearest as-of runs both directional scans over ONE hash exchange") {
    // the operator's scale contract: backward + forward carries are two
    // sorts of the SAME key-partitioned timeline — a second hashpartitioning
    // exchange would mean the union is being reshuffled per direction
    val p = plan("q65_asof_nearest")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 hash exchange for the merged timeline, got $hashEx")
    assert("Window".r.findAllIn(p).length >= 2, "both directional window scans expected")
  }

  test("q66: profiling all columns costs ONE scan (multi-distinct via Expand)") {
    val p = plan("q66_profile")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"profile re-scanned the table: $scans scans for 3 columns")
    assert(p.contains("Expand"), "multi-column distinct lost its Expand plan")
  }

  test("q74: derived keep rates broadcast onto the corpus — corpus never shuffle-joined") {
    val p = plan("q74_mixture_rebalance")
    assert(p.contains("BroadcastHashJoin"), "per-stratum rates should broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus rows must not shuffle to meet the tiny rates relation")
  }

  test("q89: the eval side broadcasts on the gram join, explicitly") {
    // the train corpus is the 100 TB side of this join; the eval suite is
    // bounded. The broadcast is now an explicit hint, not an AQE size
    // estimate — this pin fails if a refactor drops the hint and a
    // threshold change could silently shuffle the train postings.
    val p = plan("q89_ngram_decontamination")
    assert(p.contains("BroadcastHashJoin"),
      "eval-side gram join lost its broadcast")
  }

  test("clearCache leaves no cached plans behind (bench hygiene contract)") {
    SparkEntry.queries("q28_minhash_lsh")(spark, sf).count()
    assert(!spark.sharedState.cacheManager.isEmpty, "q28 should persist postings")
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "cache not empty after clearCache")
  }
}
