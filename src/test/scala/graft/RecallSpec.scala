package graft

/** Measured ANN recall — "measure, don't guess" for the approximate
  * similarity family: each ANN variant's top-5 against the exact
  * brute-force top-5 (q30) on the same query set. Pins (a) the structural
  * guarantee that nprobe=2's candidate superset can only improve on
  * nprobe=1, and (b) a floor under each variant's measured recall so a
  * silent candidate-generation regression (wrong band key, broken cell
  * assignment, truncated shortlist) fails loudly. Absolute recall targets
  * are a tuning choice (bands/probes/codebooks trade recall for cost);
  * the floors sit just under the measured values at this SF.
  */
class RecallSpec extends SparkSpec {

  private def topk(name: String, dir: String = sf): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, dir)
      .select("query_id", "cand_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val exact = topk("q30_cosine_topk")

  /** Mean per-query recall@5 vs the exact top-5. Queries the variant
    * returns nothing for count as zero recall (candidate starvation is a
    * recall failure, not a skip). */
  private def recallVs(ex: Map[Long, Set[Long]], name: String, dir: String): Double = {
    val approx = topk(name, dir)
    val per = ex.map { case (q, e) =>
      approx.get(q).map(a => a.intersect(e).size.toDouble / e.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  private def recall(name: String): Double = recallVs(exact, name, sf)

  test("IVF nprobe=2 recall dominates nprobe=1 (candidate superset)") {
    val r1 = recall("q43_ann_ivf")
    val r2 = recall("q52_ann_ivf_probe2")
    info(f"recall@5: ivf nprobe=1 $r1%.3f, nprobe=2 $r2%.3f")
    assert(r2 >= r1, "nprobe=2 candidates contain nprobe=1's — recall cannot drop")
  }

  test("each ANN variant clears its measured recall floor") {
    val measured = Seq(
      "q31_ann_lsh" -> 0.55,        // 4 tables × 8 planes + multi-probe
                                    // (home + Hamming-1 + margin-ordered
                                    // Hamming-2; measured 0.64 — was 0.12
                                    // single-bucket). See the sf0.1 test
                                    // for why this corpus is hard for
                                    // hyperplane codes
      "q43_ann_ivf" -> 0.50,        // nearest cell only (measured 0.60)
      "q52_ann_ivf_probe2" -> 0.60, // + second cell (measured 1.00)
      "q80_pq_adc" -> 0.70,         // 8×64 codebook ADC + exact rerank of a
                                    // 60-shortlist (measured 0.84)
      "q102_ann_ivfpq" -> 0.75)     // IVF(nprobe=5) cells + in-cell ADC +
                                    // rerank (measured 0.84)
    measured.foreach { case (name, floor) =>
      val r = recall(name)
      info(f"recall@5 $name: $r%.3f (floor $floor)")
      assert(r >= floor, f"$name recall $r%.3f fell under $floor — candidate generation regressed")
    }
  }

  test("recall at sf0.1: the populated-bucket point of the recall-vs-cost curve") {
    // sf0.1 (2000 vectors, 4× sf0.001) is the first point where buckets
    // are genuinely populated — measured, not extrapolated. The numbers
    // REFUTED the earlier "recall rises with density" guess: this corpus's
    // exact top-5 sit at cosine ≈ 0.38 (mean; p25 0.35, p75 0.40), a
    // weak-similarity regime where a random hyperplane agrees with a true
    // neighbor only ~62% per bit — so 8-bit buckets separate true
    // neighbors almost as often as strangers (LSH 0.12 → 0.08 moving up a
    // SF), and seed-centroid cells split near-border neighbors (IVF1 0.60
    // → 0.34, IVF2 1.00 → 0.44). The variant that HOLDS under weak
    // similarity is PQ-ADC + exact rerank (0.84 → 0.70): its candidate
    // stage scores every code (no bucket to miss) and quantization error
    // only has to keep true neighbors inside the 60-deep shortlist. That
    // is the recall-vs-cost story at 100 TB: bucketed variants buy their
    // speed with recall exactly where similarity is weak; ADC pays a full
    // (cheap, 8-add) scan to keep recall, and the rerank bounds its cost.
    val dir = "/root/testdata/sf0.1"
    val ex = topk("q30_cosine_topk", dir)
    val measured = Seq(
      "q31_ann_lsh" -> 0.40,        // measured 0.43 (multi-probe; 0.08
                                    // single-bucket — the round-8 target
                                    // was ≥0.4 at sf0.1, met by probing
                                    // Hamming-≤2 neighbor buckets instead
                                    // of adding tables)
      "q43_ann_ivf" -> 0.25,        // measured 0.34
      "q52_ann_ivf_probe2" -> 0.35, // measured 0.44
      "q80_pq_adc" -> 0.55,         // measured 0.70
      "q102_ann_ivfpq" -> 0.55)     // measured 0.59 — the hybrid keeps the
                                    // round-9 ≥0.55 target while scanning
                                    // probed cells only (5 of the cell
                                    // count, vs q80's full-corpus ADC):
                                    // the candidate stage loses the
                                    // out-of-cell border neighbors IVF
                                    // always loses, the in-cell ADC +
                                    // 60-shortlist + exact rerank keeps
                                    // nearly everything the cells contain
    measured.foreach { case (name, floor) =>
      val r = recallVs(ex, name, dir)
      info(f"recall@5 $name @sf0.1: $r%.3f (floor $floor)")
      assert(r >= floor, f"$name recall $r%.3f fell under $floor at sf0.1")
    }
  }
}
