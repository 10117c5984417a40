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

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "cand_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val exact = topk("q30_cosine_topk")

  /** Mean per-query recall@5 vs the exact top-5. Queries the variant
    * returns nothing for count as zero recall (candidate starvation is a
    * recall failure, not a skip). */
  private def recall(name: String): Double = {
    val approx = topk(name)
    val per = exact.map { case (q, ex) =>
      approx.get(q).map(a => a.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("IVF nprobe=2 recall dominates nprobe=1 (candidate superset)") {
    val r1 = recall("q43_ann_ivf")
    val r2 = recall("q52_ann_ivf_probe2")
    info(f"recall@5: ivf nprobe=1 $r1%.3f, nprobe=2 $r2%.3f")
    assert(r2 >= r1, "nprobe=2 candidates contain nprobe=1's — recall cannot drop")
  }

  test("each ANN variant clears its measured recall floor") {
    val measured = Seq(
      "q31_ann_lsh" -> 0.05,        // 8 hyperplanes = 256 buckets: at this
                                    // tiny SF buckets hold ~2 vectors, so
                                    // candidate starvation dominates —
                                    // recall rises with density (more
                                    // vectors per bucket), cost with it
      "q43_ann_ivf" -> 0.50,        // nearest cell only
      "q52_ann_ivf_probe2" -> 0.60, // + second cell
      "q80_pq_adc" -> 0.40)         // 8x16 codebook ADC + exact rerank of a
                                    // 20-shortlist; quantization error caps
                                    // recall until the codebook grows
    measured.foreach { case (name, floor) =>
      val r = recall(name)
      info(f"recall@5 $name: $r%.3f (floor $floor)")
      assert(r >= floor, f"$name recall $r%.3f fell under $floor — candidate generation regressed")
    }
  }
}
