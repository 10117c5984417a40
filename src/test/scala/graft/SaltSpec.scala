package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt

/** Salted aggregation must equal the direct aggregation on skewed data,
  * and the partial phase must actually spread the hot key. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows carry one hot key
  private def skewed = spark.range(0, 10000)
    .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
      (col("id") % 7).cast("long").as("v"),
      col("id"))

  test("salted sum/count equals the direct groupBy") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), buckets = 8, sums = Seq("v"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct && direct.nonEmpty)
  }

  test("the hot key spreads over multiple salt buckets in phase one") {
    // uses the operator's own salt formula (Salt.saltCol), so a change to
    // the derivation that stops spreading the hot key fails here
    val spread = skewed
      .withColumn("__salt", Salt.saltCol(Seq("id"), 8))
      .filter(col("k") === 0)
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 buckets")
  }

  test("salting is deterministic under re-execution (hash, not rand)") {
    val a = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), 8, Seq("v")).collect().toSet
    val b = Salt.saltedSumCount(skewed, Seq("k"), Seq("id"), 8, Seq("v")).collect().toSet
    assert(a == b)
  }

  // small side: several rows per key, incl. keys with NO big-side match and
  // big-side keys with NO small-side match — the inner-join edge cases
  private def dim = spark.range(0, 150)
    .select((col("id") % 75).as("k"), concat(lit("d"), col("id")).as("tag"))

  test("salted join equals the plain inner join (dup keys + unmatched both sides)") {
    val expected = skewed.join(dim, Seq("k"))
      .select("k", "id", "tag").collect().toSet
    val got = Salt.saltedJoin(skewed, dim, "k", Seq("id"), buckets = 8)
      .select("k", "id", "tag").collect().toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("AQE skew-join rescues a bare join but NOT a join feeding a same-key agg") {
    // why this operator exists when AQE has skew-join handling: AQE's
    // OptimizeSkewedJoin refuses any split that would add a shuffle, so the
    // moment the join's output feeds an operator that needs the SAME key
    // partitioning (a groupBy on the join key — the join→aggregate pipeline
    // every enrichment query ends in), the hot partition stays whole. The
    // salted join spreads the hot key by CONSTRUCTION — the composite
    // (key, salt) exchange is in the plan regardless of AQE's validity
    // rules, and the downstream agg re-shuffles only tiny partials.
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // larger than `skewed` so the hot partition clears the (tiny) AQE
      // thresholds decisively
      val big = spark.range(0, 200000)
        .select(when(col("id") % 20 < 19, 0L).otherwise(col("id") % 100).as("k"),
          col("id"))
      // executing via the dataset's OWN QueryExecution is what drives the
      // AdaptiveSparkPlan to its final (re-optimized) form; count()/collect()
      // would execute a different plan and leave this one unfinalized
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        val qe = df.queryExecution
        qe.toRdd.count()
        qe.executedPlan.toString
      }
      val bare = finalPlan(big.join(dim, Seq("k")))
      assert(bare.contains("skew=true"),
        "probe broken: AQE did not split even the bare skewed join — thresholds ineffective")
      val agged = finalPlan(big.join(dim, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s")))
      assert(!agged.contains("skew=true"),
        "AQE now splits below a same-key agg — revisit whether saltedJoin is still needed")
      val salted = finalPlan(Salt.saltedJoin(big, dim, "k", Seq("id"), 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s")))
      assert("Exchange hashpartitioning\\(k#\\d+L?, __salt".r.findFirstIn(salted).isDefined,
        "salted join lost its composite (k, __salt) exchange under the agg")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join shuffles on (key, salt) and stays a shuffle join") {
    // the whole point: the exchange must partition on the COMPOSITE key so
    // the hot key's rows land on `buckets` reducers, and Catalyst must not
    // broadcast the replicated side (which would make the salt dead weight)
    val p = Salt.saltedJoin(skewed, dim, "k", Seq("id"), 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(k#\\d+L?, __salt".r.findFirstIn(p).isDefined,
      "join exchange does not partition on (k, __salt)")
    assert(p.contains("SortMergeJoin"), "salted join was not planned as a shuffle join")
    assert(!p.contains("BroadcastHashJoin"), "replicated side got broadcast anyway")
  }
}
