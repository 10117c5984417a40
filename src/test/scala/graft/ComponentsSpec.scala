package graft

import graft.operators.Components

/** Hash-min connected components: transitive closure over chains (labels
  * must PROPAGATE, not just hop once), disjoint components stay apart,
  * edge orientation/duplication is irrelevant, and no cache entry outlives
  * the call.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains resolve transitively; disjoint components keep separate minima") {
    // 1-2-3-4 is a diameter-3 chain: vertex 4 learns label 1 only through
    // repeated rounds; 10-11 is a separate pair
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 10L), (3L, 2L))
      .toDF("x", "y")
    val got = Components.connected(edges, "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("no cache entry outlives the call (per-round persists released)") {
    spark.catalog.clearCache()
    val edges = Seq((5L, 6L), (6L, 7L)).toDF("x", "y")
    val got = Components.connected(edges, "x", "y").as[(Long, Long)].collect().toSet
    assert(got == Set((5L, 5L), (6L, 5L), (7L, 5L)))
    assert(spark.sharedState.cacheManager.isEmpty,
      "Components leaked per-round label relations into the cache manager")
  }

  test("plan depth stays constant across rounds (per-round lineage truncation)") {
    // a 40-edge path forces ~40 propagation rounds; without per-round
    // localCheckpoint the result plan nests one join+aggregate per round
    // (AQE re-plans and stringifies that tree per action — quadratic cost,
    // then a driver StackOverflowError once deep enough, which is exactly
    // how the sf0.1 bench caught it)
    val chain = (1L to 40L).map(i => (i, i + 1)).toDF("x", "y")
    val res = Components.connected(chain, "x", "y")
    val planLines = res.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines < 10, s"plan is $planLines lines deep — lineage not truncated")
    val labels = res.as[(Long, Long)].collect()
    assert(labels.length == 41 && labels.forall(_._2 == 1L))
  }

  test("diameter beyond maxRounds fails loudly instead of returning garbage") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      Components.connected(chain, "x", "y", maxRounds = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("connectedStars matches hash-min on chains, stars, and isolated pairs") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 10L),
      (3L, 2L), (20L, 20L), (7L, 21L), (7L, 22L), (7L, 23L))
      .toDF("x", "y")
    val viaStars = Components.connectedStars(edges, "x", "y")
      .as[(Long, Long)].collect().toSet
    val viaHashMin = Components.connected(edges, "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(viaStars == viaHashMin)
    assert(viaStars.contains((20L, 20L)), "self-loop-only vertex lost")
  }

  test("connectedStars resolves a long chain in far fewer than diameter rounds") {
    // a 64-hop path needs 64 hash-min rounds but only O(log) star rounds;
    // maxRounds=10 would fail hash-min and must succeed here
    val chain = (1L to 64L).map(i => (i, i + 1)).toDF("x", "y")
    val labels = Components.connectedStars(chain, "x", "y", maxRounds = 10)
      .as[(Long, Long)].collect()
    assert(labels.length == 65 && labels.forall(_._2 == 1L))
  }

  test("merge folds a new batch into labels ≡ batch recompute (property sweep)") {
    val rnd = new scala.util.Random(1729)
    for (trial <- 1 to 5) {
      val n1 = 20 + rnd.nextInt(30)
      val n2 = 10 + rnd.nextInt(20)
      val e1 = Seq.fill(n1)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("x", "y")
      val e2 = Seq.fill(n2)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).toDF("x", "y")
      val incremental = Components.merge(Components.connected(e1, "x", "y"), e2, "x", "y")
        .as[(Long, Long)].collect().toSet
      val batch = Components.connected(e1.unionByName(e2), "x", "y")
        .as[(Long, Long)].collect().toSet
      assert(incremental == batch, s"trial $trial: merge diverged from full recompute")
    }
  }

  test("merge on compressed labels converges where raw-edge replay cannot") {
    // two 30-hop chains: labeling them compresses each to a star, so a
    // bridging batch edge makes a diameter-~4 graph that merge resolves in
    // a constant handful of rounds — while replaying the RAW edge list with
    // the same round budget must fail (diameter ~60). This is the point of
    // merging into the compressed graph.
    val chainA = (1L to 30L).map(i => (i, i + 1)).toDF("x", "y")
    val chainB = (101L to 130L).map(i => (i, i + 1)).toDF("x", "y")
    val bridge = Seq((31L, 101L)).toDF("x", "y")
    val labels = Components.connected(chainA.unionByName(chainB), "x", "y")
    val merged = Components.merge(labels, bridge, "x", "y", maxRounds = 8)
      .as[(Long, Long)].collect()
    assert(merged.length == 62 && merged.forall(_._2 == 1L))
    val e = intercept[IllegalArgumentException](Components.connected(
      chainA.unionByName(chainB).unionByName(bridge), "x", "y", maxRounds = 8))
    assert(e.getMessage.contains("converge"))
  }

  test("changed-count is fused into the checkpoint (≤2 jobs per round)") {
    // the per-round action budget is the scale contract: the lazy
    // checkpoint makes the changed-count job the one that materializes the
    // round (plus localCheckpoint's small internal finalize job), where an
    // eager checkpoint + separate count costs 3 jobs/round — measured 19
    // vs 13 on this exact graph when the fusion shipped
    val sc = spark.sparkContext
    // AQE splits one action into several stage-materialization jobs, which
    // would swamp the signal; with it off, one action == one job
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-job-budget", "count jobs per round")
    try {
      // diameter-4 chain → 4 propagation rounds + 1 converged round
      val chain = (1L to 5L).map(i => (i, i + 1)).toDF("x", "y")
      Components.connected(chain, "x", "y")
    } finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
    // the status store is fed asynchronously — poll until the count settles
    def groupJobs() = sc.statusTracker.getJobIdsForGroup("cc-job-budget").length
    var last = -1
    var cur = groupJobs()
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (cur != last && System.nanoTime() < deadline) {
      last = cur; Thread.sleep(200); cur = groupJobs()
    }
    // 5 rounds × ≤2 jobs + ≤3 init jobs (vertex checkpoint, edge persist);
    // the pre-fusion shape (3 jobs/round) lands at ~19 and must fail here
    assert(cur <= 14, s"$cur jobs for a 5-round propagation — count not fused into checkpoint")
    assert(cur >= 8, s"only $cur jobs — the chain did not drive 5 rounds")
  }

  test("connectedStars on random graphs equals hash-min (property sweep)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .toDF("x", "y")
      val s = Components.connectedStars(edges, "x", "y").as[(Long, Long)].collect().toSet
      val h = Components.connected(edges, "x", "y").as[(Long, Long)].collect().toSet
      assert(s == h, s"trial $trial diverged")
    }
  }
}
