package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    // ---- wall-clock budget (round 19) ---------------------------------
    // The driver runs this main under a hard timeout; round 18's run sat
    // on a ~1.5x-slow shared host and the SECOND interleaved pass pushed
    // wall past the cap — rc 124, no artifact at all. A degraded artifact
    // beats a missing one, so passes after the first are admitted only
    // while the measured region fits the budget: before each extra pass
    // the previous pass's wall is the cost estimate, and a pass already
    // running is truncated at the first query past the budget. Pass 1
    // always completes (every query needs at least one timing — without
    // that there is nothing sound to emit). The budget covers only this
    // JVM's work; the env knob exists for local profile-folding runs,
    // which want every pass (set it large).
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    val budgetSec = sys.env.get("SPARK_GRAFT_BUDGET_SEC")
      .flatMap(_.toDoubleOption).filter(_ > 0).getOrElse(480.0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated subset (iteration / scale-curve runs);
    // absent or empty = the full registry, i.e. the driver contract
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // fingerprint the source FIRST — it must describe the code this run
    // measures, not whatever sits on disk when the run finishes (an
    // edit landing mid-run would otherwise mislabel the artifact).
    // Two granularities (round-15 verdict #3): the whole-tree hash is
    // provenance; the min fold below keys on PER-QUERY fingerprints —
    // hash(engine tree + the graft/queries files whose text holds the
    // query's name literal) — so a commit touching one query file (or
    // only tests/docs/this harness) no longer orphans every other
    // query's floor and noise regressions stop entering the artifact.
    val (srcFingerprint, queryFps): (String, Map[String, String]) = {
      import scala.jdk.CollectionConverters._
      def sha(parts: Seq[Array[Byte]]): String = {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        parts.foreach(md.update)
        md.digest().take(8).map(b => f"$b%02x").mkString
      }
      val srcRoot = java.nio.file.Paths.get("src/main/scala")
      if (!java.nio.file.Files.isDirectory(srcRoot)) ("nosrc", Map.empty)
      else {
        val files = java.nio.file.Files.walk(srcRoot).iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .toSeq.sortBy(_.toString)
          .map(p => p.toString.replace('\\', '/') ->
            java.nio.file.Files.readAllBytes(p))
        def hashOf(fs: Seq[(String, Array[Byte])]): String =
          sha(fs.flatMap { case (p, b) => Seq(p.getBytes("UTF-8"), b) })
        val whole = hashOf(files)
        val names = SparkEntry.queries.keys.toSeq.sorted
        // a query OWNS the graft/queries files whose text holds its name
        // literal (the registration site); query-dir files owning NO name
        // (shared plumbing like OracleQuery.scala) count as engine — an
        // edit there must invalidate every floor, not none
        val (qFiles, shared) = files.partition { case (p, b) =>
          p.contains("/graft/queries/") && {
            val text = new String(b, "UTF-8")
            names.exists(n => text.contains("\"" + n + "\""))
          }
        }
        // the measurement harness itself is NOT part of what a query
        // floor measures — a fold-logic or profile-schema edit here must
        // not invalidate engine floors (methodology changes that alter
        // the timed region should bump the name of this exclusion list)
        val isHarness = (p: String) =>
          p.endsWith("/graft/Bench.scala") || p.endsWith("/graft/Verify.scala") ||
            p.contains("/graft/diag/")
        val engineHash = hashOf(shared.filterNot { case (p, _) => isHarness(p) })
        val qTexts = qFiles.map { case (p, b) => (p, b, new String(b, "UTF-8")) }
        // precomputed once: ~140 lookups x 3 call sites otherwise re-scan
        // and re-hash every query file per call
        val fps = names.map { name =>
          val owning = qTexts.filter(_._3.contains("\"" + name + "\""))
          name -> {
            if (owning.isEmpty) whole // unlocatable: the conservative old key
            else sha(engineHash.getBytes("UTF-8") +: name.getBytes("UTF-8") +:
              owning.flatMap { case (p, b, _) => Seq(p.getBytes("UTF-8"), b) })
          }
        }.toMap
        (whole, fps)
      }
    }
    def queryFp(name: String): String = queryFps.getOrElse(name, srcFingerprint)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup on the BENCHED directory (q01's own plan): absorbs
    // JVM/codegen init plus this dataset's file listing and footer reads,
    // so the first timed query isn't charged for them
    SparkEntry.queries.get("q01_pricing_summary").foreach { f =>
      // NonFatal only: an OutOfMemoryError/LinkageError here means the JVM
      // is no longer trustworthy — let it abort rather than time garbage
      try { f(spark, sfDir).count(); spark.catalog.clearCache() }
      catch { case NonFatal(_) => () }
    }
    // per-query JVM pressure: GC wall time (sum over collectors) and peak
    // heap (max over heap pools, reset per query). This is how a "query X is
    // 2x slower in the full registry than in a subset run" report gets
    // attributed — to GC/codegen-cache churn vs the plan itself — without
    // bloating the driver's one-line contract (details go to a side file)
    import scala.jdk.CollectionConverters._
    import java.lang.management.ManagementFactory
    def gcMillis: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val heapPools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def resetPeaks(): Unit = heapPools.foreach(_.resetPeakUsage())
    def peakHeapMb: Long = heapPools.map(_.getPeakUsage.getUsed).sum >> 20

    // per-query I/O truth: scan bytes and shuffle bytes from stage metrics —
    // the measured form of the plan claims (a "shuffle-lean" operator should
    // SHOW near-zero shuffle bytes, not just a nice explain). Listener events
    // are asynchronous, so deltas are taken at quiescence (counters stable
    // for 100 ms), outside the timed region.
    val io = new org.apache.spark.scheduler.SparkListener {
      val in = new java.util.concurrent.atomic.AtomicLong
      val sr = new java.util.concurrent.atomic.AtomicLong
      val sw = new java.util.concurrent.atomic.AtomicLong
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          in.addAndGet(m.inputMetrics.bytesRead)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      def snap: (Long, Long, Long) = (in.get, sr.get, sw.get)
    }
    spark.sparkContext.addSparkListener(io)
    // Native-scan input attribution (round-15 verdict #3, tightened per
    // round-16 advice): Spark 4's vectorized parquet reader bypasses the
    // Hadoop FS statistics that feed task inputMetrics (measured: a full
    // 11 MB lineitem count reports ~17 KB), so native scans need a
    // plan-derived figure while DSv2 scans (whose readers open through
    // counted streams) report real measured bytes. The PLANNED figure is
    // the DELTA of a per-attempt accumulator fed by every execution the
    // attempt runs (registered below) — in-closure setup executions ARE
    // this query's I/O, exactly as the MEASURED deltas already treat
    // them, so a lake query that builds its own root no longer reads as
    // `input_mb: 0`. filesSize is post file-pruning but pre
    // row-group-pruning and pre column-projection: a native-scan row is
    // an upper bound on bytes touched, by design.
    def scanBytes(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanBytes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanBytes(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("filesSize").map(_.value).getOrElse(0L)
      case other =>
        // scalar/dynamic subqueries hold their own scans (DPP probes,
        // scalar aggregates) — they are part of this query's input
        (other.subqueries ++ other.children).map(scanBytes).sum
    }
    // Round 17 (round-16 verdict #6): native-scan bytes of EVERY execution
    // the attempt runs — not just the final plan — accumulate through a
    // QueryExecutionListener. Lake queries that build their root inside
    // the closure (q88/q140/q143) read their real input under plan trees
    // the final-plan sweep never sees, which reported as `input_mb: 0`
    // ("no IO"). The accumulator's delta spans exactly the attempt (reset
    // by delta-taking at the same quiesced boundaries as the measured
    // counters, which it joins below).
    val plannedAcc = new java.util.concurrent.atomic.AtomicLong
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        try plannedAcc.addAndGet(scanBytes(qe.executedPlan))
        catch { case NonFatal(_) => () } // diagnostics never fail a run
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    // counters must hold still for TWO consecutive checks (200 ms) and the
    // tail cap is 5 s: async stage-completion events from a long query can
    // otherwise smear its input_mb into the next query's delta (observed as
    // q03 input_mb:0 in subset runs). Fast queries still exit in ~200 ms.
    def quiesce(): (Long, Long, Long, Long) = {
      // the planned accumulator rides the same async listener bus as the
      // stage counters — both must hold still before a delta is honest
      def snap = { val (a, b, c) = io.snap; (a, b, c, plannedAcc.get) }
      var prev = snap
      var stable = 0
      var i = 0
      while (i < 50 && stable < 2) {
        Thread.sleep(100)
        val cur = snap
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        i += 1
      }
      prev
    }

    // name-sorted so runs are comparable; caches cleared between queries
    // (outside the timed region) so one query's persists never pollute the
    // next one's timing
    val benched = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // best-of-N per query, with the N attempts INTERLEAVED as N full passes
    // over the registry rather than back-to-back retries. This host is
    // shared, and co-tenant load arrives as sustained multi-minute windows:
    // back-to-back attempts of one query both sit inside the same window, so
    // the per-query min is still inflated 10-100x (round 7: a contiguous
    // q54-q62 block charged ~341 s with spread ~1.0 — BOTH attempts slow —
    // where re-runs measured ~5 s). Running the whole registry per pass
    // separates a query's attempts by ~a full registry duration, so one load
    // window can cover at most one of them. Cold-cache contract per attempt
    // (caches cleared after each query); reported time = per-query MIN across
    // passes; the max/min spread AND each attempt's wall-clock start go to
    // the profile so a load window is directly visible as a contiguous band
    // of slow attempts sharing a time range.
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(2)
    case class Attempt(startEpoch: Double, sec: Double, err: Option[String],
                       gcSec: Double, heapMb: Long, inMb: Long, srMb: Long, swMb: Long)
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Attempt = {
      val (in0, sr0, sw0, pl0) = quiesce()
      resetPeaks()
      val gc0 = gcMillis
      val startEpoch = System.currentTimeMillis() / 1e3
      val t0 = System.nanoTime()
      val err =
        try {
          fn(spark, sfDir).groupBy().count().collect()
          None
        }
        catch { case NonFatal(e) =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - gc0) / 1e3
      val heapMb = peakHeapMb
      val (in1, sr1, sw1, pl1) = quiesce()
      val planned = pl1 - pl0 // every execution this attempt ran, final included
      spark.catalog.clearCache()
      // measured (DSv2 readers count through FS statistics) vs planned
      // (native scans' post-pruning filesSize): the larger is the honest one
      Attempt(startEpoch, sec, err, gcSec, heapMb,
        math.max(in1 - in0, planned) >> 20, (sr1 - sr0) >> 20, (sw1 - sw0) >> 20)
    }
    // pass-major order: pass 1 runs q01..q90, then pass 2 runs q01..q90, ...
    // Pass 1 is unconditional; later passes respect the wall budget —
    // `degraded` marks an artifact whose best-of lost passes to the clock.
    var degraded = false
    // a pass that stops mid-way once the budget trips: the queries it DID
    // reach still contribute attempts (bestOf folds variable counts)
    def runPassBudgeted(): Seq[(String, Attempt)] = {
      val out = Seq.newBuilder[(String, Attempt)]
      val it = benched.iterator
      var stop = false
      while (it.hasNext && !stop) {
        val (name, fn) = it.next()
        out += ((name, runOnce(fn)))
        if (elapsedSec > budgetSec) { stop = true; degraded = true }
      }
      out.result()
    }
    // estimate of the NEXT pass's wall cost = the last full pass's wall
    // (pass 1's includes warmup/startup — a conservative overestimate)
    var lastPassSec = 0.0
    var passes: Seq[Seq[(String, Attempt)]] =
      Seq(benched.map { case (name, fn) => (name, runOnce(fn)) })
    lastPassSec = elapsedSec
    for (_ <- 2 to repeats) {
      if (degraded || elapsedSec + lastPassSec > budgetSec) degraded = true
      else {
        val t = elapsedSec
        passes = passes :+ runPassBudgeted()
        lastPassSec = elapsedSec - t
      }
    }
    def bestOf(attempts: Seq[Attempt]): Attempt = {
      // a failing attempt never wins: prefer the fastest SUCCESSFUL attempt,
      // fall back to the fastest failure only if every attempt failed
      val ok = attempts.filter(_.err.isEmpty)
      (if (ok.nonEmpty) ok else attempts).minBy(_.sec)
    }
    // ---- noise-accept gate (round-13 verdict #1) ----------------------
    // Sentinel queries with committed quiet-box floors: when this run's
    // sentinel band (median best/floor over the sentinels present) exceeds
    // GateBar, the whole run sat under co-tenant load — interleaving spreads
    // a *windowed* spike across passes but cannot defend against a load band
    // covering the entire run (that is exactly how the r13 artifact came out
    // 27% inflated). Remedy: run extra full passes (per-query min folds them
    // in) until the band clears or the retry budget is spent; either way the
    // band and verdict are stamped into both artifacts so an inflated run is
    // self-identifying instead of masquerading as a regression.
    val GateBar = 1.5
    // floors are keyed by sf basename — they are quiet-box measurements at a
    // specific scale, so the gate arms only when benching that scale (the
    // driver contract runs sf0.1; curve runs at other SFs stay ungated)
    val floors: Map[String, Double] = {
      val p = java.nio.file.Paths.get("tools/bench_floors.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper
        val m = om.readValue(p.toFile, classOf[java.util.Map[String, Object]])
        val sfKey = java.nio.file.Paths.get(sfDir).getFileName.toString
        m.asScala.get(sfKey) match {
          case Some(qm: java.util.Map[_, _]) =>
            qm.asScala.map { case (k, v) => k.toString -> v.toString.toDouble }.toMap
          case _ => Map.empty
        }
      } catch { case NonFatal(_) => Map.empty }
    }
    def attemptsOf(name: String): Seq[Attempt] =
      passes.flatMap(_.find(_._1 == name)).map(_._2)
    def sentinelBand: Option[Double] = {
      val ratios = benched.flatMap { case (name, _) =>
        floors.get(name).map { floor =>
          bestOf(attemptsOf(name)).sec / math.max(floor, 1e-3)
        }
      }.sorted
      if (ratios.isEmpty) None else Some(ratios(ratios.size / 2))
    }
    val maxExtraPasses =
      sys.env.get("SPARK_GRAFT_GATE_RETRIES").flatMap(_.toIntOption).getOrElse(2)
    var extra = 0
    // noise-retry passes respect the same budget as the repeat passes: a
    // load-inflated run on a slow host must still produce an artifact
    while (sentinelBand.exists(_ > GateBar) && extra < maxExtraPasses &&
        !degraded && elapsedSec + lastPassSec <= budgetSec) {
      extra += 1
      val t = elapsedSec
      passes = passes :+ runPassBudgeted()
      lastPassSec = elapsedSec - t
    }
    val band = sentinelBand
    val loadOk = band.forall(_ <= GateBar)
    val results = benched.map { case (name, _) =>
      val attempts = attemptsOf(name)
      val best = bestOf(attempts)
      val spread = attempts.map(_.sec).max / best.sec
      (name, best, spread, attempts)
    }
    // ---- provenance (round-13 verdict #7) -----------------------------
    // head: the git commit this run measured (archaeology-free cross-round
    // comparison). src_fingerprint: a hash of src/main/scala CONTENT — the
    // fold key below — so committing the artifact itself (which moves HEAD
    // but touches no source) does not orphan the floors it records.
    val gitHead: String =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
      } catch { case NonFatal(_) => "unknown" }
    // ---- same-code min fold (round-13 verdict #1, the curve's documented
    // min methodology applied to the registry artifact) ------------------
    // If the profile path already holds a run of the same sf, each query
    // whose PER-QUERY fingerprint matches folds to the min of the prior
    // floor and this run (round-16: the fold used to key on the whole-tree
    // hash, so any commit orphaned every floor and noise regressions in
    // untouched files entered the committed artifact). A later
    // load-inflated run can only confirm or improve a floor, never
    // overwrite it with noise. Errors are never hidden — a query whose
    // current best failed keeps its failure.
    val profilePath =
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROFILE", "BENCH_profile.json"))
    val (priorSecs, priorRuns, priorEntries, priorWholeMatch): (Map[String, Double],
        Int, Map[String, java.util.Map[String, Object]], Boolean) =
      if (!java.nio.file.Files.exists(profilePath)) (Map.empty, 0, Map.empty, false)
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper
        val m = om.readValue(profilePath.toFile, classOf[java.util.Map[String, Object]])
        // floors are per (sf, core count): round 19's 8-core scaling run
        // folded against the 32-core floors the main run had just written,
        // so its printed line was the other run's numbers (q91-q99
        // bit-identical across the two artifacts). A prior profile at a
        // different cpus contributes nothing — no fold, no carry. Legacy
        // profiles without the field are treated as same-cpus (they all
        // predate scaling runs that reuse a profile).
        val cpusOk = Option(m.get("cpus")).forall(c => String.valueOf(c) == cpus)
        if (String.valueOf(m.get("sf")) != sfDir || !cpusOk) (Map.empty, 0, Map.empty, false)
        else {
          val wholeMatch = String.valueOf(m.get("src_fingerprint")) == srcFingerprint
          val qm = m.get("queries").asInstanceOf[java.util.Map[String, Object]].asScala
          // a prior FAILED attempt's sec is not a floor: a fast failure
          // would understate a now-passing query forever (profiles stamp
          // "err" per query since round 15; legacy rows without the field
          // were all-success artifacts). A row without "fp" (pre-round-16
          // artifact) folds only under the old whole-tree rule.
          val secs = qm.flatMap { case (k, v) =>
            val entry = v.asInstanceOf[java.util.Map[String, Object]]
            val fpOk = Option(entry.get("fp")) match {
              case Some(fp) => fp.toString == queryFp(k)
              case None => wholeMatch
            }
            if (entry.get("err") != null || !fpOk) None
            else Option(entry.get("sec")).map(s => k -> s.toString.toDouble)
          }.toMap
          // runs counts artifacts actually folded in: a prior profile
          // contributing zero floors (every fp orphaned) resets to 0
          val runs =
            if (secs.isEmpty) 0
            else Option(m.get("folded_runs")).map(_.toString.toInt).getOrElse(1)
          val entries = qm.map { case (k, v) =>
            k -> v.asInstanceOf[java.util.Map[String, Object]] }.toMap
          (secs, runs, entries, wholeMatch)
        }
      } catch { case NonFatal(_) => (Map.empty, 0, Map.empty, false) }
    val folded = results.map { case (k, best, spread, attempts) =>
      val sec =
        if (best.err.isEmpty) priorSecs.get(k).map(math.min(_, best.sec)).getOrElse(best.sec)
        else best.sec
      (k, best, sec, spread, attempts)
    }
    // 3-decimal (ms) precision: the full-precision line for 71 queries is
    // ~3.4 KB and overflowed the driver's stdout tail window in round 4
    // (BENCH_r04.json parsed:null) — compactness is part of the contract
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) // '.' even under comma-decimal locales
    val qs = folded.map { case (k, _, sec, _, _) => JsonStr(k) + ":" + ms(sec) }
      .mkString("{", ",", "}")
    val errs = folded.collect { case (k, best, _, _, _) if best.err.isDefined =>
      JsonStr(k) + ":" + JsonStr(best.err.get)
    }.mkString("{", ",", "}")
    val total = folded.map(_._3).sum
    val gcTotal = results.map(_._2.gcSec).sum
    val bandJson = band.map(b => s""","sentinel_band":${ms(b)},"load_ok":$loadOk""").getOrElse("")
    // degraded: the wall budget cost this run some of its passes — the
    // numbers are best-of-fewer, biased high, and a reader comparing
    // rounds should prefer a non-degraded artifact of the same head
    val degJson = if (degraded) ""","degraded":true""" else ""
    // Two output lines (round-19 verdict #1). The FULL line (queries map
    // included) comes first — for humans and files; at 155 queries it is
    // ~5 KB and can never fit the driver's 2000-char stdout tail, which is
    // why every BENCH_r*.json since round 4 has parsed:null. The LAST line
    // printed is a compact totals line that always fits the tail window;
    // the per-query map additionally goes to a stable side file
    // (BENCH_queries.json next to the profile) the driver/judge can read.
    val fullLine = s"""{"metric":"total","value":${ms(total)},"unit":"sec","gc_sec":${ms(gcTotal)},"best_of":${passes.size}$degJson$bandJson,"head":${JsonStr(gitHead)},"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(fullLine)
    val queriesPath = profilePath.resolveSibling("BENCH_queries.json")
    java.nio.file.Files.writeString(queriesPath,
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","cpus":$cpus,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    val nErrors = folded.count(_._2.err.isDefined)
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","gc_sec":${ms(gcTotal)},"best_of":${passes.size}$degJson$bandJson,"n_queries":${folded.size},"n_errors":$nErrors,"queries_file":"${queriesPath.getFileName}","head":${JsonStr(gitHead)},"sf":"$sfDir"}""")
    val benchedNames = benched.map(_._1).toSet
    // a SUBSET run (SPARK_GRAFT_ONLY) must not orphan the rest of the
    // registry: prior entries whose per-query fingerprint still matches
    // the current code carry through verbatim — subset re-runs become a
    // cheap way to improve one query's floor without losing the others
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    val carried = priorEntries.toSeq
      .filter { case (k, e) =>
        // same acceptance rule as the fold: a legacy row (no "fp") is
        // current iff the whole tree matched — dropping it here would be
        // the very orphaning this carry exists to prevent
        !benchedNames.contains(k) && (Option(e.get("fp")) match {
          case Some(fp) => String.valueOf(fp) == queryFp(k)
          case None => priorWholeMatch
        }) }
      .sortBy(_._1)
    val carriedJson =
      carried.map { case (k, e) => JsonStr(k) + ":" + om.writeValueAsString(e) }
    // the profile total covers everything it records, carried included
    val profileTotal = total + carried.flatMap { case (_, e) =>
      Option(e.get("sec")).map(_.toString.toDouble) }.sum
    val profile = (folded.map { case (k, best, sec, spread, attempts) =>
      // per-attempt (start, sec) pairs make a co-tenant load window directly
      // visible: slow attempts across many queries share a wall-clock band
      val att = attempts.map(a => s"""[${ms(a.startEpoch)},${ms(a.sec)}]""").mkString("[", ",", "]")
      val errField = best.err.fold("")(e => s""""err":${JsonStr(e)},""")
      JsonStr(k) + s""":{$errField"fp":${JsonStr(queryFp(k))},"sec":${ms(sec)},"run_sec":${ms(best.sec)},"spread":${ms(spread)},"gc_sec":${ms(best.gcSec)},"peak_heap_mb":${best.heapMb},"input_mb":${best.inMb},"shuffle_read_mb":${best.srMb},"shuffle_write_mb":${best.swMb},"attempts":$att}"""
    } ++ carriedJson).mkString("{", ",", "}")
    java.nio.file.Files.writeString(profilePath,
      s"""{"sf":"$sfDir","cpus":$cpus,"best_of":${passes.size},"interleaved":true$degJson,"head":${JsonStr(gitHead)},"src_fingerprint":${JsonStr(srcFingerprint)},"folded_runs":${priorRuns + 1}$bandJson,"total_sec":${ms(profileTotal)},"total_gc_sec":${ms(gcTotal)},"queries":$profile}""")
    spark.stop()
  }
}
