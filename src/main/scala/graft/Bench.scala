package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated subset (iteration / scale-curve runs);
    // absent or empty = the full registry, i.e. the driver contract
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
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
    def quiesce(): (Long, Long, Long) = {
      var prev = io.snap
      var i = 0
      while (i < 10) {
        Thread.sleep(100)
        val cur = io.snap
        if (cur == prev) return cur
        prev = cur; i += 1
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
      val (in0, sr0, sw0) = quiesce()
      resetPeaks()
      val gc0 = gcMillis
      val startEpoch = System.currentTimeMillis() / 1e3
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case NonFatal(e) =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - gc0) / 1e3
      val heapMb = peakHeapMb
      val (in1, sr1, sw1) = quiesce()
      spark.catalog.clearCache()
      Attempt(startEpoch, sec, err, gcSec, heapMb,
        (in1 - in0) >> 20, (sr1 - sr0) >> 20, (sw1 - sw0) >> 20)
    }
    // pass-major order: pass 1 runs q01..q90, then pass 2 runs q01..q90, ...
    val passes: Seq[Seq[(String, Attempt)]] = (1 to repeats).map { _ =>
      benched.map { case (name, fn) => (name, runOnce(fn)) }
    }
    val results = benched.map { case (name, _) =>
      val attempts = passes.map(_.find(_._1 == name).get._2)
      // a failing attempt never wins: prefer the fastest SUCCESSFUL attempt,
      // fall back to the fastest failure only if every attempt failed
      val ok = attempts.filter(_.err.isEmpty)
      val best = (if (ok.nonEmpty) ok else attempts).minBy(_.sec)
      val spread = attempts.map(_.sec).max / best.sec
      (name, best, spread, attempts)
    }
    // 3-decimal (ms) precision: the full-precision line for 71 queries is
    // ~3.4 KB and overflowed the driver's stdout tail window in round 4
    // (BENCH_r04.json parsed:null) — compactness is part of the contract
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) // '.' even under comma-decimal locales
    val qs = results.map { case (k, best, _, _) => JsonStr(k) + ":" + ms(best.sec) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, best, _, _) if best.err.isDefined =>
      JsonStr(k) + ":" + JsonStr(best.err.get)
    }.mkString("{", ",", "}")
    val total = results.map(_._2.sec).sum
    val gcTotal = results.map(_._2.gcSec).sum
    // the driver line stays compact (round-4 lesson: it must fit a stdout
    // tail window) — aggregate GC only here, per-query detail in the profile
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","gc_sec":${ms(gcTotal)},"best_of":$repeats,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    val profile = results.map { case (k, best, spread, attempts) =>
      // per-attempt (start, sec) pairs make a co-tenant load window directly
      // visible: slow attempts across many queries share a wall-clock band
      val att = attempts.map(a => s"""[${ms(a.startEpoch)},${ms(a.sec)}]""").mkString("[", ",", "]")
      JsonStr(k) + s""":{"sec":${ms(best.sec)},"spread":${ms(spread)},"gc_sec":${ms(best.gcSec)},"peak_heap_mb":${best.heapMb},"input_mb":${best.inMb},"shuffle_read_mb":${best.srMb},"shuffle_write_mb":${best.swMb},"attempts":$att}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROFILE", "BENCH_profile.json")),
      s"""{"sf":"$sfDir","best_of":$repeats,"interleaved":true,"total_sec":${ms(total)},"total_gc_sec":${ms(gcTotal)},"queries":$profile}""")
    spark.stop()
  }
}
