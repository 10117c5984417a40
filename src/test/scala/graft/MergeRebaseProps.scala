package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.engine.Snapshots

/** Property check for the conflict-validated merge rebase: across random
  * (racer, merge) interleavings injected at the pre-publish seam, EITHER
  * the merge publishes and the final table equals the SERIAL schedule
  * (racer first, then the merge upsert) — the definition of a sound
  * rebase — OR it throws ConcurrentCommitException and a plain recompute
  * retry converges to the same serial answer. No third outcome, no lost
  * update, ever.
  */
class MergeRebaseProps extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("mrp").toString + "/t"

  /** Reference semantics on plain maps: upsert by key. */
  private def upsert(base: Map[Long, Long], batch: Map[Long, Long]): Map[Long, Long] =
    base ++ batch

  private def tableState(root: String): Map[Long, Long] =
    Snapshots.read(spark, root).as[(Long, Long)].collect().toMap

  private def df(m: Map[Long, Long]): DataFrame =
    m.toSeq.toDF("id", "v")

  test("random racer interleavings: rebase ≡ serial, refusal ≡ clean retry") {
    val rnd = new Random(20260814L)
    var rebased = 0
    var refused = 0
    for (trial <- 1 to 18) {
      val root = tmp()
      val base = (0L until 40L).map(k => k -> (k * 10)).toMap
      Snapshots.commit(df(base).repartitionByRange(3, $"id"), root,
        statsCols = Seq("id"))

      // the merge's batch: 1-3 keys, mixing updates and fresh inserts
      val mergeKeys = Seq.fill(1 + rnd.nextInt(3))(
        if (rnd.nextBoolean()) rnd.nextInt(40).toLong else 100L + rnd.nextInt(20))
        .distinct
      val mergeBatch = mergeKeys.map(k => k -> (k * 1000 + trial)).toMap

      // the racer: one of four interleaved operations
      val racerKind = rnd.nextInt(4)
      val racerBatch: Map[Long, Long] = racerKind match {
        case 0 => // disjoint append (fresh high keys)
          Seq.fill(2)(200L + rnd.nextInt(50)).distinct
            .filterNot(mergeBatch.contains).map(k => k -> (k + 7)).toMap
        case 1 => // append that MAY overlap the merge's keys
          Seq(mergeKeys(rnd.nextInt(mergeKeys.size)))
            .map(k => k -> (k + 9)).toMap
        case 2 => // concurrent merge on other keys (may share files)
          Seq(50L + rnd.nextInt(10)).map(k => k -> (k + 3)).toMap
        case _ => Map.empty // compaction
      }
      var racerRan = false
      Snapshots.testPrePublishHook = () => {
        Snapshots.testPrePublishHook = () => ()
        racerRan = true
        racerKind match {
          case 0 | 1 => Snapshots.commit(df(racerBatch), root, append = true,
            statsCols = Seq("id"))
          case 2 => Snapshots.merge(df(racerBatch), root, "id",
            statsCols = Seq("id"))
          case _ => Snapshots.compact(spark, root, targetFiles = 1,
            statsCols = Seq("id"))
        }
      }

      // serial truth: base, then the racer's effect, then the merge upsert
      val afterRacer = racerKind match {
        case 0 | 1 => base ++ racerBatch // append adds rows; duplicate keys
          // would multiset — model appends as upserts only when keys fresh:
          // overlapping appends make the table multi-valued per key, which
          // the rebase must REFUSE (validated below), so the serial map is
          // only consulted on non-overlapping paths
        case 2 => upsert(base, racerBatch)
        case _ => base
      }
      val serial = upsert(afterRacer, mergeBatch)

      try {
        try {
          Snapshots.merge(df(mergeBatch), root, "id", statsCols = Seq("id"))
          rebased += 1
          assert(racerRan, s"trial $trial: hook never fired")
          // the racer's append overlapping a merge key would DUPLICATE the
          // key post-merge — acceptance is only sound when that cannot
          // happen, so on acceptance the table must be exactly the serial
          // upsert (unique keys included)
          val got = Snapshots.read(spark, root).as[(Long, Long)].collect()
          assert(got.map(_._1).distinct.length === got.length,
            s"trial $trial: duplicate keys after an accepted rebase")
          assert(got.toMap === serial,
            s"trial $trial (racer $racerKind): accepted rebase diverged from serial")
        } catch {
          case _: Snapshots.ConcurrentCommitException =>
            refused += 1
            // the documented recovery: recompute against the new head —
            // a plain retry must land and converge to the serial answer
            Snapshots.merge(df(mergeBatch), root, "id", statsCols = Seq("id"))
            val got = tableState(root)
            // after a refused-and-retried merge the upsert semantics hold
            // for every merge key, and racer/base rows survive untouched
            mergeBatch.foreach { case (k, v) =>
              assert(got(k) === v, s"trial $trial: retry lost merge key $k")
            }
            (afterRacer -- mergeBatch.keySet).foreach { case (k, v) =>
              assert(got(k) === v, s"trial $trial: retry lost non-merge key $k")
            }
        }
      } finally Snapshots.testPrePublishHook = () => ()
    }
    // the generator must actually exercise both paths
    assert(rebased > 0, "no trial took the rebase path")
    assert(refused > 0, "no trial took the refusal path")
    info(s"rebased $rebased, refused $refused of 18 trials")
  }
}
