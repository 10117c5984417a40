package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regression pins for review findings on the engine internals: probe
  * opacity beyond the driver cap, branch-rebase retired-list carry, and
  * null-keyed MERGE sources.
  */
class EngineFixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("efx").toString + "/t"

  test("probeKeys detects opacity past the driver cap (whole-batch check)") {
    // 150k distinct numeric strings + a handful of opaque keys hiding
    // beyond the 100k sample cap: the probe must classify OPAQUE, not
    // numeric-range — a range would prune away the opaque keys' files
    val keys = spark.range(0, 150000).select($"id".cast("string").as("k"))
      .unionAll(Seq("doc-a", "doc-b", "doc-c").toDF("k"))
    Snapshots.probeKeys(keys, "k") match {
      case Snapshots.KeysOpaque => ()
      case other => fail(s"expected KeysOpaque, got $other")
    }
    // all-numeric past the cap still yields the range
    val numeric = spark.range(0, 150000).select($"id".cast("string").as("k"))
    Snapshots.probeKeys(numeric, "k") match {
      case Snapshots.KeysRange(lo, hi) => assert(lo === 0.0 && hi === 149999.0)
      case other => fail(s"expected KeysRange, got $other")
    }
  }

  test("publishRebase carries a branch-side dropColumn's retired names") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a", 10L)).toDF("id", "s", "x"), root)
    Branches.fork(spark, root, "b")
    val bRoot = Branches.root(root, "b")
    // branch drops x (metadata-only: every fork-base shard still carried)
    Snapshots.dropColumn(spark, bRoot, "x")
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), bRoot, append = true)
    // main advances concurrently — publish must rebase, not fast-forward
    Snapshots.commit(Seq((3L, "c", 30L)).toDF("id", "s", "x"), root, append = true)
    Branches.publishRebase(spark, root, "b")
    val head = Snapshots.headVersion(spark, root)
    assert(Snapshots.manifestMeta(spark, root, head).retired.nonEmpty,
      "the branch's retired physical name was lost on rebase — re-adding a " +
        "column named x would resurrect pre-drop values")
    Branches.drop(spark, root, "b")
  }

  test("mergeInto admits multiple null-keyed source rows as inserts") {
    val root = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root, statsCols = Seq("id"))
    // two null-keyed rows can never contend for a target row: NOT MATCHED,
    // both insert — not a cardinality violation
    val src = Seq((Some(2L), "b"), (None, "n1"), (None, "n2"))
      .toDF("id", "s")
    Snapshots.mergeInto(src, root, "id",
      Seq(MergeClause.Update(Map("s" -> col("s.s"))), MergeClause.Insert()),
      statsCols = Seq("id"))
    val got = Snapshots.read(spark, root).as[(Option[Long], String)].collect()
    assert(got.length === 4)
    assert(got.count(_._1.isEmpty) === 2, "null-keyed rows must both insert")
    // a REAL duplicate non-null key still refuses
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(Seq((Some(5L), "x"), (Some(5L), "y")).toDF("id", "s"),
        root, "id", Seq(MergeClause.Insert()), statsCols = Seq("id"))
    }
  }
}
