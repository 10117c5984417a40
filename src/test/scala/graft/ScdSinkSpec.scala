package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.engine.{Scd, Snapshots}

/** Streaming SCD2 sink: kill/restart mid-feed yields the exact batch-fold
  * history, replays are no-ops, and the as-of enrich contract holds on the
  * streamed dimension.
  */
class ScdSinkSpec extends SparkSpec {
  import spark.implicits._

  test("restart mid-feed: streamed dimension history ≡ the batch fold") {
    val base = java.nio.file.Files.createTempDirectory("scdsink").toString
    val srcDir = s"$base/src"
    val ck = s"$base/ckpt"
    val root = s"file:$base/dim"
    val batchRoot = s"file:$base/dim_batch"
    val schema = new StructType()
      .add("id", LongType).add("seg", StringType).add("ts", LongType)

    def run(): Unit = {
      val q = graft.streaming.ScdSink.start(
        spark.readStream.schema(schema).parquet(srcDir),
        root, key = "id", tsCol = "ts", checkpointDir = ck,
        statsCols = Seq("id"))
      try q.processAllAvailable() finally q.stop()
    }

    val feed1 = spark.range(0, 100)
      .select($"id", concat(lit("s"), ($"id" % 4).cast("string")).as("seg"),
        lit(1000L).as("ts"))
    val feed2 = spark.range(0, 100).filter($"id" % 5 === 0)
      .select($"id", lit("SHIFTED").as("seg"), lit(2000L).as("ts"))
    val feed3 = spark.range(0, 100).filter($"id" % 10 === 0)
      .select($"id", lit("BACK").as("seg"), lit(3000L).as("ts"))

    // feed 1 → run; feeds 2 and 3 land while the query is DOWN, each run is
    // a fresh query object on the same checkpoint — the restart boundary
    feed1.coalesce(1).write.mode("append").parquet(srcDir)
    run()
    feed2.coalesce(1).write.mode("append").parquet(srcDir)
    run()
    feed3.coalesce(1).write.mode("append").parquet(srcDir)
    run()

    // the oracle: the same three observation batches folded directly
    Scd.merge(feed1.drop("ts"), batchRoot, "id", ts = 1000)
    Scd.merge(feed2.drop("ts"), batchRoot, "id", ts = 2000)
    Scd.merge(feed3.drop("ts"), batchRoot, "id", ts = 3000)

    def hist(r: String): Set[(Long, String, Long, Long)] =
      Snapshots.read(spark, r)
        .select($"id", $"seg", $"valid_from",
          coalesce($"valid_to", lit(0L)).as("vt"))
        .as[(Long, String, Long, Long)].collect().toSet
    assert(hist(root) === hist(batchRoot),
      "streamed interval history diverged from the batch fold")

    // replay safety: a restart with nothing new commits nothing
    val head = Snapshots.headVersion(spark, root)
    run()
    assert(Snapshots.headVersion(spark, root) === head,
      "an empty restart advanced the dimension")

    // re-delivering an already-applied feed is an observable no-op (the
    // at-least-once path: same content, new files)
    feed3.coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(Snapshots.headVersion(spark, root) === head,
      "a replayed observation batch re-committed")
    assert(hist(root) === hist(batchRoot))

    // the enrich contract on the STREAMED dimension: intervals chain
    // end-to-start, so the as-of join cannot fan out — output rows == facts
    val facts = spark.range(0, 400)
      .select($"id".as("fact_id"), ($"id" % 100).as("id"),
        (lit(500L) + ($"id" / 100).cast("long") * 1000L).as("ts"))
    val enriched = Scd.enrich(facts, root, "id", "ts")
    assert(enriched.count() === 400, "as-of enrich fanned out on streamed history")
    // spot value: id 0 at ts 3500 is BACK; at ts 1500 it's s0; at 500 none
    val byId0 = enriched.filter($"id" === 0)
      .select($"ts", coalesce($"seg", lit("NONE")).as("seg"))
      .as[(Long, String)].collect().toMap
    assert(byId0(3500L) === "BACK" && byId0(1500L) === "s0" && byId0(500L) === "NONE")
  }

  test("intra-batch flicker: latest observation per key wins, deterministically") {
    val base = java.nio.file.Files.createTempDirectory("scdsink2").toString
    val root = s"file:$base/dim"
    // one batch carrying TWO observations of key 1 — the later ts wins
    val batch = Seq((1L, "early", 100L), (1L, "late", 200L), (2L, "only", 150L))
      .toDF("id", "seg", "ts")
    graft.streaming.ScdSink.applyBatch(batch, root, "id", "ts",
      batchId = 0, statsCols = Seq("id"))
    val cur = Scd.current(spark, root)
      .select($"id", $"seg").as[(Long, String)].collect().toSet
    assert(cur === Set((1L, "late"), (2L, "only")))
    // the whole batch applied at its max event time
    assert(Snapshots.read(spark, root).select(max($"valid_from")).head.getLong(0) === 200L)
  }
}
