package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.engine.Bucketed

/** Bucketed co-located joins ([[Bucketed]]): the write pays the exchange
  * once; the join plans with NO ShuffleExchange on either side. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bucket-to-bucket equi join plans with zero exchanges before the join") {
    val dir = Files.createTempDirectory("bkt").toString
    val left = spark.range(0, 10000)
      .select($"id".as("k"), ($"id" * 2).as("a"))
    val right = spark.range(0, 10000)
      .select($"id".as("k2"), ($"id" % 97).as("b"))
    Bucketed.write(left, "graft_bkt_l", "k", 8, s"$dir/l")
    Bucketed.write(right, "graft_bkt_r", "k2", 8, s"$dir/r")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // pin the non-broadcast path: at 100 TB neither fact side broadcasts —
      // that regime is exactly what bucketing exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Bucketed.table(spark, "graft_bkt_l")
      val r = Bucketed.table(spark, "graft_bkt_r")
      val joined = l.join(r, l("k") === r("k2"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan did not use the bucket layout:\n$p")
      // correctness: identical to the unbucketed join
      val expected = left.join(right, $"k" === $"k2")
        .agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
      assert(joined.agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
        === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val dir = Files.createTempDirectory("bkt2").toString
    val df = spark.range(0, 5000).select(($"id" % 500).as("k"), $"id".as("v"))
    Bucketed.write(df, "graft_bkt_g", "k", 4, s"$dir/g")
    try {
      val agg = Bucketed.table(spark, "graft_bkt_g").groupBy("k").agg(sum("v").as("s"))
      val p = plan(agg)
      assert(!p.contains("Exchange"),
        s"groupBy on the bucket key must be exchange-free:\n$p")
      val got = agg.as[(Long, Long)].collect().toMap
      val exp = df.groupBy("k").agg(sum("v")).as[(Long, Long)].collect().toMap
      assert(got === exp)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_g")
  }
}
