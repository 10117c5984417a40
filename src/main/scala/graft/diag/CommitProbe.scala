package graft.diag

import graft._
// Diagnostic main (graft.diag is excluded from the bench fingerprint):
// commit-path latency decomposition.
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val df = graft.engine.Tables(spark, "/root/testdata/sf0.1", "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(4)
      .persist()
    df.count()
    val base = "/tmp/commitprobe"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    for (i <- 1 to 8) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/w$i"), true)
      t(s"plain-write $i") { df.write.parquet(s"$base/w$i") }
    }
    for (i <- 1 to 8) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/c$i"), true)
      t(s"commit-nostats $i") { graft.engine.Snapshots.commit(df, s"$base/c$i") }
    }
    for (i <- 1 to 8) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/s$i"), true)
      t(s"commit-stats $i") {
        graft.engine.Snapshots.commit(df, s"$base/s$i", statsCols = Seq("o_orderkey"))
      }
    }
    for (i <- 1 to 8)
      t(s"append-stats $i") {
        graft.engine.Snapshots.commit(df, s"$base/s$i", append = true,
          statsCols = Seq("o_orderkey"))
      }
    for (i <- 1 to 8)
      t(s"read-agg $i") {
        graft.engine.Snapshots.read(spark, s"$base/s$i").groupBy().count().collect()
      }
    spark.stop()
  }
}
