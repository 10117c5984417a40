package graft.diag

import graft._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: DSv2 snapshot full-scan cost vs native
  * `spark.read.parquet` over the SAME files — the round-12 verdict's
  * done-criterion for the vectorized reader swap (target: within 1.5×).
  * Scans sf0.1 lineitem committed as a snapshot table, aggregating every
  * column so nothing prunes. Prints one JSON line. */
object ScanParity {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "file:" + java.nio.file.Files.createTempDirectory("parity") + "/t"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    graft.engine.Snapshots.commit(li.repartition(32), root)
    val dataDir = graft.engine.Snapshots.manifest(spark, root, 1L)
      .files.head.reverse.dropWhile(_ != '/').reverse
    def fullAgg(df: org.apache.spark.sql.DataFrame): Long = {
      val aggs = df.schema.fields.map(f => count(col(f.name)))
      df.agg(aggs.head, aggs.tail: _*).collect(); System.nanoTime()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val native = spark.read.parquet(dataDir)
    val dsv2 = spark.read.format("graft.streaming.SnapshotSourceProvider")
      .option("root", root).load()
    // alternate, best of 3 each, warm file cache
    fullAgg(native); fullAgg(dsv2)
    val nT = (1 to 3).map(_ => time(fullAgg(native))).min
    val dT = (1 to 3).map(_ => time(fullAgg(dsv2))).min
    println(f"""{"native_sec":$nT%.3f,"dsv2_sec":$dT%.3f,"ratio":${dT / nT}%.3f}""")
    spark.stop()
  }
}
