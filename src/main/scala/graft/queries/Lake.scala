package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{S3Like, Tables}

/** Data-lake layout: Hive-style directory partitioning end to end — the
  * distributed form of the reference's prefix-keyed S3 listing (`get_keys`
  * server-side `Prefix` filter, pandas_aws/s3.py:33-35). At 100 TB a corpus
  * is always partitioned (date/lang/source); the property that makes that
  * layout pay is partition PRUNING: a predicate on the partition column must
  * remove whole directories at plan time (`PartitionFilters` in the scan —
  * PlanSpec pins it) so a lang-filtered query never lists or reads the other
  * languages' files at all.
  */
object Lake {

  /** Deterministic per-dataset scratch root (the lake lives outside the
    * read-only testdata dir); overwritten on each build, so reruns are
    * idempotent. */
  private def lakeUri(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"file:${sys.props("java.io.tmpdir")}/graft_lake_$tag/documents_by_lang"
  }

  val queries: Seq[OracleQuery] = Seq(
    // ---- q63: write documents partitioned by lang, read back with a lang
    //           predicate that prunes directories, aggregate. The oracle
    //           reads the unpartitioned source directly — identical results
    //           prove the partitioned round-trip is lossless and the pruned
    //           scan still sees every surviving row. ----
    OracleQuery(
      "q63_partition_pruned",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin) { (spark, dir) =>
      val lake = lakeUri(dir)
      S3Like.putDf(Tables(spark, dir, "documents"), lake,
        format = "parquet", partitionKeys = Seq("lang"))
      S3Like.getDf(spark, lake, "parquet")
        .filter(col("lang").isin("en", "fr"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang", "source")
    },
  )
}
