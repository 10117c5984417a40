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

    // ---- q71: z-order layout round-trip — cluster part along the Morton
    //           curve of (p_size, p_retailprice), write, read back through
    //           a band predicate on BOTH dimensions, aggregate. The oracle
    //           reads the unclustered source: identical results prove the
    //           layout op is lossless (reordering only); ZOrderSpec pins
    //           the locality property (band rows concentrate in few files)
    //           that makes the clustered form skippable at scale. ----
    OracleQuery(
      "q71_zorder_scan",
      s"""SELECT p_brand, count(*) AS n,
         |  ${graft.engine.Det.sql.dsum("p_retailprice")} AS sum_price
         |FROM part
         |WHERE p_size BETWEEN 10 AND 20
         |  AND p_retailprice BETWEEN 920 AND 950
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val zUri = s"$lakeBase/part_zorder"
      S3Like.putDf(Tables(spark, dir, "part"), zUri, format = "parquet",
        parts = 8, zorderKeys = Seq("p_size", "p_retailprice"))
      S3Like.getDf(spark, zUri, "parquet")
        .filter(col("p_size").between(10, 20)
          && col("p_retailprice").between(920, 950))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("p_retailprice")).as("sum_price"))
        .orderBy("p_brand")
    },

    // ---- q73: composed lake layout — directory partitioning AND z-order
    //           in one write (`putDf(partitionKeys, zorderKeys)`): part is
    //           partitioned by p_brand and Morton-clustered within each
    //           directory on (p_size, p_retailprice). The read-back query
    //           prunes at BOTH levels: the brand predicate removes whole
    //           directories at plan time, the band predicates skip files
    //           inside the survivors via footer min/max (ZOrderSpec pins
    //           the locality, PlanSpec the PartitionFilters). The oracle
    //           reads the unpartitioned source: identical results prove
    //           the composed layout is lossless. ----
    OracleQuery(
      "q73_partitioned_zorder",
      s"""SELECT p_brand, p_type, count(*) AS n,
         |  ${graft.engine.Det.sql.dsum("p_retailprice")} AS sum_price
         |FROM part
         |WHERE p_brand IN ('Brand#11', 'Brand#22')
         |  AND p_size BETWEEN 10 AND 20
         |  AND p_retailprice BETWEEN 920 AND 980
         |GROUP BY p_brand, p_type
         |ORDER BY p_brand, p_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val zUri = s"$lakeBase/part_by_brand_zorder"
      S3Like.putDf(Tables(spark, dir, "part"), zUri, format = "parquet",
        parts = 8, partitionKeys = Seq("p_brand"),
        zorderKeys = Seq("p_size", "p_retailprice"))
      S3Like.getDf(spark, zUri, "parquet")
        .filter(col("p_brand").isin("Brand#11", "Brand#22")
          && col("p_size").between(10, 20)
          && col("p_retailprice").between(920, 980))
        .groupBy("p_brand", "p_type")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("p_retailprice")).as("sum_price"))
        .orderBy("p_brand", "p_type")
    },
  )
}
