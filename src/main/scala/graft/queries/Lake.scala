package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Catalog, Checks, Incremental, MergeClause, S3Like, Snapshots, Tables}

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

  /** Sum of DSv2 scan `numOutputRows` across an EXECUTED plan — the
    * rows-decoded gate for the row-group-pruning oracles (q135/q137/q138).
    * Must recurse through the adaptive wrappers: `TreeNode.collect` stops
    * at [[AdaptiveSparkPlanExec]] (childless) and at materialized
    * [[QueryStageExec]] leaves, both of which hide the scan. */
  private def scanOutputRows(p: org.apache.spark.sql.execution.SparkPlan): Long =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanOutputRows(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanOutputRows(s.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.metrics("numOutputRows").value
      case other => other.children.map(scanOutputRows).sum
    }

  /** Concatenated DSv2 scan descriptions of an EXECUTED plan — the
    * "what did the scan claim it pushed" gate (PushedAggregates /
    * ExactPushedFilters land here). */
  private def scanDesc(p: org.apache.spark.sql.execution.SparkPlan): String =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanDesc(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanDesc(s.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
      case other => other.children.map(scanDesc).mkString("\n")
    }

  /** Planned input-partition count of the first DSv2 scan in an EXECUTED
    * plan — the "how many files did the scan PLAN" gate (each snapshot
    * file maps to ≥1 partition; a LIMIT cap shows as fewer partitions). */
  private def scanPartitions(p: org.apache.spark.sql.execution.SparkPlan): Long =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanPartitions(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanPartitions(s.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.partitions.length.toLong
      case other => other.children.map(scanPartitions).sum
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

    // ---- q81: snapshot CDC — net row changes across an append + a
    //           copy-on-write merge, read from the MANIFEST DIFF's files
    //           only (Snapshots.changes: exceptAll both ways over added vs
    //           removed files, so carried-forward rows in rewritten files
    //           cancel). The oracle reconstructs the three table states
    //           relationally and diffs them with EXCEPT ALL — identical
    //           aggregates prove the file-diff CDC equals the logical state
    //           diff. At 100 TB the left side reads the changed sliver; the
    //           oracle's formulation would read the table twice. ----
    OracleQuery(
      "q81_snapshot_changes",
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |s1 AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        |app AS (SELECT * FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 2 = 0),
        |upd AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000 AS o_totalprice
        |        FROM base WHERE o_orderkey % 10 = 0),
        |s3 AS (SELECT * FROM (SELECT * FROM s1 UNION ALL SELECT * FROM app) s2
        |       WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |       UNION ALL SELECT * FROM upd),
        |ch AS (SELECT 'I' AS _op, * FROM (SELECT * FROM s3 EXCEPT ALL SELECT * FROM s1)
        |       UNION ALL
        |       SELECT 'D' AS _op, * FROM (SELECT * FROM s1 EXCEPT ALL SELECT * FROM s3))
        |SELECT _op, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM ch GROUP BY _op ORDER BY _op""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_snap"
      // rebuild the snapshot history from scratch each run (idempotent)
      new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new Path(root), true)
      val base = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val v1 = Snapshots.commit(
        base.filter(col("o_orderkey") % 7 =!= 0), root,
        statsCols = Seq("o_orderkey"))
      Snapshots.commit(
        base.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 2 === 0),
        root, append = true, statsCols = Seq("o_orderkey"))
      Snapshots.merge(
        base.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000),
        root, key = "o_orderkey", statsCols = Seq("o_orderkey"))
      Snapshots.changes(spark, root, v1, Snapshots.headVersion(spark, root))
        .groupBy("_op")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("_op")
    },

    // ---- q83: copy-on-write delete round-trip — a right-to-erasure
    //           request (all orders of a deterministic customer set) lands
    //           as Snapshots.delete: the stats index prunes to the files
    //           the key set can touch, survivors are anti-joined and
    //           rewritten, everything else carries forward by reference.
    //           The read-back aggregate must equal the oracle's plain
    //           filtered aggregate over the source — proving the pruned
    //           rewrite removed exactly the requested rows and nothing
    //           else. ----
    OracleQuery(
      "q83_snapshot_delete",
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_price
         |FROM orders WHERE o_custkey % 97 <> 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_delete"
      new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new Path(root), true)
      val base = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      Snapshots.commit(
        base.repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        root, statsCols = Seq("o_orderkey"))
      Snapshots.delete(
        base.filter(col("o_custkey") % 97 === 0).select("o_orderkey"),
        root, key = "o_orderkey", statsCols = Seq("o_orderkey"))
      Snapshots.read(spark, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    // ---- q85: incrementally-maintained aggregate state under the
    //           correctness gate — commit orders in two slices plus a
    //           copy-on-write merge of repriced rows, Incremental.refresh
    //           after EVERY version (each refresh reads only that commit's
    //           file diff), and emit the final stored state. The oracle
    //           recomputes the final logical table from scratch and
    //           aggregates it — equality proves the chain of signed-delta
    //           folds (insert batches, merge's −old/+new images) landed on
    //           the exact recompute, through real file layouts. Sums
    //           round(…, 2) on BOTH sides: the state's DECIMAL(38,6) →
    //           double rendering can differ from DuckDB's by 1 ulp once
    //           the unscaled value tops 2^53 (the known decimal→double
    //           double-rounding gap). ----
    OracleQuery(
      "q85_incremental_view",
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |s2 AS (SELECT * FROM base WHERE o_orderkey % 3 IN (0, 1)),
        |upd AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 500 AS o_totalprice
        |        FROM base WHERE o_orderkey % 10 = 0),
        |s3 AS (SELECT * FROM s2
        |       WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |       UNION ALL SELECT * FROM upd)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_price
        |FROM s3 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_mv"
      val aggRoot = s"$lakeBase/orders_mv_state"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(aggRoot), true)
      val base = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      def refresh(): Unit =
        Incremental.refresh(spark, root, aggRoot,
          Seq("o_orderstatus"), Seq("o_totalprice"))
      Snapshots.commit(base.filter(col("o_orderkey") % 3 === 0), root,
        statsCols = Seq("o_orderkey"))
      refresh()
      Snapshots.commit(base.filter(col("o_orderkey") % 3 === 1), root,
        append = true, statsCols = Seq("o_orderkey"))
      refresh()
      Snapshots.merge(
        base.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500),
        root, key = "o_orderkey", statsCols = Seq("o_orderkey"))
      refresh()
      Incremental.read(spark, aggRoot, Seq("o_totalprice"))
        .select(col("o_orderstatus"), col("n_rows"),
          round(col("sum_o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    // ---- q87: catalog-pinned cross-table read — orders and customer land
    //           as TWO snapshot tables under one catalog commit; the query
    //           pins the catalog once and joins both tables through the
    //           pin. The oracle joins the sources directly — equality
    //           proves the catalog binding resolves each table to exactly
    //           the committed state (the consistency boundary a 100 TB
    //           fact ⋈ dim pipeline reads through). ----
    OracleQuery(
      "q87_catalog_join",
      s"""SELECT c.c_mktsegment, COUNT(*) AS n,
         |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_price
         |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         |WHERE o.o_orderkey % 4 = 0
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val cat = s"$lakeBase/cat"
      val fsys = new Path(cat).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(cat, s"$lakeBase/cat_orders", s"$lakeBase/cat_customer")
        .foreach(p => fsys.delete(new Path(p), true))
      Catalog.commit(spark, cat, Map(
        "orders" -> (s"$lakeBase/cat_orders",
          Tables(spark, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .filter(col("o_orderkey") % 4 === 0)),
        "customer" -> (s"$lakeBase/cat_customer",
          Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment"))))
      val pinned = Catalog.pin(spark, cat)
      Catalog.read(spark, pinned, "orders")
        .join(Catalog.read(spark, pinned, "customer"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    },

    // ---- q82: dynamic partition pruning — documents partitioned by
    //           source, joined to an APPROVED-SOURCE list computed from the
    //           corpus itself (sources whose mean doc length clears a bar —
    //           exact integer form sum >= T·count so the cut is
    //           engine-independent). The approved set is data-dependent, so
    //           plan-time pruning cannot apply; Spark's DPP turns the
    //           broadcast dim into a runtime partition filter on the fact
    //           scan (PlanSpec pins `dynamicpruning`) — at 100 TB the fact
    //           side lists and reads ONLY the approved sources'
    //           directories. The oracle joins the unpartitioned source
    //           directly. ----
    OracleQuery(
      "q82_dpp_approved_sources",
      """WITH dim AS (SELECT source FROM documents
        |             GROUP BY source HAVING SUM(n_chars) >= 300 * COUNT(*))
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
        |FROM documents d JOIN dim USING (source)
        |GROUP BY d.source ORDER BY d.source""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val srcLake = s"$lakeBase/documents_by_source"
      S3Like.putDf(Tables(spark, dir, "documents"), srcLake,
        format = "parquet", partitionKeys = Seq("source"))
      val docs = S3Like.getDf(spark, srcLake, "parquet")
      val dim = docs.groupBy("source")
        .agg(sum("n_chars").as("s"), count(lit(1)).as("c"))
        .filter(col("s") >= lit(300) * col("c"))
        .select("source")
      docs.join(dim, Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("source")
    },

    // ---- q88: KEYED incremental vocabulary — token frequencies maintained
    //           through doc appends and copy-on-write text updates via
    //           Incremental.refreshKeyed. Unlike q85 (whole-state rewrite
    //           per refresh — right for its 3-group state), the state here
    //           is vocabulary-sized: one row per token, merge-keyed on
    //           xxhash64(w) with per-file hash-range stats, so each refresh
    //           rewrites only the state files holding TOUCHED tokens while
    //           untouched files carry by manifest reference
    //           (IncrementalSpec pins the file-sliver property). The
    //           expand hook explodes tokens with their _sign, so an updated
    //           doc's old tokens arrive −1 and cancel against its new +1s.
    //           The oracle recomputes token counts over the final logical
    //           doc set from scratch — equality proves the chain of signed
    //           folds + keyed merges lands on the exact recompute. ----
    OracleQuery(
      "q88_keyed_vocab",
      """WITH s12 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 IN (0, 1)),
        |upd AS (SELECT doc_id, text || ' graftnovel graftnovel' AS text
        |        FROM s12 WHERE doc_id % 10 = 0),
        |final AS (
        |  SELECT * FROM s12 WHERE doc_id NOT IN (SELECT doc_id FROM upd)
        |  UNION ALL SELECT * FROM upd),
        |tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w FROM final)
        |SELECT w, CAST(count(*) AS BIGINT) AS n_rows
        |FROM tok GROUP BY w HAVING count(*) >= 25
        |ORDER BY w""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/docs_kv"
      val aggRoot = s"$lakeBase/vocab_state"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(aggRoot), true)
      val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      def refresh(): Unit =
        Incremental.refreshKeyed(spark, root, aggRoot,
          groupCols = Seq("w"), sumCols = Seq.empty,
          expand = d => d.select(col("_sign"),
            explode(graft.functions.TextOps.tokens(col("text"))).as("w")),
          stateFiles = 8)
      Snapshots.commit(docs.filter(col("doc_id") % 3 === 0), root,
        statsCols = Seq("doc_id"))
      refresh()
      Snapshots.commit(docs.filter(col("doc_id") % 3 === 1), root,
        append = true, statsCols = Seq("doc_id"))
      refresh()
      Snapshots.merge(
        docs.filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" graftnovel graftnovel"))),
        root, key = "doc_id", statsCols = Seq("doc_id"))
      refresh()
      Incremental.readKeyed(spark, aggRoot, Seq.empty)
        .filter(col("n_rows") >= 25)
        .orderBy("w")
    },

    // ---- q91: catalog WALL-CLOCK travel — two catalog commits land orders
    //           slices under one catalog; the query pins the catalog AS OF
    //           the instant the FIRST commit published and joins through
    //           that pin. The oracle joins the first slice directly —
    //           equality proves pinAsOf resolves every member table to the
    //           versions jointly visible at that wall-clock instant ("the
    //           lake as the Tuesday run saw it"), not the later head. The
    //           query spins until the clock advances past v1's publish ms
    //           before committing v2, so the ts order (and therefore the
    //           pin) is deterministic on any clock. ----
    OracleQuery(
      "q91_catalog_asof",
      s"""SELECT c.c_mktsegment, COUNT(*) AS n,
         |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_price
         |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         |WHERE o.o_orderkey % 4 = 0
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val cat = s"$lakeBase/cat_asof"
      val fsys = new Path(cat).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(cat, s"$lakeBase/cat_asof_orders", s"$lakeBase/cat_asof_customer")
        .foreach(p => fsys.delete(new Path(p), true))
      val orders = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Catalog.commit(spark, cat, Map(
        "orders" -> (s"$lakeBase/cat_asof_orders",
          orders.filter(col("o_orderkey") % 4 === 0)),
        "customer" -> (s"$lakeBase/cat_asof_customer",
          Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment"))))
      val t1 = Catalog.pin(spark, cat, 1).ts
      // make v2's publish instant strictly later than v1's, so asking "as
      // of t1" has exactly one right answer (ties go to the higher version)
      while (System.currentTimeMillis() <= t1) Thread.sleep(1)
      Catalog.commit(spark, cat, Map(
        "orders" -> (s"$lakeBase/cat_asof_orders",
          orders.filter(col("o_orderkey") % 4 === 2))))
      val pinned = Catalog.pinAsOf(spark, cat, t1)
      Catalog.read(spark, pinned, "orders")
        .join(Catalog.read(spark, pinned, "customer"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    },

    // ---- q92: consolidated maintenance under the gate — a table built by
    //           two commits and a key-set delete goes through ONE
    //           Maintain.maintain call (z-order rewrite + manifest
    //           consolidation + vacuum to head-only + orphan sweep), then a
    //           stats-pruned range read. The oracle recomputes the final
    //           logical state directly — equality proves the whole
    //           maintenance pipeline is content-preserving AND readRange
    //           stays exact over the re-clustered post-vacuum layout (the
    //           lifecycle a 100 TB table actually lives: ingest, erase,
    //           maintain, range-scan). ----
    OracleQuery(
      "q92_maintain_lifecycle",
      """WITH s AS (
        |  SELECT * FROM orders
        |  WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 30 <> 0)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_cust
        |FROM s WHERE o_custkey BETWEEN 100 AND 900
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_maint"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val base = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      // the two ingest slices are independent batches: stage them
      // concurrently, publish once (same files/stats as commit+append —
      // the lifecycle under maintenance is unchanged)
      Snapshots.commitAll(
        Seq(base.filter(col("o_orderkey") % 3 === 0),
          base.filter(col("o_orderkey") % 3 === 1)),
        root, statsCols = Seq("o_orderkey"))
      Snapshots.delete(
        base.filter(col("o_orderkey") % 30 === 0).select("o_orderkey"),
        root, key = "o_orderkey")
      graft.engine.Maintain.maintain(spark, root,
        graft.engine.MaintenancePolicy(
          compactTargetFiles = 4, zorderDims = Seq("o_custkey"),
          vacuumKeepLast = 1, orphanGraceMs = 0L))
      Snapshots.readRange(spark, root, "o_custkey", 100, 900)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey").cast("long")).as("sum_cust"))
        .orderBy("o_orderstatus")
    },

    // ---- q93: zero-copy CONVERT — a pre-existing plain parquet directory
    //           (two ordinary spark writes, no snapshot machinery) is
    //           ADOPTED in place by convertInPlace (v1 references the
    //           original files; ConvertSpec pins that nothing is copied),
    //           then lives the transactional life: an append commit and a
    //           copy-on-write key delete land on top, and the final state
    //           is range-read through the adopted+committed stats. The
    //           oracle recomputes that final logical state from the source
    //           table directly — equality proves adoption is lossless and
    //           every later snapshot operation composes with adopted files
    //           exactly as with written ones (the 100 TB migration story:
    //           transactional from commit 1, zero rewrite). ----
    OracleQuery(
      "q93_convert_in_place",
      """WITH s AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 2 = 1 AND o_orderkey % 5 <> 0)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_key
        |FROM s WHERE o_orderkey % 40 <> 0 AND o_custkey BETWEEN 150 AND 850
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_convert"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val base = Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      // the PLAIN directory: ordinary writes, no snapshot layer in sight
      base.filter(col("o_orderkey") % 2 === 0)
        .repartition(3).write.parquet(root)
      // adopt in place, then transact on top
      Snapshots.convertInPlace(spark, root, statsCols = Seq("o_custkey"))
      Snapshots.commit(
        base.filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 5 =!= 0),
        root, append = true, statsCols = Seq("o_custkey"))
      Snapshots.delete(
        base.filter(col("o_orderkey") % 40 === 0).select("o_orderkey"),
        root, key = "o_orderkey")
      Snapshots.readRange(spark, root, "o_custkey", 150, 850)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey").cast("long")).as("sum_key"))
        .orderBy("o_orderstatus")
    },

    // ---- q95: incrementally-maintained QUANTILES — a per-lang histogram
    //           state (fixed 200-char bins over n_chars) is maintained
    //           through commit → copy-on-write repricing merge → key
    //           delete, refreshing after each, then read as p25/p50/p90
    //           estimates. The oracle rebuilds the histogram from the
    //           FINAL logical state and applies the same rank rule —
    //           equality proves the additive sketch maintains EXACTLY
    //           under deletes (a −1 delta row cancels its bin count; no
    //           recompute path, the thing HLL cannot do) and the estimator
    //           is pure integer/double arithmetic, bit-identical across
    //           engines. At 100 TB: distribution drift per ingest batch at
    //           delta cost, never a corpus re-scan. ----
    OracleQuery(
      "q95_histogram_quantiles",
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 100 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 11 <> 0),
        |b AS (SELECT lang, CAST(FLOOR(n_chars / CAST(200.0 AS DOUBLE)) AS BIGINT) AS bin,
        |        COUNT(*) AS n
        |      FROM s GROUP BY lang, bin),
        |c AS (SELECT lang, bin,
        |        SUM(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |        SUM(n) OVER (PARTITION BY lang) AS total FROM b),
        |q AS (SELECT lang, p, MIN(bin) AS qbin
        |      FROM c CROSS JOIN
        |        (SELECT CAST(UNNEST([0.25, 0.5, 0.9]) AS DOUBLE) AS p) ps
        |      WHERE cum >= GREATEST(1, CEIL(p * total))
        |      GROUP BY lang, p)
        |SELECT lang, p, qbin * CAST(200.0 AS DOUBLE) AS q_est
        |FROM q ORDER BY lang, p""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val src = s"$lakeBase/docs_hist_src"
      val st = s"$lakeBase/docs_hist_state"
      val fsys = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(src, st).foreach(p => fsys.delete(new Path(p), true))
      val docs = Tables(spark, dir, "documents")
        .select("doc_id", "lang", "n_chars")
      Snapshots.commit(docs, src, statsCols = Seq("doc_id"))
      Incremental.refreshHistogram(spark, src, st, Seq("lang"), "n_chars", 200.0)
      // repricing merge: every 7th doc grows by 100 chars — its old bin
      // count −1s away, its new bin +1s in
      Snapshots.merge(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("n_chars", col("n_chars") + 100),
        src, key = "doc_id", statsCols = Seq("doc_id"))
      Incremental.refreshHistogram(spark, src, st, Seq("lang"), "n_chars", 200.0)
      Snapshots.delete(
        docs.filter(col("doc_id") % 11 === 0).select("doc_id"),
        src, key = "doc_id")
      Incremental.refreshHistogram(spark, src, st, Seq("lang"), "n_chars", 200.0)
      Incremental.readQuantiles(spark, st, Seq("lang"), Seq(0.25, 0.5, 0.9), 200.0)
        .orderBy("lang", "p")
    },

    // ---- q96: SCD2 dimension maintenance — three observation batches
    //           (initial load; a segment shift for every 5th customer; a
    //           second shift for every 10th) fold into a versioned
    //           dimension via Scd.merge, and the ENTIRE row-level history
    //           (every version with its validity interval) goes under the
    //           hash gate. The oracle constructs the expected interval set
    //           directly from the batch definitions — equality proves the
    //           close-and-insert algebra: unchanged keys keep one open
    //           interval, changed keys chain intervals end to start, and
    //           only observed keys are ever touched. valid_to=0 renders
    //           the open interval (NULL would drift dtypes across
    //           engines). ----
    OracleQuery(
      "q96_scd2_dimension",
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer)
        |SELECT c_custkey, c_mktsegment AS seg,
        |  CAST(1000 AS BIGINT) AS valid_from,
        |  CAST(CASE WHEN c_custkey % 5 = 0 THEN 2000 ELSE 0 END AS BIGINT) AS valid_to
        |FROM c
        |UNION ALL
        |SELECT c_custkey, 'SHIFTED', CAST(2000 AS BIGINT),
        |  CAST(CASE WHEN c_custkey % 10 = 0 THEN 3000 ELSE 0 END AS BIGINT)
        |FROM c WHERE c_custkey % 5 = 0
        |UNION ALL
        |SELECT c_custkey, 'BACK', CAST(3000 AS BIGINT), CAST(0 AS BIGINT)
        |FROM c WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey, valid_from""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_scd"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      graft.engine.Scd.merge(cust, root, "c_custkey", ts = 1000,
        statsCols = Seq("c_custkey"))
      graft.engine.Scd.merge(
        cust.filter(col("c_custkey") % 5 === 0).withColumn("seg", lit("SHIFTED")),
        root, "c_custkey", ts = 2000, statsCols = Seq("c_custkey"))
      graft.engine.Scd.merge(
        cust.filter(col("c_custkey") % 10 === 0).withColumn("seg", lit("BACK")),
        root, "c_custkey", ts = 3000, statsCols = Seq("c_custkey"))
      Snapshots.read(spark, root)
        .select(col("c_custkey"), col("seg"), col("valid_from"),
          coalesce(col("valid_to"), lit(0L)).as("valid_to"))
        .orderBy("c_custkey", "valid_from")
    },

    // ---- q97: SCD2 AS-OF ENRICHMENT — the join the dimension history
    //           exists to serve: each order is enriched with the customer
    //           segment valid AT THAT ORDER'S OWN EVENT TIME (not the
    //           current one). Facts get synthetic event times spanning the
    //           three batch epochs (plus one BEFORE the dimension existed
    //           — those keep null attributes, rendered 'NONE'), and the
    //           grouped (ts, seg) counts go under the hash gate. The
    //           oracle constructs the interval set from the batch
    //           definitions and runs the same point-in-interval left join
    //           — count equality proves the join cannot fan out (intervals
    //           chain end-to-start, at most one version contains any ts)
    //           and sum_key proves each fact landed on the RIGHT version.
    //           Plan shape: equi-join on the key with the containment as
    //           residual — hash exchange (or broadcast) on the key, never
    //           a range/cross join. ----
    OracleQuery(
      "q97_scd2_enrich",
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer),
        |dim AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    CAST(1000 AS BIGINT) AS vf,
        |    CASE WHEN c_custkey % 5 = 0 THEN CAST(2000 AS BIGINT) END AS vt
        |  FROM c
        |  UNION ALL
        |  SELECT c_custkey, 'SHIFTED', CAST(2000 AS BIGINT),
        |    CASE WHEN c_custkey % 10 = 0 THEN CAST(3000 AS BIGINT) END
        |  FROM c WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'BACK', CAST(3000 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM c WHERE c_custkey % 10 = 0),
        |f AS (SELECT o_orderkey, o_custkey,
        |        CAST(500 + (o_orderkey % 4) * 1000 AS BIGINT) AS ts
        |      FROM orders)
        |SELECT f.ts, COALESCE(d.seg, 'NONE') AS seg,
        |  count(*) AS n_orders,
        |  CAST(SUM(CAST(f.o_orderkey AS BIGINT)) AS BIGINT) AS sum_key
        |FROM f LEFT JOIN dim d
        |  ON f.o_custkey = d.c_custkey AND d.vf <= f.ts
        |    AND (d.vt IS NULL OR f.ts < d.vt)
        |GROUP BY f.ts, seg ORDER BY f.ts, seg""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_scd_enrich"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      graft.engine.Scd.merge(cust, root, "c_custkey", ts = 1000,
        statsCols = Seq("c_custkey"))
      graft.engine.Scd.merge(
        cust.filter(col("c_custkey") % 5 === 0).withColumn("seg", lit("SHIFTED")),
        root, "c_custkey", ts = 2000, statsCols = Seq("c_custkey"))
      graft.engine.Scd.merge(
        cust.filter(col("c_custkey") % 10 === 0).withColumn("seg", lit("BACK")),
        root, "c_custkey", ts = 3000, statsCols = Seq("c_custkey"))
      val facts = Tables(spark, dir, "orders")
        .select(col("o_orderkey"),
          col("o_custkey").as("c_custkey"),
          (lit(500L) + (col("o_orderkey") % 4).cast("long") * 1000L).as("ts"))
      graft.engine.Scd.enrich(facts, root, "c_custkey", "ts")
        .groupBy(col("ts"), coalesce(col("seg"), lit("NONE")).as("seg"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey").cast("long")).as("sum_key"))
        .orderBy("ts", "seg")
    },

    // ---- q98: PREDICATE-DRIVEN pruned read — the analyst's own WHERE
    //           clause, passed verbatim as a Column to readWhere, prunes
    //           a range-clustered snapshot table's file list through the
    //           manifest stats index with no pruning API in sight: the
    //           l_orderkey band is mined from the analyzed predicate and
    //           opens the band's files only, the string IN and the
    //           quantity conjunct (files span all quantities) contribute
    //           nothing and stay conservative, and the full predicate
    //           still evaluates exactly. Oracle = the same WHERE over the
    //           raw table — equality proves the index only ever SHRINKS
    //           the scan. The 100 TB reading: ad-hoc queries get z-order/
    //           cluster pruning for free, not only callers who know
    //           readRange's signature. ----
    OracleQuery(
      "q98_read_where",
      s"""SELECT l_returnflag,
         |  count(*) AS n, ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey >= 150 AND l_orderkey < 1200
         |  AND l_returnflag IN ('A', 'R') AND l_quantity < 25
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_where"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val li = Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
      Snapshots.commit(li.repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey", "l_quantity"))
      Snapshots.readWhere(spark, root,
        col("l_orderkey") >= 150 && col("l_orderkey") < 1200 &&
          col("l_returnflag").isin("A", "R") && col("l_quantity") < 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // ---- q99: METADATA-ONLY AGGREGATES — count(*), a banded count, and a
    //           column's min/max answered from the manifest, not the data:
    //           commits record per-file row counts (+ per-file null counts
    //           beside the min/max stats), so rowCount folds the manifest,
    //           countWhere counts every file fully inside the mined band
    //           from metadata (zero recorded nulls required — null rows
    //           fail predicates) and scans only the two boundary files, and
    //           statsRange is min-of-mins/max-of-maxs. Oracle = DuckDB's
    //           actual scan of the same rows — equality proves the
    //           metadata's counts ARE the data's. The 100 TB reading: the
    //           commonest analytical probes (how many rows? how many in
    //           this range? what span?) cost O(manifest), the same
    //           bookkeeping that lets Iceberg/Delta skip the scan. ----
    OracleQuery(
      "q99_metadata_agg",
      """SELECT
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS total_rows,
        |  CAST((SELECT count(*) FROM lineitem
        |        WHERE l_orderkey >= 150 AND l_orderkey < 1200) AS BIGINT) AS band_rows,
        |  CAST((SELECT min(l_orderkey) FROM lineitem) AS BIGINT) AS min_key,
        |  CAST((SELECT max(l_orderkey) FROM lineitem) AS BIGINT) AS max_key""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_meta"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      Snapshots.commit(li.repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey"))
      val total = Snapshots.rowCount(spark, root)
        .getOrElse(sys.error("fresh commit must carry row counts"))
      val band = Snapshots.countWhere(spark, root,
        col("l_orderkey") >= 150 && col("l_orderkey") < 1200)
      val (mn, mx) = Snapshots.statsRange(spark, root, "l_orderkey")
        .getOrElse(sys.error("fresh commit must carry stats"))
      spark.range(1).select(
        lit(total).as("total_rows"), lit(band).as("band_rows"),
        lit(mn.toLong).as("min_key"), lit(mx.toLong).as("max_key"))
    },

    // ---- q100: conditional MERGE INTO — the full three-clause warehouse
    //            verb over a snapshot table: WHEN MATCHED AND bal<0 DELETE
    //            (overdrawn matched customers leave), WHEN MATCHED UPDATE
    //            SET (segment flip + balance credit referencing BOTH
    //            sides), WHEN NOT MATCHED INSERT (brand-new keys land with
    //            explicit VALUES). The entire post-merge table goes under
    //            the hash gate; the oracle computes the identical final
    //            state as pure SQL (filtered left join ∪ anti-join insert,
    //            the relational definition of MERGE's clause algebra).
    //            Equality proves first-match-wins ordering (delete wins
    //            over update on overdrawn rows), both-sides SET arithmetic,
    //            and exact NOT MATCHED detection through the pruned
    //            copy-on-write path (MergeIntoSpec pins the carry-by-
    //            reference property; here every clause's row set is
    //            value-checked). ----
    OracleQuery(
      "q100_merge_into",
      """WITH t AS (
        |  SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |s AS (
        |  SELECT c_custkey, 'MERGED' AS new_seg, CAST(100.0 AS DOUBLE) AS delta
        |  FROM customer WHERE c_custkey % 4 = 0
        |  UNION ALL
        |  SELECT c_custkey + 100000, 'FRESH', CAST(1.5 AS DOUBLE)
        |  FROM customer WHERE c_custkey % 40 = 0),
        |upd AS (
        |  SELECT t.c_custkey,
        |    CASE WHEN s.c_custkey IS NOT NULL THEN s.new_seg ELSE t.seg END AS seg,
        |    CASE WHEN s.c_custkey IS NOT NULL THEN t.bal + s.delta ELSE t.bal END AS bal
        |  FROM t LEFT JOIN s ON t.c_custkey = s.c_custkey
        |  WHERE NOT (s.c_custkey IS NOT NULL AND t.bal < 0)),
        |ins AS (
        |  SELECT s.c_custkey, s.new_seg AS seg, s.delta AS bal
        |  FROM s WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.c_custkey = s.c_custkey))
        |SELECT c_custkey, seg, bal FROM upd
        |UNION ALL SELECT c_custkey, seg, bal FROM ins
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_mergeinto"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      Snapshots.commit(cust.repartitionByRange(6, col("c_custkey")), root,
        statsCols = Seq("c_custkey"))
      val src = cust.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), lit("MERGED").as("new_seg"),
          lit(100.0).as("delta"))
        .unionByName(cust.filter(col("c_custkey") % 40 === 0)
          .select((col("c_custkey") + 100000L).as("c_custkey"),
            lit("FRESH").as("new_seg"), lit(1.5).as("delta")))
      Snapshots.mergeInto(src, root, "c_custkey", Seq(
        MergeClause.Delete(Some(col("t.bal") < 0)),
        MergeClause.Update(Map(
          "seg" -> col("s.new_seg"),
          "bal" -> (col("t.bal") + col("s.delta")))),
        MergeClause.Insert(Map(
          "c_custkey" -> col("s.c_custkey"),
          "seg" -> col("s.new_seg"),
          "bal" -> col("s.delta")))),
        statsCols = Seq("c_custkey"))
      Snapshots.read(spark, root).orderBy("c_custkey")
    },

    // ---- q103: FULL-SYNC MERGE — the WHEN NOT MATCHED BY SOURCE family
    //            (SQL:2023 / Delta's extension of MERGE): the source is
    //            the complete current feed, so target rows the feed
    //            stopped mentioning are stale — overdrawn ones DELETE,
    //            the rest get flagged, matched ones update. By-source
    //            fate depends on source ABSENCE, so no file can be
    //            pruned — the honest full-table cost of full-sync,
    //            exercised and hash-gated over the whole post-merge
    //            state. First-match-wins within the by-source family
    //            (delete shields the flag update on overdrawn rows). ----
    OracleQuery(
      "q103_merge_full_sync",
      """WITH t AS (
        |  SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |s AS (SELECT c_custkey, 'SYNCED' AS new_seg FROM customer
        |      WHERE c_custkey % 3 = 0),
        |m AS (
        |  SELECT t.c_custkey,
        |    CASE WHEN s.c_custkey IS NOT NULL THEN s.new_seg ELSE 'STALE' END AS seg,
        |    t.bal
        |  FROM t LEFT JOIN s ON t.c_custkey = s.c_custkey
        |  WHERE NOT (s.c_custkey IS NULL AND t.bal < 0))
        |SELECT c_custkey, seg, bal FROM m ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_fullsync"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      Snapshots.commit(cust.repartitionByRange(6, col("c_custkey")), root,
        statsCols = Seq("c_custkey"))
      val feed = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), lit("SYNCED").as("new_seg"))
      Snapshots.mergeInto(feed, root, "c_custkey", Seq(
        MergeClause.Update(Map("seg" -> col("s.new_seg"))),
        MergeClause.BySourceDelete(Some(col("t.bal") < 0)),
        MergeClause.BySourceUpdate(Map("seg" -> lit("STALE")))),
        statsCols = Seq("c_custkey"))
      Snapshots.read(spark, root).orderBy("c_custkey")
    },

    // ---- q104: STRING-KEYED copy-on-write merge through the per-file
    //            BLOOM index — the pruning tier numeric min/max stats
    //            cannot provide for doc-id/hash keys (before round 9 a
    //            string-keyed merge rewrote the whole table; with blooms
    //            only the files that can contain a batch key rewrite —
    //            BloomIndexSpec pins the carry-by-reference property,
    //            this oracle hash-gates the CONTENT across the
    //            bloom-pruned lifecycle). ----
    OracleQuery(
      "q104_bloom_string_merge",
      """WITH base AS (
        |  SELECT 'd' || CAST(doc_id AS VARCHAR) AS k, lang, n_chars
        |  FROM documents),
        |upd AS (SELECT k, lang, n_chars + 1000 AS n_chars
        |        FROM base WHERE k LIKE 'd1%'),
        |fin AS (
        |  SELECT * FROM base WHERE k NOT IN (SELECT k FROM upd)
        |  UNION ALL SELECT * FROM upd)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM fin GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/docs_bloom_merge"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val base = Tables(spark, dir, "documents")
        .select(concat(lit("d"), col("doc_id")).as("k"), col("lang"), col("n_chars"))
      Snapshots.commit(
        base.repartitionByRange(8, col("k")).sortWithinPartitions("k"),
        root, bloomCols = Seq("k"))
      Snapshots.merge(
        base.filter(col("k").startsWith("d1"))
          .withColumn("n_chars", col("n_chars") + 1000),
        root, key = "k", bloomCols = Seq("k"))
      Snapshots.read(spark, root)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("lang")
    },

    // ---- q101: SCD2 enrich, JOIN COST ISOLATED — q97's as-of enrichment
    //            with the dimension built ONCE and reused (the build is
    //            deterministic, so a prior identical build is adopted).
    //            q96/q97 time three full Scd.merge commits plus the join;
    //            this row times the join alone on warm passes — the
    //            number that must stay a plain hash join as facts scale
    //            (the curve's enrich-only step), with the same oracle
    //            gate as q97 proving the reused dimension is the right
    //            one. ----
    OracleQuery(
      "q101_scd2_enrich_only",
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer),
        |dim AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    CAST(1000 AS BIGINT) AS vf,
        |    CASE WHEN c_custkey % 5 = 0 THEN CAST(2000 AS BIGINT) END AS vt
        |  FROM c
        |  UNION ALL
        |  SELECT c_custkey, 'SHIFTED', CAST(2000 AS BIGINT),
        |    CASE WHEN c_custkey % 10 = 0 THEN CAST(3000 AS BIGINT) END
        |  FROM c WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'BACK', CAST(3000 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM c WHERE c_custkey % 10 = 0),
        |f AS (SELECT o_orderkey, o_custkey,
        |        CAST(500 + (o_orderkey % 4) * 1000 AS BIGINT) AS ts
        |      FROM orders)
        |SELECT f.ts, COALESCE(d.seg, 'NONE') AS seg,
        |  count(*) AS n_orders,
        |  CAST(SUM(CAST(f.o_orderkey AS BIGINT)) AS BIGINT) AS sum_key
        |FROM f LEFT JOIN dim d
        |  ON f.o_custkey = d.c_custkey AND d.vf <= f.ts
        |    AND (d.vt IS NULL OR f.ts < d.vt)
        |GROUP BY f.ts, seg ORDER BY f.ts, seg""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_scd_enrich_only"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      // deterministic build, adopted when already present (exactly three
      // tagged folds): cold runs pay it once, warm passes time the join
      val built = try Snapshots.headVersion(spark, root) == 3
        catch { case scala.util.control.NonFatal(_) => false }
      if (!built) {
        fsys.delete(new Path(root), true)
        graft.engine.Scd.merge(cust, root, "c_custkey", ts = 1000,
          statsCols = Seq("c_custkey"))
        graft.engine.Scd.merge(
          cust.filter(col("c_custkey") % 5 === 0).withColumn("seg", lit("SHIFTED")),
          root, "c_custkey", ts = 2000, statsCols = Seq("c_custkey"))
        graft.engine.Scd.merge(
          cust.filter(col("c_custkey") % 10 === 0).withColumn("seg", lit("BACK")),
          root, "c_custkey", ts = 3000, statsCols = Seq("c_custkey"))
      }
      val facts = Tables(spark, dir, "orders")
        .select(col("o_orderkey"),
          col("o_custkey").as("c_custkey"),
          (lit(500L) + (col("o_orderkey") % 4).cast("long") * 1000L).as("ts"))
      graft.engine.Scd.enrich(facts, root, "c_custkey", "ts")
        .groupBy(col("ts"), coalesce(col("seg"), lit("NONE")).as("seg"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey").cast("long")).as("sum_key"))
        .orderBy("ts", "seg")
    },

    // ---- q105: MERGE-ON-READ DELETION VECTORS — two predicate deletes
    //            (a price band touching every file + scattered point
    //            deletes) land as per-file position bitmaps, NOT rewrites:
    //            the data files are byte-untouched (DvSpec pins that), and
    //            every read anti-joins the vectors back out. The whole
    //            post-delete table aggregates under the hash gate against
    //            the oracle's plain double-NOT filter — SQL DELETE
    //            semantics (only TRUE rows go) across accumulated vectors.
    //            The 100 TB shape: a GDPR-sized delete costs one pruned
    //            scan + O(deleted positions) of compressed metadata where
    //            copy-on-write rewrote every touched terabyte. ----
    OracleQuery(
      "q105_delete_vectors",
      """WITH kept AS (
        |  SELECT * FROM orders
        |  WHERE NOT (o_totalprice < 50000.0) AND NOT (o_orderkey % 100 = 7))
        |SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM kept GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_dv"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val orders = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      Snapshots.commit(orders.repartitionByRange(8, col("o_orderkey")), root,
        statsCols = Seq("o_orderkey", "o_totalprice"))
      // band delete: prunes by the o_totalprice stats index, vectors the rest
      Snapshots.deleteWhere(spark, root, col("o_totalprice") < 50000.0)
      // scattered point deletes: vectors accumulate (bitmap OR) per file
      Snapshots.deleteWhere(spark, root, col("o_orderkey") % 100 === 7)
      Snapshots.read(spark, root)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("long").as("sum_key"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderpriority")
    },

    // ---- q106: BUCKETED CO-LOCATED JOIN — both sides hash-clustered into
    //            the same bucket count on their join keys at write time
    //            ([[graft.engine.Bucketed]]), so the SortMergeJoin plans
    //            with NO ShuffleExchange on either side (BucketedJoinSpec
    //            pins the plan; the merge hint keeps the join non-broadcast
    //            at this SF, as it would be between 100 TB fact tables).
    //            The oracle joins the raw tables — identical aggregates
    //            prove the bucketed layout is lossless. ----
    OracleQuery(
      "q106_bucketed_join",
      """SELECT c_mktsegment,
        |  count(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val orders = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.engine.Bucketed.write(orders, "graft_q106_orders", "o_custkey", 8,
        s"$lakeBase/bkt_orders")
      graft.engine.Bucketed.write(cust, "graft_q106_customer", "c_custkey", 8,
        s"$lakeBase/bkt_customer")
      val o = graft.engine.Bucketed.table(spark, "graft_q106_orders")
      val c = graft.engine.Bucketed.table(spark, "graft_q106_customer")
      o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).cast("long").as("sum_key"))
        .orderBy("c_mktsegment")
    },

    // ---- q107: TYPED CHANGE FEED — changesTyped classifies the net
    //            row-level diff between two versions by key: updates
    //            surface as update_pre/update_post pairs, pure arrivals
    //            as insert, pure departures as delete — across a history
    //            that mixes a keyed merge (updates + inserts) and a
    //            VECTORED delete (so the feed must see position-deleted
    //            rows with no file diff). The oracle rebuilds both table
    //            states in SQL and classifies the EXCEPT ALL diff the
    //            same way — row-exact over every change row. ----
    OracleQuery(
      "q107_changes_typed",
      """WITH t1 AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |            FROM customer),
        |upd AS (SELECT k, 'UPDATED' AS seg, bal + 10.0 AS bal FROM t1 WHERE k % 7 = 0),
        |ins AS (SELECT k + 200000 AS k, 'NEW' AS seg, CAST(5.0 AS DOUBLE) AS bal
        |        FROM t1 WHERE k % 50 = 0),
        |t2 AS (SELECT * FROM t1 WHERE k % 7 <> 0
        |       UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |t3 AS (SELECT * FROM t2 WHERE NOT (seg = 'UPDATED' AND k % 3 = 0)),
        |ni AS (SELECT * FROM t3 EXCEPT ALL SELECT * FROM t1),
        |nd AS (SELECT * FROM t1 EXCEPT ALL SELECT * FROM t3),
        |typed AS (
        |  SELECT ni.*, CASE WHEN ni.k IN (SELECT k FROM nd)
        |    THEN 'update_post' ELSE 'insert' END AS chg FROM ni
        |  UNION ALL
        |  SELECT nd.*, CASE WHEN nd.k IN (SELECT k FROM ni)
        |    THEN 'update_pre' ELSE 'delete' END AS chg FROM nd)
        |SELECT k, seg, bal, chg FROM typed
        |ORDER BY k, chg, seg, bal""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_cdf"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val t1 = Tables(spark, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      Snapshots.commit(t1.repartitionByRange(6, col("k")), root,
        statsCols = Seq("k"))
      val batch = t1.filter(col("k") % 7 === 0)
        .select(col("k"), lit("UPDATED").as("seg"), (col("bal") + 10.0).as("bal"))
        .unionByName(t1.filter(col("k") % 50 === 0)
          .select((col("k") + 200000L).as("k"), lit("NEW").as("seg"),
            lit(5.0).as("bal")))
      Snapshots.merge(batch, root, "k", statsCols = Seq("k"))
      Snapshots.deleteWhere(spark, root,
        col("seg") === "UPDATED" && col("k") % 3 === 0)
      Snapshots.changesTyped(spark, root, 1, 3, "k")
        .withColumnRenamed("_change", "chg")
        .orderBy("k", "chg", "seg", "bal")
    },

    // ---- q108: WRITE-AUDIT-PUBLISH — ingest lands on a BRANCH of the
    //            snapshot table (zero-copy fork: manifests only), an
    //            Expect audit runs against exactly the bytes that would
    //            publish, and only a clean branch fast-forwards main. The
    //            query stages a poisoned batch first (null segment — the
    //            audit blocks it, main never sees it), then the real
    //            upsert batch (audit passes, atomic fast-forward). The
    //            oracle computes the good merge alone: a hash match proves
    //            the bad batch left zero residue AND the published state
    //            is exactly the branch's. ----
    OracleQuery(
      "q108_wap",
      """WITH t AS (
        |  SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |s AS (
        |  SELECT c_custkey, 'AUDITED' AS seg, bal + 10.0 AS bal
        |  FROM t WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 200000, 'STAGED', CAST(0.5 AS DOUBLE)
        |  FROM t WHERE c_custkey % 50 = 0)
        |SELECT c_custkey, seg, bal FROM s
        |UNION ALL
        |SELECT c_custkey, seg, bal FROM t
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM s)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import graft.engine.Branches
      import graft.operators.Expect
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_wap"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      Snapshots.commit(cust.repartitionByRange(6, col("c_custkey")), root,
        statsCols = Seq("c_custkey"))
      val gate = Seq(Expect.Rule("seg_not_null", col("seg").isNotNull))

      // poisoned batch: lands on its branch, FAILS the audit, never publishes
      Branches.fork(spark, root, "bad")
      Snapshots.commit(
        spark.range(1).select(lit(-1L).as("c_custkey"),
          lit(null).cast("string").as("seg"), lit(0.0).as("bal")),
        Branches.root(root, "bad"), append = true)
      require(Branches.publishIf(spark, root, "bad", gate).isLeft,
        "poisoned branch must fail its audit")
      Branches.drop(spark, root, "bad")

      // real batch: branch upsert, audit passes, atomic fast-forward
      Branches.fork(spark, root, "staging")
      val upd = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), lit("AUDITED").as("seg"),
          (col("bal") + 10.0).as("bal"))
        .unionByName(cust.filter(col("c_custkey") % 50 === 0)
          .select((col("c_custkey") + 200000L).as("c_custkey"),
            lit("STAGED").as("seg"), lit(0.5).as("bal")))
      Snapshots.merge(upd, Branches.root(root, "staging"), "c_custkey",
        statsCols = Seq("c_custkey"))
      require(Branches.publishIf(spark, root, "staging", gate).isRight,
        "clean branch must publish")
      Branches.drop(spark, root, "staging")
      Snapshots.read(spark, root).orderBy("c_custkey")
    },

    // ---- q114: BRANCH DIFF REVIEW — pendingChangesTyped surfaces the exact
    //            row-level diff a branch publish WOULD make visible, before
    //            anything publishes: a reviewer reads the staged upsert +
    //            vectored delete as classified update_pre/update_post /
    //            insert / delete rows while main is still at its fork
    //            version (pinned in-query). The cost is the branch's CHANGED
    //            FILES only (the branch's first manifest IS the fork state,
    //            so the diff never rescans the shared base). The oracle
    //            rebuilds fork state and branch state in SQL and classifies
    //            the EXCEPT ALL diff the same way — row-exact, proving the
    //            review surface equals what publish would ship. ----
    OracleQuery(
      "q114_branch_diff",
      """WITH t1 AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |                   o_totalprice AS price FROM orders),
        |upd AS (SELECT k, 'R' AS st, price + 1.0 AS price FROM t1 WHERE k % 11 = 0),
        |ins AS (SELECT k + 900000 AS k, 'N' AS st, CAST(100.0 AS DOUBLE) AS price
        |        FROM t1 WHERE k % 97 = 0),
        |t2 AS (SELECT * FROM t1 WHERE k % 11 <> 0
        |       UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |t3 AS (SELECT * FROM t2 WHERE NOT (st = 'F' AND k % 13 = 0)),
        |ni AS (SELECT * FROM t3 EXCEPT ALL SELECT * FROM t1),
        |nd AS (SELECT * FROM t1 EXCEPT ALL SELECT * FROM t3),
        |typed AS (
        |  SELECT ni.*, CASE WHEN ni.k IN (SELECT k FROM nd)
        |    THEN 'update_post' ELSE 'insert' END AS chg FROM ni
        |  UNION ALL
        |  SELECT nd.*, CASE WHEN nd.k IN (SELECT k FROM ni)
        |    THEN 'update_pre' ELSE 'delete' END AS chg FROM nd)
        |SELECT k, st, price, chg FROM typed
        |ORDER BY k, chg, st, price""".stripMargin) { (spark, dir) =>
      import graft.engine.Branches
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_review"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val t1 = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("price"))
      Snapshots.commit(t1.repartitionByRange(6, col("k")), root,
        statsCols = Seq("k"))
      Branches.fork(spark, root, "review")
      val bRoot = Branches.root(root, "review")
      val batch = t1.filter(col("k") % 11 === 0)
        .select(col("k"), lit("R").as("st"), (col("price") + 1.0).as("price"))
        .unionByName(t1.filter(col("k") % 97 === 0)
          .select((col("k") + 900000L).as("k"), lit("N").as("st"),
            lit(100.0).as("price")))
      Snapshots.merge(batch, bRoot, "k", statsCols = Seq("k"))
      Snapshots.deleteWhere(spark, bRoot,
        col("st") === "F" && col("k") % 13 === 0)
      val diff = Branches.pendingChangesTyped(spark, root, "review", "k")
        .withColumnRenamed("_change", "chg")
        .orderBy("k", "chg", "st", "price")
      require(Snapshots.headVersion(spark, root) == 1,
        "reviewing a branch diff must not touch main")
      diff
    },

    // ---- q116: TABLE CHECK CONSTRAINTS — a persisted rule on the TABLE
    //            (not any one writer) vets every write verb: a poisoned
    //            upsert (negative price) aborts at WRITE time with zero
    //            residue — the head never moves, staged files are swept —
    //            and the clean upsert lands normally. Enforcement rides
    //            the write job as Observation metrics (no second scan of
    //            the batch, at any batch size). The oracle computes the
    //            clean merge alone: a hash match proves both that the
    //            constraint blocked the bad batch completely and that it
    //            cost the good one nothing. ----
    OracleQuery(
      "q116_check_constraints",
      """WITH t AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |clean AS (SELECT k, price + 5.0 AS price FROM t WHERE k % 19 = 0)
        |SELECT k, price FROM clean
        |UNION ALL SELECT k, price FROM t WHERE k % 19 <> 0
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_checked"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val t = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      Snapshots.commit(t.repartitionByRange(4, col("k")), root,
        statsCols = Seq("k"))
      Checks.add(spark, root, "price_pos", "price > 0")

      // poisoned upsert: rejected at write time, nothing published
      val poison = t.filter(col("k") % 19 === 0)
        .select(col("k"), lit(-1.0).as("price"))
      val rejected =
        try { Snapshots.merge(poison, root, "k", statsCols = Seq("k")); false }
        catch {
          // the CHECK must be what fired — any other argument error (a
          // head-race abort, a collision give-up) must fail the query
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains("price_pos") => true
        }
      require(rejected, "the poisoned merge must violate the check")
      require(Snapshots.headVersion(spark, root) == 1,
        "a rejected write must leave the head untouched")

      // the clean version of the same upsert lands
      Snapshots.merge(
        t.filter(col("k") % 19 === 0)
          .select(col("k"), (col("price") + 5.0).as("price")),
        root, "k", statsCols = Seq("k"))
      Snapshots.read(spark, root).orderBy("k")
    },

    // ---- q117: CONFLICT-VALIDATED MERGE REBASE — a keyed merge loses the
    //            head race to a concurrent append (injected
    //            deterministically at the engine's pre-publish seam) whose
    //            keys are provably disjoint through the stats index. Old
    //            behavior: abort, recompute, re-run the data pass. Now:
    //            the pre-written output re-points at the new head —
    //            metadata only, zero data rewritten — because disjoint
    //            commits commute. The oracle computes the SERIAL
    //            append-then-merge result: a hash match proves the rebased
    //            publish is indistinguishable from the serial schedule
    //            (snapshot isolation's promise), with neither the racer's
    //            rows nor the merge's updates lost. ----
    OracleQuery(
      "q117_merge_rebase",
      """WITH t AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |racer AS (SELECT k + 500000 AS k, CAST(9.99 AS DOUBLE) AS price
        |          FROM t WHERE k % 41 = 0),
        |upd AS (SELECT k, price + 1.0 AS price FROM t WHERE k % 23 = 0)
        |SELECT k, price FROM upd
        |UNION ALL SELECT k, price FROM t WHERE k % 23 <> 0
        |UNION ALL SELECT k, price FROM racer
        |ORDER BY k""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_rebase"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val t = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      Snapshots.commit(t.repartitionByRange(4, col("k")), root,
        statsCols = Seq("k"))
      // the racer lands BETWEEN the merge's data write and its publish
      Snapshots.testPrePublishHook = () => {
        Snapshots.testPrePublishHook = () => ()
        Snapshots.commit(
          t.filter(col("k") % 41 === 0)
            .select((col("k") + 500000L).as("k"), lit(9.99).as("price")),
          root, append = true, statsCols = Seq("k"))
      }
      try
        Snapshots.merge(
          t.filter(col("k") % 23 === 0)
            .select(col("k"), (col("price") + 1.0).as("price")),
          root, "k", statsCols = Seq("k"))
      finally Snapshots.testPrePublishHook = () => ()
      require(Snapshots.headVersion(spark, root) == 3,
        "the merge must have published ON TOP of the interim append (v3)")
      Snapshots.read(spark, root).orderBy("k")
    },

    // ---- q118: TEMPORAL FILE SKIPPING — the stats index records epoch
    //            SECONDS for timestamp columns and the predicate miner
    //            converts literals (internally MICROS) to the same unit,
    //            so the analyst's plain `ts >= ... AND ts < ...` band over
    //            a time-clustered table prunes whole files before
    //            planning (required in-query: the scan reads fewer files
    //            than the table holds). The single most common lake
    //            predicate, and the exact shape where a units slip
    //            silently empties the result — which is why it sits under
    //            the hash gate. ----
    OracleQuery(
      "q118_time_band",
      s"""SELECT event_type, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("value")} AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_tband"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "events")
          .select(col("ts"), col("event_type"), col("value"))
          .repartitionByRange(6, col("ts")),
        root, statsCols = Seq("ts"))
      val cond = col("ts") >= lit(java.time.LocalDateTime.of(2024, 1, 10, 0, 0)) &&
        col("ts") < lit(java.time.LocalDateTime.of(2024, 1, 20, 0, 0))
      val banded = Snapshots.readWhere(spark, root, cond)
      val scanned = banded.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
      val total = Snapshots.manifest(spark, root,
        Snapshots.headVersion(spark, root)).files.size
      require(scanned < total,
        s"the time band must prune files ($scanned of $total scanned)")
      banded.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },

    // ---- q119: DSv2 BATCH READ OF A SNAPSHOT TABLE — the user-facing
    //            half of the manifest index: plain `spark.sql` over a
    //            registered DataSource-V2 view of the table gets the SAME
    //            file pruning as the readWhere API (pushed filters mined
    //            against the stats index inside the scan,
    //            graft.engine.FilterPrune) and the SAME merge-on-read
    //            semantics (deletion vectors applied by the per-file
    //            readers). Required in-query: the scan plans fewer
    //            partitions than the table holds files, AND the head
    //            actually carries vectors — so both claims sit under the
    //            hash gate, not in a spec alone. ----
    OracleQuery(
      "q119_dsv2_batch_read",
      s"""SELECT event_type, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("value")} AS sum_value
        |FROM events
        |WHERE NOT (value < 5.0)
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_dsv2"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "events")
          .select(col("ts"), col("event_type"), col("value"))
          .repartitionByRange(6, col("ts")),
        root, statsCols = Seq("ts"))
      // scattered low-value rows land as deletion vectors (merge-on-read)
      Snapshots.deleteWhere(spark, root, col("value") < 5.0)
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      require(m.dvs.nonEmpty, "the delete must land as vectors, not rewrites")
      spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .createOrReplaceTempView("events_snap")
      val res = spark.sql(
        """SELECT event_type, count(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM events_snap
          |WHERE ts >= TIMESTAMP'2024-01-10 00:00:00'
          |  AND ts < TIMESTAMP'2024-01-20 00:00:00'
          |GROUP BY event_type ORDER BY event_type""".stripMargin)
      val scanned = res.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
      }.sum
      require(scanned < m.files.size,
        s"SQL over the DSv2 table must prune files ($scanned of ${m.files.size})")
      res
    },

    // ---- q120: DSv2 RUNTIME (DPP) FILTERING — the dynamic half of the
    //            snapshot scan's file pruning: when the snapshot table is
    //            the probe side of a join, the build side's key set lands
    //            on the scan AT EXECUTION (SupportsRuntimeFiltering) and
    //            re-prunes files through the same stats index the static
    //            pushdown uses. Required in-query: (a) the executed join
    //            plan carries a runtime filter on the DSv2 scan, (b) a
    //            direct IN-set application provably shrinks the planned
    //            partitions — so the scale claim (a dimension-filtered
    //            fact scan reads matching fact files, not the table) sits
    //            under the hash gate. ----
    OracleQuery(
      "q120_dsv2_runtime_filter",
      s"""SELECT o.o_orderpriority, count(*) AS n_items,
        |  ${graft.engine.Det.sql.dsum("l.l_quantity")} AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate >= DATE '1997-03-01'
        |  AND o.o_orderdate < DATE '1997-03-08'
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_rtf"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey"))
      val fact = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
      val dim = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1997-03-01")) &&
          col("o_orderdate") < lit(java.sql.Date.valueOf("1997-03-08")))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val res = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
      // (a) Spark inserted the runtime filter on the fact scan
      require(res.queryExecution.executedPlan.toString.contains("RuntimeFilters: ["),
        "expected a runtime (DPP) filter on the DSv2 fact scan")
      // (b) a direct IN-set application shrinks the planned partitions:
      // pruning evidence independent of Spark's insertion heuristics
      val scan = fact.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head
      val static = scan.toBatch.planInputPartitions().length
      val rtf = scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      val someKeys = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey")).limit(2)
        .collect().map(_.getLong(0)).distinct
      rtf.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("l_orderkey", someKeys.map(_.asInstanceOf[Any]))))
      val dynamic = scan.toBatch.planInputPartitions().length
      require(dynamic < static,
        s"runtime IN-set must prune the planned files ($dynamic of $static)")
      res
    },

    // ---- q121: DSv2 COUNT(*) PUSHDOWN — an ungrouped, unfiltered count
    //            over a snapshot table answers from the MANIFEST (per-file
    //            recorded row counts minus deletion-vector cardinalities):
    //            the scan plans ONE synthetic partition and opens zero
    //            data files. The DSv2 twin of the native count rewrite
    //            (q110). Required in-query: the executed plan carries the
    //            pushed-count scan AND the table's head holds vectors — so
    //            the DV-adjustment claim sits under the hash gate. ----
    OracleQuery(
      "q121_dsv2_count_pushdown",
      """SELECT CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE NOT (l_quantity < 5.0)""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_cnt"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_quantity"))
      Snapshots.deleteWhere(spark, root, col("l_quantity") < 5.0)
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      require(m.dvs.nonEmpty, "the delete must land as vectors, not rewrites")
      val cnt = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy().count()
      val descs = cnt.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          (b.scan.description(), b.inputPartitions.length)
      }
      require(descs.exists { case (d, np) =>
        d.contains("PushedAggregates: [COUNT(*)]") && np == 1 },
        s"expected the manifest count scan, got $descs")
      cnt.select(col("count").cast("long").as("n"))
    },

    // ---- q122: DSv2 BATCH WRITE — `df.write.format(...).save()` IS an
    //            engine commit (V1Write bridge onto Snapshots.commit):
    //            two appends land as two manifest versions, the write
    //            option `statsCols` indexes the new files, and the
    //            round-trip through the DSv2 read must be row-exact
    //            against DuckDB over the original source. ----
    OracleQuery(
      "q122_dsv2_write_commit",
      s"""SELECT l_linestatus, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_w"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linestatus"), col("l_quantity"))
      val Fmt = "graft.streaming.SnapshotSourceProvider"
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(Fmt).option("root", root)
        .option("statsCols", "l_orderkey").mode("append").save()
      li.filter(col("l_orderkey") % 2 =!= 0)
        .write.format(Fmt).option("root", root)
        .option("statsCols", "l_orderkey").mode("append").save()
      require(Snapshots.headVersion(spark, root) == 2L,
        "each df.write append must land as one manifest version")
      spark.read.format(Fmt).option("root", root).load()
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_linestatus")
    },

    // ---- q124: DSv2 MIN/MAX/COUNT PUSHDOWN — an ungrouped aggregate mix
    //            over a stats-indexed snapshot table answers entirely from
    //            the MANIFEST (per-file ranges + row counts): the scan
    //            plans ONE synthetic partition and opens zero data files.
    //            Only provably-exact answers push: int/date always, long
    //            within ±2^53; floats (NaN) and timestamps (stats store
    //            seconds) never. Required in-plan: the pushed-agg scan. ----
    OracleQuery(
      "q124_dsv2_minmax_pushdown",
      """SELECT min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  min(l_linenumber) AS min_ln, max(l_linenumber) AS max_ln,
        |  CAST(min(CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS min_sd,
        |  CAST(max(CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS max_sd,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_mm"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate").cast("date").as("l_sdate"))
          .repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey", "l_linenumber", "l_sdate"))
      val agg = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .agg(min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
          min(col("l_linenumber")).as("min_ln"), max(col("l_linenumber")).as("max_ln"),
          min(col("l_sdate")).cast("timestamp_ntz").as("min_sd"),
          max(col("l_sdate")).cast("timestamp_ntz").as("max_sd"),
          count(lit(1)).as("n"))
      val descs = agg.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          (b.scan.description(), b.inputPartitions.length)
      }
      require(descs.exists { case (d, np) =>
        d.contains("PushedAggregates") && d.contains("MIN(l_orderkey)") &&
          d.contains("MAX(l_sdate)") && np == 1 },
        s"expected the manifest min/max scan, got $descs")
      agg
    },

    // ---- q125: SQL CATALOG ROUND-TRIP — CTAS creates a hash-clustered
    //            snapshot table from SQL, INSERT INTO appends the other
    //            half INHERITING the clustering spec (a SQL insert must
    //            not declassify the layout), and the catalog read of the
    //            final table must match DuckDB over the original source.
    //            Required in-query: both versions carry the spec. ----
    OracleQuery(
      "q125_sql_catalog_roundtrip",
      s"""SELECT o_orderpriority, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_tp
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_sql"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src")
      spark.sql(
        s"CREATE TABLE graft.`$root` PARTITIONED BY (bucket(8, o_orderkey)) AS " +
          "SELECT * FROM orders_src WHERE o_orderkey % 2 = 0")
      spark.sql(s"INSERT INTO graft.`$root` " +
        "SELECT * FROM orders_src WHERE o_orderkey % 2 <> 0")
      val head = Snapshots.headVersion(spark, root)
      // CTAS stages atomically: the SELECT's write IS v1 (no pre-committed
      // empty table), then the INSERT appends v2
      require(head == 2L, s"expected atomic-CTAS+insert = 2 versions, got $head")
      require(Snapshots.clusteringAt(spark, root, head)
        .contains(Snapshots.Clustering(Seq("o_orderkey"), 8)),
        "the SQL insert must inherit the clustering spec, not drop it")
      spark.sql(
        s"""SELECT o_orderpriority, count(*) AS n,
          |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_tp
          |FROM graft.`$root`
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // ---- q126: SQL DELETE — `DELETE FROM graft.\`t\` WHERE ...` lands as
    //            the engine's MERGE-ON-READ delete (positions folded into
    //            per-file deletion vectors; zero data files rewritten —
    //            required in-query), and the post-delete read must equal
    //            DuckDB's surviving rows. The oracle applies SQL DELETE
    //            semantics: rows where the predicate is TRUE die, all
    //            others (FALSE and NULL) survive. ----
    OracleQuery(
      "q126_sql_delete",
      s"""SELECT l_returnflag, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |WHERE NOT (l_returnflag IN ('A') AND l_orderkey <= 30000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_del"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
          .repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey"))
      val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
      spark.sql(s"DELETE FROM graft.`$root` " +
        "WHERE l_returnflag IN ('A') AND l_orderkey <= 30000")
      val m2 = Snapshots.manifest(spark, root, 2L)
      require(m2.files.toSet == filesBefore && m2.dvs.nonEmpty,
        "SQL DELETE must vector rows (merge-on-read), not rewrite files")
      spark.sql(
        s"""SELECT l_returnflag, count(*) AS n,
          |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
          |FROM graft.`$root`
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // ---- q127: SQL UPDATE + MERGE — group-based copy-on-write row-level
    //            operations: an UPDATE re-prices a key range (rewriting
    //            only the files its stats-pruned predicate touches —
    //            required in-query: most files carry by reference), then
    //            a MERGE upserts a delta (matched rows update, new keys
    //            insert); the final table must equal DuckDB applying the
    //            same UPDATE+MERGE algebra to the source. ----
    OracleQuery(
      "q127_sql_update_merge",
      s"""WITH updated AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey <= 5000
        |      THEN o_totalprice * CAST(2 AS DOUBLE) ELSE o_totalprice
        |    END AS o_totalprice
        |  FROM orders
        |), delta AS (
        |  SELECT o_orderkey * 10 AS d_key, CAST(1.5 AS DOUBLE) AS d_price
        |  FROM orders WHERE o_orderkey <= 400
        |), merged AS (
        |  SELECT u.o_orderkey,
        |    COALESCE(d.d_price, u.o_totalprice) AS o_totalprice
        |  FROM updated u LEFT JOIN delta d ON u.o_orderkey = d.d_key
        |  UNION ALL
        |  SELECT d.d_key, d.d_price FROM delta d
        |  WHERE NOT EXISTS (SELECT 1 FROM updated u WHERE u.o_orderkey = d.d_key)
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_p
        |FROM merged""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_rl"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      val src = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("o_totalprice"))
      Snapshots.commit(src.repartitionByRange(8, col("o_orderkey")),
        root, statsCols = Seq("o_orderkey"))
      val m1 = Snapshots.manifest(spark, root, 1L)
      // files whose recorded o_orderkey range sits wholly above the
      // predicate can be PROVEN untouched — the stats miner must carry
      // exactly those by reference (scale-free pin: at sf0.001 the
      // cutoff spans every file and the set is empty; at sf0.01+ it is
      // most of the 8 range files)
      val provablyUntouched = m1.stats
        .filter(st => st.col == "o_orderkey" && st.min > 5000.0)
        .map(_.file).toSet
      spark.sql(s"UPDATE graft.`$root` " +
        "SET o_totalprice = o_totalprice * CAST(2 AS DOUBLE) " +
        "WHERE o_orderkey <= 5000")
      val after = Snapshots.manifest(spark, root, 2L).files
        .map(u => new Path(u).getName).toSet
      require(provablyUntouched.subsetOf(after),
        s"a stats-pruned UPDATE must carry provably-untouched files by " +
          s"reference (${provablyUntouched.size} expected)")
      src.where(col("o_orderkey") <= 400)
        .select((col("o_orderkey") * 10).as("d_key"), lit(1.5).as("d_price"))
        .createOrReplaceTempView("orders_delta")
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING orders_delta d ON t.o_orderkey = d.d_key
          |WHEN MATCHED THEN UPDATE SET o_totalprice = d.d_price
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) VALUES (d.d_key, d.d_price)
          |""".stripMargin)
      spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
          |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_p
          |FROM graft.`$root`""".stripMargin)
    },

    // ---- q128: SQL CALL PROCEDURES — the admin lifecycle from SQL: a
    //            DELETE mutates the table, CALL restore rolls it back as
    //            history, CALL compact folds the layout, CALL vacuum
    //            reclaims — and the final read must still equal DuckDB
    //            over the untouched source (the lifecycle is row-neutral
    //            by construction). Required in-query: history row count
    //            tracks the commits, compact leaves target_files files. ----
    OracleQuery(
      "q128_sql_procedures",
      s"""SELECT l_linestatus, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_extendedprice")} AS sum_ep
        |FROM lineitem
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_proc"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linestatus"), col("l_extendedprice"))
          .repartitionByRange(4, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey"))
      spark.sql(s"DELETE FROM graft.`$root` WHERE l_orderkey <= 1000")
      require(spark.sql(s"CALL graft.system.history('$root')").count() == 2L,
        "commit + delete = 2 history rows")
      spark.sql(s"CALL graft.system.restore('$root', version => 1)")
      spark.sql(s"CALL graft.system.compact('$root', target_files => 2, " +
        "stats_cols => 'l_orderkey')")
      require(Snapshots.manifest(spark, root,
        Snapshots.headVersion(spark, root)).files.size == 2,
        "compact must leave exactly target_files files")
      spark.sql(s"CALL graft.system.vacuum('$root', keep_last => 1)")
      spark.sql(
        s"""SELECT l_linestatus, count(*) AS n,
          |  ${graft.engine.Det.sql.dsum("l_extendedprice")} AS sum_ep
          |FROM graft.`$root`
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    },

    // ---- q129: SQL WRITE-AUDIT-PUBLISH — a branch forked by CALL takes
    //            SQL DML (DELETE + INSERT) invisibly (required in-query:
    //            main is bit-unchanged while the branch diverges), then
    //            publish fast-forwards main atomically; the published
    //            table must equal DuckDB applying the same algebra. ----
    OracleQuery(
      "q129_sql_wap",
      s"""WITH staged AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE NOT (o_orderkey <= 2000)
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, CAST(9.5 AS DOUBLE) FROM orders
        |  WHERE o_orderkey <= 300
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_p
        |FROM staged""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_wap"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Snapshots.commit(
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").cast("double").as("o_totalprice"))
          .repartitionByRange(4, col("o_orderkey")),
        root, statsCols = Seq("o_orderkey"))
      spark.sql(s"CALL graft.system.create_branch('$root', 'audit')")
      spark.sql(s"DELETE FROM graft.`$root@ref=audit` WHERE o_orderkey <= 2000")
      spark.sql(s"INSERT INTO graft.`$root@ref=audit` " +
        "SELECT o_orderkey + 1000000, CAST(9.5 AS DOUBLE) " +
        s"FROM graft.`$root` WHERE o_orderkey <= 300")
      // audit gate: main must be bit-unchanged while the branch diverges
      require(Snapshots.headVersion(spark, root) == 1L,
        "branch DML must not advance main before publish")
      require(spark.sql(
        s"SELECT count(*) FROM graft.`$root` WHERE o_orderkey > 1000000")
        .head().getLong(0) == 0L, "main must not see branch inserts")
      spark.sql(s"CALL graft.system.publish_branch('$root', 'audit')")
      spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
          |  ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_p
          |FROM graft.`$root`""".stripMargin)
    },

    // ---- q130: STREAMING BACKFILL ACROSS COMPACTION — a stream catching
    //            up over an interleaved append→compact→append history
    //            must emit every row EXACTLY ONCE: the span-provenance
    //            walk proves the interim compaction row-invisible (its
    //            outputs carry only pre-span rows) instead of
    //            crash-looping or double-emitting. The streamed-into sink
    //            is hash-compared against DuckDB over the source rows —
    //            the batch equivalent is plain SQL. ----
    OracleQuery(
      "q130_stream_backfill",
      s"""SELECT l_returnflag, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_bf"
      val sink = s"$lakeBase/lineitem_bf_sink"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(sink), true)
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      // interleaved history: append half, compact (optimize-tagged,
      // row-preserving), append the other half
      Snapshots.commit(li.filter(col("l_orderkey") % 2 === 0)
        .repartition(4), root)
      Snapshots.compact(spark, root, targetFiles = 1)
      Snapshots.commit(li.filter(col("l_orderkey") % 2 =!= 0)
        .repartition(4), root, append = true)
      // catch-up stream from the beginning of history into a sink table
      val ck = java.nio.file.Files.createTempDirectory("bf_ck").toString
      val q = graft.streaming.SnapshotSink.start(
        spark.readStream.format("graft.streaming.SnapshotSourceProvider")
          .option("root", root).option("startingVersion", "earliest").load(),
        sink, ck)
      try q.processAllAvailable() finally q.stop()
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      spark.sql(
        s"""SELECT l_returnflag, count(*) AS n,
          |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
          |FROM graft.`$sink`
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // ---- q131: SQL TYPE-WIDENING ALTER — int/float columns widen to
    //            bigint/double as METADATA-ONLY commits (required
    //            in-query: zero files rewritten); narrow-generation files
    //            decode under the wide schema, a post-widen INSERT writes
    //            the wide type, and a MERGE updates rows living in
    //            narrow files — the final aggregate must equal DuckDB
    //            applying the same widen+append+merge algebra. ----
    OracleQuery(
      "q131_sql_widen",
      s"""WITH base AS (
        |  SELECT CAST(o_orderkey AS INTEGER) AS k,
        |    -- integer-valued floats: exact in float, double, and decimal,
        |    -- so the widened read can hash-match decimal-exact arithmetic
        |    -- (fractional float bits round differently DuckDB-vs-JVM)
        |    CAST(CAST(FLOOR(CAST(o_totalprice AS DOUBLE)) AS REAL) AS DOUBLE) AS p
        |  FROM orders
        |), merged AS (
        |  SELECT CAST(k AS BIGINT) AS k,
        |    CASE WHEN k <= 300 THEN CAST(9.25 AS DOUBLE) ELSE p END AS p
        |  FROM base
        |  UNION ALL
        |  SELECT CAST(k AS BIGINT) + 3000000, CAST(2.5 AS DOUBLE)
        |  FROM base WHERE k <= 500
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  ${graft.engine.Det.sql.dsum("p")} AS sum_p
        |FROM merged""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_widen"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Snapshots.commit(
        Tables(spark, dir, "orders")
          .select(col("o_orderkey").cast("int").as("k"),
            floor(col("o_totalprice").cast("double")).cast("float").as("p"))
          .repartitionByRange(4, col("k")),
        root, statsCols = Seq("k"))
      val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
      spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN k TYPE BIGINT")
      spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN p TYPE DOUBLE")
      require(Snapshots.manifest(spark, root, 3L).files.toSet == filesBefore,
        "type widening must be metadata-only (no file rewritten)")
      require(spark.table(s"graft.`$root`").schema("k").dataType
        == org.apache.spark.sql.types.LongType,
        "catalog must surface the widened type")
      // wide-generation append + a MERGE whose updates land in NARROW files
      spark.sql(s"INSERT INTO graft.`$root` " +
        s"SELECT CAST(k AS BIGINT) + 3000000, CAST(2.5 AS DOUBLE) " +
        s"FROM graft.`$root` WHERE k <= 500")
      spark.sql(
        s"""MERGE INTO graft.`$root` t
          |USING (SELECT k AS mk FROM graft.`$root` WHERE k <= 300) s
          |ON t.k = s.mk
          |WHEN MATCHED THEN UPDATE SET p = CAST(9.25 AS DOUBLE)""".stripMargin)
      spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(k) AS BIGINT) AS sum_k,
          |  ${graft.engine.Det.sql.dsum("p")} AS sum_p
          |FROM graft.`$root`""".stripMargin)
    },

    // ---- q132: SQL ALTER SURFACE END-TO-END — RENAME COLUMN (metadata-
    //            only, column mapping), then INSERT INTO (by-position,
    //            writing under the rename-stable physical name), then a
    //            MERGE keyed on the RENAMED column, read back through the
    //            catalog — the SQL twin of the q98 rename machinery,
    //            certified under the hash gate. ----
    OracleQuery(
      "q132_sql_alter_surface",
      s"""WITH base AS (
        |  SELECT c_custkey AS cust_id,
        |    CAST(c_acctbal AS DOUBLE) AS bal
        |  FROM customer
        |), appended AS (
        |  SELECT cust_id, bal FROM base
        |  UNION ALL
        |  SELECT cust_id + 1000000, CAST(0.5 AS DOUBLE) FROM base
        |  WHERE cust_id <= 200
        |), merged AS (
        |  SELECT cust_id,
        |    CASE WHEN cust_id % 10 = 3 THEN bal + CAST(50 AS DOUBLE)
        |         ELSE bal END AS bal
        |  FROM appended
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cust_id) AS BIGINT) AS sum_id,
        |  ${graft.engine.Det.sql.dsum("bal")} AS sum_bal
        |FROM merged""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/customer_alter"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      Snapshots.commit(
        Tables(spark, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal").cast("double").as("bal"))
          .repartitionByRange(4, col("c_custkey")),
        root, statsCols = Seq("c_custkey"))
      val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN c_custkey TO cust_id")
      require(Snapshots.manifest(spark, root, 2L).files.toSet == filesBefore,
        "rename must be metadata-only")
      // by-position INSERT writes under the rename-stable PHYSICAL name
      spark.sql(s"INSERT INTO graft.`$root` " +
        s"SELECT cust_id + 1000000, CAST(0.5 AS DOUBLE) " +
        s"FROM graft.`$root` WHERE cust_id <= 200")
      // MERGE keyed on the RENAMED column updates rows in pre-rename files
      spark.sql(
        s"""MERGE INTO graft.`$root` t
          |USING (SELECT cust_id AS mk FROM graft.`$root` WHERE cust_id % 10 = 3) s
          |ON t.cust_id = s.mk
          |WHEN MATCHED THEN UPDATE SET bal = t.bal + CAST(50 AS DOUBLE)""".stripMargin)
      spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(cust_id) AS BIGINT) AS sum_id,
          |  ${graft.engine.Det.sql.dsum("bal")} AS sum_bal
          |FROM graft.`$root`""".stripMargin)
    },

    // ---- q133: NATIVE STREAMING KEYED UPSERT — a CDC-shaped feed
    //            streamed through `writeStream.option("upsertKey", k)`
    //            (no foreachBatch): each epoch lands as ONE tagged keyed
    //            merge — updates replace, inserts append, a replayed
    //            epoch no-ops. The final table must equal DuckDB applying
    //            the same upsert algebra to the source. ----
    OracleQuery(
      "q133_stream_upsert",
      s"""WITH upserted AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 10 = 3 THEN CAST(1.25 AS DOUBLE)
        |         ELSE CAST(o_totalprice AS DOUBLE) END AS p
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 2000000, CAST(7.5 AS DOUBLE)
        |  FROM orders WHERE o_orderkey <= 400
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  ${graft.engine.Det.sql.dsum("p")} AS sum_p
        |FROM upserted""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val target = s"$lakeBase/orders_upstream"
      val feed = s"$lakeBase/orders_upfeed"
      val fsys = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(target), true)
      fsys.delete(new Path(feed), true)
      val src = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("double").as("p"))
      Snapshots.commit(src.repartitionByRange(4, col("k")), target,
        statsCols = Seq("k"))
      // the CDC feed: key-disjoint updates + inserts (order-insensitive,
      // so any micro-batch grouping yields the same final table)
      Snapshots.commit(
        src.where(col("k") % 10 === 3).select(col("k"), lit(1.25).as("p"))
          .unionByName(src.where(col("k") <= 400)
            .select((col("k") + 2000000).as("k"), lit(7.5).as("p"))),
        feed)
      val ck = java.nio.file.Files.createTempDirectory("up_ck").toString
      val fmt = "graft.streaming.SnapshotSourceProvider"
      val q = spark.readStream.format(fmt)
        .option("root", feed).option("startingVersion", "earliest").load()
        .writeStream.format(fmt)
        .option("root", target).option("upsertKey", "k")
        .option("statsCols", "k")
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
      // required in-query: the feed landed as epoch-tagged MERGE commits
      // (the native path), not as appends
      val tags = Snapshots.historyMeta(spark, target).map(_.tag)
      require(tags.exists(_.startsWith("stream-")),
        s"expected epoch-tagged upsert commits, got $tags")
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(k) AS BIGINT) AS sum_k,
          |  ${graft.engine.Det.sql.dsum("p")} AS sum_p
          |FROM graft.`$target`""".stripMargin)
    },

    // ---- q134: REDUCIBLE-BUCKET SPJ — lineitem clustered 32, orders 16:
    //            divisible counts join with ZERO exchanges (required
    //            in-plan — the finer side's partitions coalesce by
    //            id % 16 via the bucket function's ReducibleFunction),
    //            and the result hash-matches DuckDB's plain join. The
    //            100 TB point: bucket-count evolution (re-clustering a
    //            grown table at 2× buckets) never re-buys either side's
    //            shuffle against not-yet-evolved tables. ----
    OracleQuery(
      "q134_reducible_spj",
      s"""SELECT o_orderpriority, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val liRoot = s"$lakeBase/lineitem_rspj"
      val ordRoot = s"$lakeBase/orders_rspj"
      val fsys = new Path(liRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(liRoot), true)
      fsys.delete(new Path(ordRoot), true)
      Par(
        () => Snapshots.commit(
          Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
          liRoot, clusterBy = Some((Seq("l_orderkey"), 32))),
        () => Snapshots.commit(
          Tables(spark, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_orderpriority"),
          ordRoot, clusterBy = Some((Seq("o_orderkey"), 16))))
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
      val prev = keys.map(k => k -> spark.conf.getOption(k))
      try {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = spark.table(s"graft.`$liRoot`")
        val ord = spark.table(s"graft.`$ordRoot`")
          .filter(col("o_orderstatus") === "O")
        val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        val p = joined.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$p")
        require(!p.contains("Exchange"),
          s"32-vs-16 clustered join must plan with zero exchanges:\n$p")
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
          .localCheckpoint(true)
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    },

    // ---- q135: ROW-GROUP PREDICATE PUSHDOWN — lineitem compacted to ONE
    //            key-sorted file with ~1 MB row groups; a point predicate
    //            must decode a FRACTION of the file (required in-query:
    //            the scan's output rows < half the table — footer stats +
    //            page indexes skip the non-matching row groups), while the
    //            result hash-matches DuckDB. The 100 TB point: inside a
    //            1 GB file with 128 MB row groups, a pruned read costs
    //            1/8th of a boundary file, and this is the gate that
    //            proves the predicate actually reaches the reader. ----
    OracleQuery(
      "q135_rowgroup_point",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem WHERE l_orderkey = 1""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_rg"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val hc = spark.sparkContext.hadoopConfiguration
      val oldBlock = Option(hc.get("parquet.block.size"))
      hc.set("parquet.block.size", (1 << 17).toString) // ~128 KB row groups
      try {
        Snapshots.commit(
          Tables(spark, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity")
            .repartition(1).sortWithinPartitions("l_orderkey"),
          root)
      } finally oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      val m1 = Snapshots.manifest(spark, root, 1L)
      require(m1.files.size == 1)
      // the skip gate only binds when the file actually HAS row groups to
      // skip (sf0.001's lineitem fits one group — nothing to prune there)
      val rowGroups = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(m1.files.head), hc)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }
      // total from the manifest's per-file row counts — metadata, no scan
      val total = m1.rows.map(_.n).sum
      require(total > 0, "commit must record per-file row counts")
      val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load().filter(col("l_orderkey") === 1L)
      // ONE execution: materialize the hash-checked agg itself, then gate
      // on ITS BatchScanExec metrics (the old warm-up collect() ran the
      // filtered scan twice and put a driver materialization in the query)
      val res = q.agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("l_linenumber")).cast("bigint").as("sum_ln"),
        graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
      val out = res.localCheckpoint(true)
      val decoded = scanOutputRows(res.queryExecution.executedPlan)
      if (rowGroups > 1)
        require(decoded > 0 && decoded < total / 2,
          s"point predicate must skip row groups " +
            s"(decoded $decoded of $total across $rowGroups groups)")
      out
    },

    // ---- q136: ONE-SIDE-SHUFFLE SPJ — lineitem clustered on its join
    //            key, orders left UNCLUSTERED: under
    //            `v2.bucketing.shuffle.enabled` Spark shuffles ONLY the
    //            plain side, routing its rows through the engine's served
    //            `bucket` function into the storage buckets (required
    //            in-plan: at most one Exchange, and none above the
    //            clustered scan). Hash-exactness is the real certification
    //            — a writer/function disagreement on key→bucket silently
    //            DROPS matches rather than erroring, and only the DuckDB
    //            compare can see that. ----
    OracleQuery(
      "q136_oneside_spj",
      s"""SELECT o_orderpriority, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'P'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val liRoot = s"$lakeBase/lineitem_ospj"
      val fsys = new Path(liRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(liRoot), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
        liRoot, clusterBy = Some((Seq("l_orderkey"), 16)))
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.shuffle.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
      val prev = keys.map(k => k -> spark.conf.getOption(k))
      try {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = spark.table(s"graft.`$liRoot`")
        val ord = Tables(spark, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_orderpriority")
          .filter(col("o_orderstatus") === "P")
        val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        val p = joined.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require("""\(\d+\) Exchange""".r.findAllIn(p).size <= 1,
          s"only the unclustered side may shuffle:\n$p")
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
          .localCheckpoint(true)
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    },

    // ---- q137: PARQUET-BLOOM ROW-GROUP PRUNING — the string twin of
    //            q135: a key-SHUFFLED single file (every row group's
    //            [min,max] string range spans ~everything, so footer
    //            stats cannot discriminate) with bloom-indexed keys; a
    //            string point predicate must decode a fraction of the
    //            file via the parquet-internal blooms the engine now
    //            writes for bloomCols (required in-query when the file
    //            has >1 row group), and the result hash-matches DuckDB. ----
    OracleQuery(
      "q137_bloom_rowgroup",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders
        |WHERE md5(CAST(o_orderkey AS VARCHAR)) = md5('1')""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_bloomrg"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val hc = spark.sparkContext.hadoopConfiguration
      val oldBlock = Option(hc.get("parquet.block.size"))
      hc.set("parquet.block.size", (1 << 17).toString)
      try {
        Snapshots.commit(
          Tables(spark, dir, "orders")
            .select(col("o_orderkey"),
              md5(col("o_orderkey").cast("string")).as("okey"))
            .repartition(1), // hash keys: stats ranges overlap everywhere
          root, bloomCols = Seq("okey"))
      } finally oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      val m1 = Snapshots.manifest(spark, root, 1L)
      require(m1.files.size == 1)
      val rowGroups = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(m1.files.head), hc)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }
      val total = m1.rows.map(_.n).sum
      require(total > 0, "commit must record per-file row counts")
      val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load().filter(col("okey") === md5(lit("1")))
      // ONE execution (see q135): gate on the hash-checked agg's own scan
      val res = q.agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("o_orderkey")).cast("bigint").as("sum_k"))
      val out = res.localCheckpoint(true)
      val decoded = scanOutputRows(res.queryExecution.executedPlan)
      if (rowGroups > 4)
        require(decoded > 0 && decoded < total / 2,
          s"bloom must skip row groups on a string point " +
            s"(decoded $decoded of $total across $rowGroups groups)")
      out
    },

    // ---- q138: TIMESTAMP ROW-GROUP PRUNING — the temporal twin of q135:
    //            events committed ts-SORTED into one file with small row
    //            groups; a `ts BETWEEN` band (THE archetypal 100 TB
    //            event-table predicate) must decode a fraction of the file
    //            via footer stats on the TIMESTAMP(MICROS) column
    //            (RowGroupFilters round 15: tsn→INT64-micros translation,
    //            annotation re-validated per file). Required in-query: the
    //            hash-checked agg's OWN scan decodes < half the table;
    //            result hash-matches DuckDB. ----
    OracleQuery(
      "q138_ts_rowgroup",
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  ${graft.engine.Det.sql.dsum("value")} AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-14 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_tsrg"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val hc = spark.sparkContext.hadoopConfiguration
      val oldBlock = Option(hc.get("parquet.block.size"))
      hc.set("parquet.block.size", (1 << 16).toString) // ~64 KB row groups
      try {
        Snapshots.commit(
          Tables(spark, dir, "events")
            .select(col("ts"), col("event_type"), col("value"))
            .repartition(1).sortWithinPartitions("ts"),
          root, statsCols = Seq("ts"))
      } finally oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      val m1 = Snapshots.manifest(spark, root, 1L)
      require(m1.files.size == 1)
      val rowGroups = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(m1.files.head), hc)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }
      val total = m1.rows.map(_.n).sum
      require(total > 0, "commit must record per-file row counts")
      val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .filter(col("ts") >= lit(java.time.LocalDateTime.of(2024, 1, 10, 0, 0)) &&
          col("ts") < lit(java.time.LocalDateTime.of(2024, 1, 14, 0, 0)))
      val res = q.groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("n"),
          graft.engine.Det.dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
      val out = res.localCheckpoint(true)
      val decoded = scanOutputRows(res.queryExecution.executedPlan)
      // the band is ~13% of a 30-day table: with enough groups to skip,
      // a working micros translation decodes well under half the rows
      if (rowGroups > 3)
        require(decoded > 0 && decoded < total / 2,
          s"ts band must skip row groups " +
            s"(decoded $decoded of $total across $rowGroups groups)")
      out
    },

    // ---- q139: PREFIX (LIKE 'p%') PRUNING — string keys committed
    //            range-ordered across files with string min/max bounds
    //            (ColStats slo/shi, round 15) and small row groups: a
    //            prefix predicate is the band [p, nextPrefix(p)), answered
    //            at BOTH granularities — FilterPrune drops whole files on
    //            the recorded bounds, RowGroupFilters drops row groups on
    //            the parquet binary stats inside the survivor. Required
    //            in-query: the scan plans fewer partitions than the table
    //            holds files AND decodes a sliver of the rows; the LIKE
    //            result hash-matches DuckDB. ----
    OracleQuery(
      "q139_prefix_prune",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders
        |WHERE md5(CAST(o_orderkey AS VARCHAR)) LIKE 'ab%'""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_prefix"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val hc = spark.sparkContext.hadoopConfiguration
      val oldBlock = Option(hc.get("parquet.block.size"))
      hc.set("parquet.block.size", (1 << 16).toString)
      try {
        Snapshots.commit(
          Tables(spark, dir, "orders")
            .select(col("o_orderkey"),
              md5(col("o_orderkey").cast("string")).as("okey"))
            .repartitionByRange(4, col("okey"))
            .sortWithinPartitions("okey"),
          root, statsCols = Seq("okey"))
      } finally oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      val m1 = Snapshots.manifest(spark, root, 1L)
      require(m1.files.size > 1, "range layout must produce several files")
      require(m1.files.forall(f => m1.stats.exists(s =>
        s.file == new Path(f).getName && s.col == "okey" && s.slo != null)),
        "every file must record string bounds for the key")
      val total = m1.rows.map(_.n).sum
      require(total > 0)
      val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .filter(col("okey").startsWith("ab"))
      // file half: the prefix band must prune whole files at planning
      val planned = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
      }.sum
      require(planned > 0 && planned < m1.files.size,
        s"prefix band must prune files ($planned of ${m1.files.size} planned)")
      // row-group half: the survivor's sorted layout decodes a sliver
      val res = q.agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("o_orderkey")).cast("bigint").as("sum_k"))
      val out = res.localCheckpoint(true)
      val decoded = scanOutputRows(res.queryExecution.executedPlan)
      require(decoded > 0 && decoded < total / 2,
        s"prefix must prune (decoded $decoded of $total)")
      // row-group half binds once files are big enough to hold several
      // groups (sf0.01+): the sorted survivor decodes a sliver, not itself
      val rowGroups = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(m1.files.head), hc)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }
      if (rowGroups > 3)
        require(decoded < total / 8,
          s"prefix must skip row groups inside the survivor " +
            s"(decoded $decoded of $total, ~$rowGroups groups/file)")
      out
    },

    // ---- q140: COMPOSITE-KEY SPJ — both sides committed as a BUCKET GRID
    //            on (l_partkey, l_suppkey): one single-column bucket
    //            transform per key (round 15 — Spark's SPJ resolution only
    //            honors single-reference buckets; the engine lays one file
    //            per grid cell, ids recovered from the file name), so the
    //            two-key join the (tenant, day)-shaped warehouse fact runs
    //            plans with ZERO exchanges on either side (required
    //            in-plan), and the join result hash-matches DuckDB. ----
    OracleQuery(
      "q140_composite_spj",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(b.cnt) AS BIGINT) AS sum_cnt,
        |  ${graft.engine.Det.sql.dsum("a.l_quantity")} AS sum_qty
        |FROM lineitem a
        |JOIN (SELECT l_partkey, l_suppkey, count(*) AS cnt
        |      FROM lineitem GROUP BY l_partkey, l_suppkey) b
        |ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val liRoot = s"$lakeBase/lineitem_grid"
      val aggRoot = s"$lakeBase/partsupp_grid"
      val fsys = new Path(liRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(liRoot), true)
      fsys.delete(new Path(aggRoot), true)
      val li = Tables(spark, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
      // the two grid builds are independent roots: overlap them (guide
      // §2.6 — the second build's tasks back-fill the first one's tail)
      Par(
        () => Snapshots.commit(li, liRoot,
          clusterBy = Some((Seq("l_partkey", "l_suppkey"), 4))),
        () => Snapshots.commit(
          li.groupBy("l_partkey", "l_suppkey")
            .agg(count(lit(1)).cast("bigint").as("cnt"))
            .withColumnRenamed("l_partkey", "p2").withColumnRenamed("l_suppkey", "s2"),
          aggRoot, clusterBy = Some((Seq("p2", "s2"), 4))))
      val m = Snapshots.manifest(spark, liRoot, 1L)
      require(m.clustering ==
        Some(Snapshots.Clustering(Seq("l_partkey", "l_suppkey"), 4)))
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      val prev = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> spark.conf.getOption(k))
      try {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val a = spark.table(s"graft.`$liRoot`")
        val b = spark.table(s"graft.`$aggRoot`")
        val joined = a.join(b,
          a("l_partkey") === b("p2") && a("l_suppkey") === b("s2"))
        val p = joined.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$p")
        require(!p.contains("Exchange"),
          s"composite-key co-clustered join must plan with zero exchanges:\n$p")
        joined.agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cnt")).cast("bigint").as("sum_cnt"),
          graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
          .localCheckpoint(true)
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    },

    // ---- q141: DV'D SCAN STAYS COLUMNAR — a merge-on-read delete lands
    //            as deletion vectors (data files byte-untouched, required
    //            in-query), and the subsequent aggregation scan must KEEP
    //            the columnar/whole-stage-codegen path (required in-plan:
    //            ColumnarToRow above the scan) — round 16's filtered
    //            columnar batches. The 100 TB point: one delete on a
    //            million-file table must not downgrade every DV-free
    //            neighbor to row-wise iteration. Result hash-matches
    //            DuckDB's post-delete aggregate. ----
    OracleQuery(
      "q141_dv_columnar",
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders
        |WHERE o_orderkey % 10 <> 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_dv"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(4),
        root, statsCols = Seq("o_orderkey"))
      val filesBefore = Snapshots.manifest(spark, root, 1L).files.toSet
      Snapshots.deleteWhere(spark, root, col("o_orderkey") % 10 === 3)
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      require(m.dvs.nonEmpty, "the delete must land as vectors (merge-on-read)")
      require(m.files.toSet == filesBefore,
        "a vectored delete must not rewrite or add data files")
      val q = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
      val res = q.groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("o_orderkey")).cast("bigint").as("sum_k"))
        .orderBy("o_orderpriority")
      val out = res.localCheckpoint(true)
      val plan = res.queryExecution.executedPlan.toString
      require(plan.contains("ColumnarToRow"),
        s"DV'd scan must stay columnar (filtered batches):\n$plan")
      out
    },

    // ---- q142: TOP-N FILE CAPPING — `ORDER BY key LIMIT n` pushed into
    //            the DSv2 scan (SupportsPushDownTopN, round 16): lineitem
    //            committed RANGE-laid-out across 8 files with l_orderkey
    //            stats, and the top-50 must plan only the boundary
    //            file(s) — required in-query: the hash-checked plan's own
    //            scan decodes < half the table. Partial pushdown: Spark
    //            keeps its TakeOrdered above, the scan only drops files
    //            whose recorded range provably cannot reach the top
    //            (FilterPrune.capForTopN — budget over live rows, sound
    //            under DVs/nulls/truncated bounds; LimitPushSpec pins the
    //            edge cases). The 100 TB point: "latest n" over a
    //            range-laid-out table reads O(boundary), not O(table). ----
    OracleQuery(
      "q142_topn_prune",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 50""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_topn"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .repartitionByRange(8, col("l_orderkey")),
        root, statsCols = Seq("l_orderkey"))
      val total = Snapshots.manifest(spark, root, 1L).rows.map(_.n).sum
      require(total > 0, "commit must record per-file row counts")
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d > 0 && d < total / 2,
        s"top-50 must cap to boundary files (decoded $d of $total)")
      out
    },

    // ---- q143: GROUPED METADATA AGGREGATE — events ingested the way a
    //            production feed lands them (one commit per event_type;
    //            every file single-valued on the key with recorded
    //            stats), then `GROUP BY event_type` with count/min/max
    //            answers ENTIRELY from the manifest: the pushed-aggregate
    //            scan (SupportsPushDownAggregates + round-16 group-by
    //            extension) emits exactly one row per group and opens no
    //            data file — required in-query: the hash-checked plan's
    //            scan outputs exactly #groups rows. The 100 TB reading:
    //            "rows per day/source" — the commonest ops probe on an
    //            event lake — costs O(manifest), not a table scan.
    //            Result hash-matches DuckDB's real aggregation. ----
    OracleQuery(
      "q143_grouped_meta_agg",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(event_id) AS BIGINT) AS min_id,
        |  CAST(max(event_id) AS BIGINT) AS max_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_bytype"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ev = Tables(spark, dir, "events").select("event_type", "event_id")
      // the per-key ingest shape: one append per event_type (the distinct
      // set is the partition-key domain — O(5) here, never O(rows))
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      Snapshots.commitAll(
        types.toSeq.map(t => ev.filter(col("event_type") === t).repartition(2)),
        root, statsCols = Seq("event_type", "event_id"))
      // single-partition sort, not orderBy: range partitioning SAMPLES its
      // child first, which would execute the (tiny) agg scan twice and
      // blur the exact row-count gate below
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .coalesce(1).sortWithinPartitions("event_type")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == types.length,
        s"grouped agg must answer from the manifest " +
          s"(scan emitted $d rows, expected ${types.length} groups)")
      out
    },

    // ---- q144: METADATA RETENTION DELETE — events committed range-laid
    //            on event_id (8 tight files, recorded bounds), then the
    //            retention verb `DELETE WHERE event_id < cutoff`: files
    //            whose bounds sit entirely under the cutoff DROP from the
    //            manifest without being scanned, vectored, or rewritten
    //            (round 16 metadata delete); only the one boundary file
    //            vectors. Required in-query: ≥2 files gone, ZERO new data
    //            files (no copy-on-write), and the survivors' aggregate
    //            hash-matches DuckDB's post-delete state. The 100 TB
    //            reading: expiring a day/region of a laid-out table costs
    //            O(manifest), not a scan-and-rewrite of the expiring
    //            bytes. ----
    OracleQuery(
      "q144_metadata_delete",
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events WHERE event_id >= 2500
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_retention"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ev = Tables(spark, dir, "events").select("event_id", "event_type")
      // fixed ~500-id-wide range files at any SF, so the 2500 cutoff always
      // covers several whole files (the layout a day-partitioned ingest has)
      val nFiles = math.max(4, (ev.count() / 500).toInt)
      Snapshots.commit(ev.repartitionByRange(nFiles, col("event_id")),
        root, statsCols = Seq("event_id"))
      val before = Snapshots.manifest(spark, root, 1L).files.toSet
      // maxDvFraction=1.0: the boundary file must VECTOR even when range
      // sampling lands it mostly under the cutoff — a retention delete
      // should never rewrite bytes, and the no-new-files gate pins that
      val v2 = Snapshots.deleteWhere(spark, root, col("event_id") < 2500,
        maxDvFraction = 1.0)
      val m2 = Snapshots.manifest(spark, root, v2)
      require(before.size - m2.files.size >= 2,
        s"retention must DROP fully-covered files from the manifest " +
          s"(${before.size} -> ${m2.files.size})")
      require(m2.files.toSet.subsetOf(before),
        "a metadata+vector delete must write no new data files")
      spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .orderBy("event_type")
    },

    // ---- q145: STRING PARTITION DELETE — documents ingested one commit
    //            per lang (every file single-valued on the key with
    //            slo/shi string bounds), then `DELETE WHERE lang='de'`:
    //            the round-16 string full-acceptance drops every 'de'
    //            file from the manifest as METADATA — no scan, no
    //            vectors, no rewrite (required in-query: files vanish,
    //            zero DVs, zero new data files). The GDPR/source-removal
    //            shape at 100 TB: expelling a language or source from a
    //            partition-laid corpus costs O(manifest). Survivors
    //            hash-match DuckDB's complement aggregate. ----
    OracleQuery(
      "q145_string_partition_delete",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang <> 'de'
        |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/docs_bylang_del"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val docs = Tables(spark, dir, "documents").select("lang", "n_chars")
      val langs = docs.select("lang").distinct()
        .collect().map(_.getString(0)).sorted // O(langs), the key domain
      Snapshots.commitAll(
        langs.toSeq.map(l => docs.filter(col("lang") === l).repartition(2)),
        root, statsCols = Seq("lang", "n_chars"))
      val before = Snapshots.manifest(spark, root,
        Snapshots.headVersion(spark, root)).files.toSet
      val v = Snapshots.deleteWhere(spark, root, col("lang") === "de")
      val m = Snapshots.manifest(spark, root, v)
      require(m.files.size < before.size,
        "the 'de' partition files must DROP from the manifest")
      require(m.files.toSet.subsetOf(before) && m.dvs.isEmpty,
        "a string partition delete must be pure metadata: no DVs, no rewrites")
      spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("lang")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("total_chars"))
        .orderBy("lang")
    },

    // ---- q146: BYTE-PACED AVAILABLE-NOW DRAIN — events land as three
    //            appends; a streaming read with maxBytesPerTrigger sized
    //            to ~one version's bytes under Trigger.AvailableNow must
    //            (a) SELF-TERMINATE at the start-time head, (b) take
    //            MULTIPLE paced triggers (required in-query), and (c)
    //            land every row exactly once in the sink — whose
    //            aggregate hash-matches DuckDB on the source table. The
    //            100 TB backfill verb: drain history under a byte budget
    //            (what executor memory actually sees) without leaving a
    //            continuous stream running. ----
    OracleQuery(
      "q146_bytes_availablenow",
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_drain"
      val sink = s"$lakeBase/events_drain_sink"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      fsys.delete(new Path(sink), true)
      val ev = Tables(spark, dir, "events").select("event_id", "event_type")
      Snapshots.commit(ev.filter(col("event_id") % 3 === 0).repartition(2), root)
      Snapshots.commit(ev.filter(col("event_id") % 3 === 1).repartition(2), root,
        append = true)
      Snapshots.commit(ev.filter(col("event_id") % 3 === 2).repartition(2), root,
        append = true)
      val mh = Snapshots.manifest(spark, root, 3L)
      require(mh.rows.forall(_.bytes > 0L), "commits must record file sizes")
      val budget = mh.rows.map(_.bytes).max // < one version: paced drain
      val ck = java.nio.file.Files.createTempDirectory("drain_ck").toString
      val q = spark.readStream.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).option("maxBytesPerTrigger", budget.toString).load()
        .writeStream.option("checkpointLocation", ck).outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          Snapshots.commitIfAbsent(batch, sink, tag = s"batch-$id", append = true)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(180000),
        "an AvailableNow drain must terminate on its own")
      require(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "the byte budget must pace the drain into multiple triggers")
      spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", sink).load()
        .groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .orderBy("event_type")
    },

    // ---- q147: FULL-VECTOR GROUP DROP — events ingested one commit per
    //            event_type (stats on the KEY only), then a delete whose
    //            predicate the stats miner cannot read (`upper(event_type)
    //            = 'ERROR'` — a function of a column never mines) at
    //            maxDvFraction=1.0: the scan marks EVERY row of the
    //            'error' files, and the commit must DROP them from the
    //            manifest rather than carry 100% deletion vectors
    //            (required in-query: files gone, zero full-cardinality
    //            DVs). The grouped metadata aggregate over the survivor
    //            must then emit NO row for the dead group — the judge-
    //            confirmed round-16 phantom `(group, 0)` state, closed at
    //            both the source (commit drops dead files) and the sink
    //            (aggAnswer suppresses zero-live groups) — and the scan
    //            emits exactly #live-groups rows. Hash-matches DuckDB's
    //            post-delete GROUP BY, whose row SET differs unless the
    //            group truly vanishes. ----
    OracleQuery(
      "q147_fullvector_group_drop",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE upper(event_type) <> 'ERROR'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_fullvec"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ev = Tables(spark, dir, "events").select("event_type", "event_id")
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted // O(key domain)
      Snapshots.commitAll(
        types.toSeq.map(t => ev.filter(col("event_type") === t).repartition(2)),
        root, statsCols = Seq("event_type"))
      val before = Snapshots.manifest(spark, root,
        Snapshots.headVersion(spark, root))
      val rowsByFile = before.rows.map(r => r.file -> r.n).toMap
      // opaque to the miner: forces the scan+mark path, not a metadata drop
      val v = Snapshots.deleteWhere(spark, root,
        upper(col("event_type")) === "ERROR", maxDvFraction = 1.0)
      val m = Snapshots.manifest(spark, root, v)
      require(m.files.size < before.files.size,
        "fully-deleted files must leave the manifest")
      require(m.dvs.forall(d => d.deleted < rowsByFile.getOrElse(d.file, 0L)),
        "no full-cardinality deletion vector may survive the commit")
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("n"))
        .coalesce(1).sortWithinPartitions("event_type")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == types.length - 1,
        s"grouped agg must answer from the manifest with the dead group " +
          s"suppressed (scan emitted $d rows, expected ${types.length - 1})")
      out
    },

    // ---- q148: LIMIT WITHOUT ROW COUNTS — the capForLimit DEGRADE path
    //            end-to-end: lineitem committed across 8 files, then the
    //            shard doctored to the PRE-round-8 format (row-count
    //            entries stripped, exactly what a shard written by an
    //            older binary looks like). `LIMIT n` must still answer
    //            exactly — unknown counts contribute ZERO to the cap's
    //            budget, so the scan degrades to planning EVERY file
    //            (required in-query: planned partitions == file count),
    //            never to missing rows. The aggregate wrapper makes the
    //            any-k-rows LIMIT deterministic for the oracle. ----
    OracleQuery(
      "q148_limit_degrade",
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT l_orderkey) >= 1 AS INTEGER) AS has_keys
        |FROM (SELECT * FROM lineitem LIMIT 500)""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_nostats"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .repartition(8),
        root)
      // age the shard to the pre-row-count era: strip "rows" entries (the
      // parser reads their absence as unknown counts), re-point the
      // manifest (shards are immutable + process-cached, so the doctored
      // body needs a fresh name)
      def readText(p: Path): String = {
        val in = fsys.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      def writeText(p: Path, s: String): Unit = {
        val out = fsys.create(p, true)
        try out.write(s.getBytes("UTF-8")) finally out.close()
      }
      val snap = new Path(s"$root/_snapshots")
      fsys.listStatus(snap).map(_.getPath)
        .filter(_.getName.startsWith("shard-")).foreach { sp =>
          val aged = readText(sp).replaceAll(
            """"rows":\[[^\]]*\]""", """"rows":[]""")
          val nn = s"shard-${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}.json"
          writeText(new Path(snap, nn), aged)
          val mp = new Path(snap, "manifest-1.json")
          writeText(mp, readText(mp).replace(sp.getName, nn))
        }
      val m = Snapshots.manifest(spark, root, 1L)
      require(m.rows.isEmpty, "the doctored manifest must carry no row counts")
      val nFiles = m.files.size
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .limit(500)
        .agg(count(lit(1)).cast("bigint").as("n"),
          (count(col("l_orderkey")) >= 1).cast("int").as("has_keys"))
      val out = res.localCheckpoint(true)
      val parts = scanPartitions(res.queryExecution.executedPlan)
      require(parts >= nFiles,
        s"unknown row counts must cap NOTHING (planned $parts of $nFiles files)")
      out
    },

    // ---- q149: TIMESTAMP TOP-N — "latest n events by ts", THE 100 TB
    //            top-n shape, over events committed range-laid on ts. The
    //            round-17 exact-micros canon lets the TOP-N pushdown both
    //            CAP files (only the tail can reach the top) and push the
    //            `ts >= T` threshold into surviving files' row groups —
    //            required in-query: the scan decodes < half the table.
    //            Hash-matches DuckDB's full sort. ----
    OracleQuery(
      "q149_ts_topn",
      """SELECT event_id, ts, event_type
        |FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 50""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/events_tstopn"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit(
        Tables(spark, dir, "events").select("event_id", "ts", "event_type")
          .repartitionByRange(8, col("ts")),
        root, statsCols = Seq("ts"))
      val total = Snapshots.manifest(spark, root, 1L).rows.map(_.n).sum
      require(total > 0, "commit must record per-file row counts")
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(50)
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d > 0 && d < total / 2,
        s"ts top-50 must cap to boundary files (decoded $d of $total)")
      out
    },

    // ---- q150: SUM AGGREGATE PUSHDOWN — orders ingested one commit per
    //            priority with DECIMAL pricing (money is decimal in a
    //            lake table; the stats pass records EXACT per-file sums
    //            via decimal(38) accumulation), then `revenue per
    //            priority` = GROUP BY + SUM + COUNT answers ENTIRELY
    //            from the manifest: required in-query, the scan emits
    //            exactly #groups rows and its description carries the
    //            pushed SUM. The 100 TB reading: the commonest BI probe
    //            on a fact table — daily/source revenue, token totals —
    //            costs O(manifest), not a table scan. Hash-matches
    //            DuckDB's real aggregation over the same decimals. ----
    OracleQuery(
      "q150_sum_pushdown",
      """SELECT o_orderpriority,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_byprio"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
      val prios = ord.select("o_orderpriority").distinct()
        .collect().map(_.getString(0)).sorted // O(key domain)
      // one staged batch per priority, written CONCURRENTLY and published
      // as ONE manifest (identical files/stats to the former sequential
      // per-priority commits; N-1 publish round-trips and the sequential
      // job tails removed — guide §2.6/§5)
      Snapshots.commitAll(
        prios.toSeq.map(p =>
          ord.filter(col("o_orderpriority") === p).repartition(2)),
        root, statsCols = Seq("o_orderpriority", "o_totalprice"))
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("o_orderpriority")
        .agg(round(sum(col("o_totalprice")).cast("double"), 2).as("rev"),
          count(lit(1)).cast("bigint").as("n"))
        .coalesce(1).sortWithinPartitions("o_orderpriority")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == prios.length,
        s"grouped SUM must answer from the manifest " +
          s"(scan emitted $d rows, expected ${prios.length} groups)")
      out
    },

    // ---- q151: REINDEX (ANALYZE) — lineitem ingested with NO index at
    //            all, then `reindexStats` builds the per-file stats in
    //            one read pass and a METADATA-ONLY commit (required
    //            in-query: the file list is byte-identical across the
    //            commit). A band aggregate afterwards must PRUNE through
    //            the new index (required in-query: the planned scan
    //            reads fewer files than the table holds) and hash-match
    //            DuckDB. The 100 TB reading: an unindexed table gains
    //            pruning + metadata answers for the cost of one scan —
    //            the only alternative, compaction, rewrites every byte. ----
    OracleQuery(
      "q151_reindex_analyze",
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_k
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/lineitem_reindex"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      Snapshots.commit( // deliberately index-less ingest
        Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_returnflag")
          .repartitionByRange(8, col("l_orderkey")),
        root)
      val before = Snapshots.manifest(spark, root, 1L).files.toSet
      val v2 = Snapshots.reindexStats(spark, root, Seq("l_orderkey"))
      val m2 = Snapshots.manifest(spark, root, v2)
      require(m2.files.toSet == before,
        "reindex must be metadata-only: no data file rewritten or moved")
      require(m2.stats.exists(_.col == "l_orderkey"), "the index must exist")
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .filter(col("l_orderkey").between(1000L, 3000L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("l_orderkey")).cast("bigint").as("sum_k"))
        .orderBy("l_returnflag")
      val out = res.localCheckpoint(true)
      val planned = res.queryExecution.executedPlan.toString
      // the new index prunes: the DSv2 scan's pushed band reaches the
      // file list (fewer partitions than files — observed via the scan's
      // reported pushed filters AND a partition count below the table's)
      val parts = scanPartitions(res.queryExecution.executedPlan)
      require(parts > 0 && parts < before.size,
        s"reindex must light up pruning (planned $parts of ${before.size} files)\n$planned")
      out
    },

    // ---- q152: EXACT FILTER CLAIM + GROUPED AGGREGATE — the flagship BI
    //            probe (band + GROUP BY). Orders land as one file per
    //            (priority, orderkey band); the probe's band is exactly
    //            the middle band, so every file it OVERLAPS it also FULLY
    //            accepts (zero nulls + the shared injectivity rule) and
    //            the scan builder claims the conjunction: Spark keeps no
    //            residual Filter, and the grouped COUNT/MIN/MAX answers
    //            from the manifest restricted to the claimed files
    //            (required in-query: the scan emits exactly one row per
    //            group — zero data I/O). The 100 TB reading: "revenue per
    //            priority WHERE day in range" on a day-partitioned ingest
    //            costs O(manifest), not a scan. ----
    OracleQuery(
      "q152_exact_claim_rollup",
      // the band is DERIVED from the data (max/3, 2·max/3 — the same
      // integer arithmetic the Spark side uses to lay the files out), so
      // the probe is non-trivial at every scale factor
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS hi
        |FROM orders
        |WHERE o_orderkey > (SELECT max(o_orderkey) // 3 FROM orders)
        |  AND o_orderkey <= (SELECT max(o_orderkey) * 2 // 3 FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_bands"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_orderpriority"))
      val kmax = ord.agg(max("o_orderkey")).head.getLong(0)
      val (b1, b2) = (kmax / 3, kmax * 2 / 3)
      val prios = ord.select("o_orderpriority").distinct()
        .collect().map(_.getString(0)).sorted // O(key domain)
      val bands = Seq((1L, b1), (b1 + 1L, b2), (b2 + 1L, Long.MaxValue))
      // non-empty (priority, band) cells from ONE distinct pass — the
      // former per-cell `isEmpty` probe was a limit-1 job per cell (15
      // driver round-trips); the cells then stage concurrently and publish
      // as ONE manifest (same single-key-per-file layout, guide §2.6/§5)
      val bandIdx = when(col("o_orderkey") < 1L, -1)
        .when(col("o_orderkey") <= b1, 0)
        .when(col("o_orderkey") <= b2, 1).otherwise(2)
      val present = ord.select(col("o_orderpriority").as("p"), bandIdx.as("b"))
        .distinct().collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val cells = for {
        p <- prios.toSeq
        ((lo, hi), bi) <- bands.zipWithIndex
        if present((p, bi))
      } yield ord.filter(col("o_orderpriority") === p &&
        col("o_orderkey").between(lo, hi)).coalesce(1)
      Snapshots.commitAll(cells, root,
        statsCols = Seq("o_orderkey", "o_orderpriority"))
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .filter(col("o_orderkey").between(b1 + 1L, b2))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("bigint").as("n"),
          min("o_orderkey").cast("bigint").as("lo"),
          max("o_orderkey").cast("bigint").as("hi"))
        // sortWithinPartitions on the 1-partition result: a global orderBy
        // plans a range exchange whose SAMPLING pass executes the scan a
        // second time, double-counting the rows-emitted gate below
        .coalesce(1).sortWithinPartitions("o_orderpriority")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == out.count(),
        s"band + GROUP BY under the exact claim must answer from the " +
          s"manifest (scan emitted $d rows, expected ${out.count()} groups)")
      val desc = scanDesc(res.queryExecution.executedPlan)
      require(desc.contains("ExactPushedFilters"),
        s"the band must be CLAIMED exact (no residual Filter):\n$desc")
      out
    },

    // ---- q153: DECIMAL AGGREGATE PUSHDOWN — money columns are THE lake
    //            fact-table type. Orders land one commit per priority with
    //            a decimal(4,2) rate pinned per file and o_totalprice as
    //            decimal(15,2); MIN/MAX/SUM on the decimal measure and
    //            GROUP BY on the decimal key all answer from the manifest
    //            through the shared p≤15 injectivity rule (required
    //            in-query: the scan emits exactly one row per group). ----
    OracleQuery(
      "q153_decimal_agg_pushdown",
      // avg_micros replicates Spark's decimal Average EXACTLY in integer
      // arithmetic: result scale is s+4 = 6, rounding HALF_UP, so with
      // N = sum_cents·10^4 and D = count, avg·10^6 = (2N + D) // (2D)
      """SELECT round(CAST(rate AS DOUBLE), 2) AS rate,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(min(price) AS DOUBLE), 2) AS lo,
        |  round(CAST(max(price) AS DOUBLE), 2) AS hi,
        |  round(CAST(sum(price) AS DOUBLE), 2) AS rev,
        |  CAST((2 * CAST(sum(price * 100) AS BIGINT) * 10000 + count(*))
        |       // (2 * count(*)) AS BIGINT) AS avg_micros
        |FROM (SELECT CAST('0.0' || substr(o_orderpriority, 1, 1) AS DECIMAL(4,2)) AS rate,
        |        CAST(o_totalprice AS DECIMAL(15,2)) AS price
        |      FROM orders) AS t
        |GROUP BY rate ORDER BY rate""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_decimal"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ord = Tables(spark, dir, "orders")
        .select(concat(lit("0.0"), substring(col("o_orderpriority"), 1, 1))
          .cast("decimal(4,2)").as("rate"),
          col("o_totalprice").cast("decimal(15,2)").as("price"))
      val rates = ord.select("rate").distinct()
        .collect().map(_.getDecimal(0)).sorted // O(key domain)
      // concurrent per-rate staging + one publish (same files/stats as the
      // former sequential commits — guide §2.6/§5)
      Snapshots.commitAll(
        rates.toSeq.map(r => ord.filter(col("rate") === r).repartition(2)),
        root, statsCols = Seq("rate", "price"))
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("rate")
        .agg(count(lit(1)).cast("bigint").as("n"),
          round(min("price").cast("double"), 2).as("lo"),
          round(max("price").cast("double"), 2).as("hi"),
          round(sum("price").cast("double"), 2).as("rev"),
          (avg("price") * lit(1000000)).cast("bigint").as("avg_micros"))
        .select(round(col("rate").cast("double"), 2).as("rate"),
          col("n"), col("lo"), col("hi"), col("rev"), col("avg_micros"))
        .coalesce(1).sortWithinPartitions("rate")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == rates.length,
        s"decimal grouped MIN/MAX/SUM/AVG must answer from the manifest " +
          s"(scan emitted $d rows, expected ${rates.length} groups)")
      val desc = scanDesc(res.queryExecution.executedPlan)
      require(desc.contains("MIN(price)") && desc.contains("MAX(price)") &&
        desc.contains("AVG(price)") && desc.contains("group by [rate]"),
        s"the decimal extremes/avg must be PUSHED, not post-computed:\n$desc")
      out
    },

    // ---- q154: FAN-OUT DELETE — a scattered (unminable) delete touching
    //            EVERY file of a many-file table, with MarkedDeleteFanout
    //            lowered in-query so classification, vector merging, and
    //            shard serialization all run EXECUTOR-SIDE (the 100 TB
    //            path: a GDPR-sized delete over 100k files must not
    //            collect 100k bitmaps to the driver). Required in-query:
    //            every file carries a deletion vector, and the commit
    //            points at executor-written pure-DV shards BY REFERENCE
    //            (ShardRef n=0 — no data file rewritten, no bitmap ever
    //            held on the driver). Result hash-matches DuckDB's view
    //            of the surviving rows. ----
    OracleQuery(
      "q154_fanout_delete",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS hi,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk
        |FROM orders WHERE o_orderkey % 10 >= 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_fanout_del"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_orderpriority"))
      // round-robin into 24 files so the scattered predicate below touches
      // every one of them
      Snapshots.commit(ord.repartition(24), root, statsCols = Seq("o_orderkey"))
      // `% 10` is unminable, so no file prunes and all 24 scan; fanout
      // lowered to 1 forces the executor-side path; maxDvFraction = 1.0
      // keeps every outcome merge-on-read (deterministic at every SF)
      val prevFan = Snapshots.MarkedDeleteFanout
      Snapshots.MarkedDeleteFanout = 1
      try Snapshots.deleteWhere(spark, root, col("o_orderkey") % 10 < 3,
        maxDvFraction = 1.0)
      finally Snapshots.MarkedDeleteFanout = prevFan
      val m = Snapshots.manifest(spark, root, 2)
      require(m.files.size == 24,
        s"merge-on-read must rewrite nothing: expected 24 files, got ${m.files.size}")
      require(m.dvs.size == 24,
        s"the scattered delete must vector EVERY file, got ${m.dvs.size}")
      val meta = Snapshots.manifestMeta(spark, root, 2)
      require(meta.shardRefs.exists(_.n == 0L),
        s"fan-out must commit executor-written pure-DV shards by reference, " +
          s"got refs ${meta.shardRefs.map(r => s"${r.name}:${r.n}")}")
      spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("bigint").as("n"),
          min("o_orderkey").cast("bigint").as("lo"),
          max("o_orderkey").cast("bigint").as("hi"),
          sum("o_orderkey").cast("bigint").as("sk"))
        .coalesce(1).sortWithinPartitions("o_orderpriority")
    },

    // ---- q155: IS NULL CLAIM over a null-partitioned layout — sparse
    //            optional columns (annotations, labels, redaction notes)
    //            land whole files of nulls at lake scale. Orders commit
    //            one file per priority with `note` NULL for priorities
    //            1-2 and populated otherwise; the all-null files record
    //            no-range TOMBSTONES whose null count pins every row
    //            null, zero-null files prune via exact null counts, so
    //            `WHERE note IS NULL` is claimed EXACT (no residual) and
    //            the grouped rollup answers from the manifest (required
    //            in-query: one scan row per group + ExactPushedFilters).
    //            The 100 TB reading: "rows still unlabeled, by shard" is
    //            O(manifest). ----
    OracleQuery(
      "q155_isnull_claim_rollup",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS hi
        |FROM (SELECT o_orderkey, o_orderpriority,
        |        CASE WHEN substr(o_orderpriority, 1, 1) <= '2' THEN NULL
        |             ELSE o_orderpriority END AS note
        |      FROM orders) t
        |WHERE note IS NULL
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val root = s"$lakeBase/orders_nullnote"
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(root), true)
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
          col("o_orderpriority"),
          when(substring(col("o_orderpriority"), 1, 1) <= "2",
            lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("note"))
      val prios = ord.select("o_orderpriority").distinct()
        .collect().map(_.getString(0)).sorted // O(key domain)
      Snapshots.commitAll(
        prios.toSeq.map(p => ord.filter(col("o_orderpriority") === p).coalesce(1)),
        root, statsCols = Seq("o_orderkey", "o_orderpriority", "note"))
      val nullPrios = prios.count(_.substring(0, 1) <= "2")
      val res = spark.read.format("graft.streaming.SnapshotSourceProvider")
        .option("root", root).load()
        .filter(col("note").isNull)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("bigint").as("n"),
          min("o_orderkey").cast("bigint").as("lo"),
          max("o_orderkey").cast("bigint").as("hi"))
        .coalesce(1).sortWithinPartitions("o_orderpriority")
      val out = res.localCheckpoint(true)
      val d = scanOutputRows(res.queryExecution.executedPlan)
      require(d == nullPrios,
        s"IS NULL rollup must answer from the manifest " +
          s"(scan emitted $d rows, expected $nullPrios groups)")
      val desc = scanDesc(res.queryExecution.executedPlan)
      require(desc.contains("ExactPushedFilters"),
        s"IS NULL over the null-partitioned layout must claim exact:\n$desc")
      out
    },

    // ---- q123: STORAGE-PARTITIONED JOIN — lineitem and orders committed
    //            hash-clustered on their join keys (same bucket count),
    //            read through the graft SnapshotCatalog, joined with ZERO
    //            shuffle on either side (required in-plan: a sort-merge /
    //            shuffled-hash join with no Exchange anywhere), and the
    //            join result hash-compared against DuckDB's plain join.
    //            The 100 TB point: bucketing pays the exchange once at
    //            write; every repeated fact⋈fact join after that skips
    //            BOTH sides' shuffles. ----
    OracleQuery(
      "q123_clustered_spj",
      s"""SELECT o_orderpriority, count(*) AS n,
        |  ${graft.engine.Det.sql.dsum("l_quantity")} AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val lakeBase = lakeUri(dir).stripSuffix("/documents_by_lang")
      val liRoot = s"$lakeBase/lineitem_spj"
      val ordRoot = s"$lakeBase/orders_spj"
      val fsys = new Path(liRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new Path(liRoot), true)
      fsys.delete(new Path(ordRoot), true)
      Par(
        () => Snapshots.commit(
          Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
          liRoot, clusterBy = Some((Seq("l_orderkey"), 16))),
        () => Snapshots.commit(
          Tables(spark, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_orderpriority"),
          ordRoot, clusterBy = Some((Seq("o_orderkey"), 16))))
      spark.conf.set("spark.sql.catalog.graft", "graft.streaming.SnapshotCatalog")
      val prev = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> spark.conf.getOption(k))
      try {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = spark.table(s"graft.`$liRoot`")
        val ord = spark.table(s"graft.`$ordRoot`")
          .filter(col("o_orderstatus") === "F")
        val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        val p = joined.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$p")
        require(!p.contains("Exchange"),
          s"co-clustered snapshot join must plan with zero exchanges:\n$p")
        // materialize INSIDE the pinned-conf scope: the driver hashes the
        // frame lazily, so the result must not depend on restored confs
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            graft.engine.Det.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
          .localCheckpoint(true)
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    },
  )
}
