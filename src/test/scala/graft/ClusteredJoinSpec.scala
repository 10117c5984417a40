package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Snapshots
import graft.streaming.GraftBucketBound

/** Storage-partitioned joins over hash-clustered snapshot tables:
  * `commit(clusterBy)` lays files out one-per-bucket, the DSv2 scan
  * reports `KeyGroupedPartitioning(bucket(n, col))` through
  * [[graft.streaming.SnapshotCatalog]], and a join of two co-clustered
  * tables plans with ZERO shuffle on either side. */
class ClusteredJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("clustered").toString + "/t"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def withSpj[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.streaming.SnapshotCatalog")
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // pin the non-broadcast path: the 100 TB regime SPJ exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def catalogRead(root: String): DataFrame =
    spark.table(s"graft.`$root`")

  test("the bucket catalog function reproduces the writer's HashPartitioning mapping") {
    val n = 16
    // Spark's own pmod(hash(col), n) IS the writer-side mapping
    // (HashPartitioning.partitionIdExpression); the v2 function must agree
    def sparkSide(df: DataFrame): Seq[Int] =
      df.select(pmod(hash(col("k")), lit(n)).cast("int")).as[Int].collect().toSeq
    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val gotL = longs.map { v =>
      GraftBucketBound(Seq(LongType)).produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, v))).intValue
    }
    assert(gotL === sparkSide(longs.toDF("k")))
    val ints = Seq(0, 7, -3, Int.MaxValue, Int.MinValue)
    val gotI = ints.map { v =>
      GraftBucketBound(Seq(IntegerType)).produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, v))).intValue
    }
    assert(gotI === sparkSide(ints.toDF("k")))
    val strs = Seq("", "a", "doc-123", "ü-multibyte", "a" * 100)
    val gotS = strs.map { v =>
      GraftBucketBound(Seq(StringType)).produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, org.apache.spark.unsafe.types.UTF8String.fromString(v))))
        .intValue
    }
    assert(gotS === sparkSide(strs.toDF("k")))
    // null key: Murmur3Hash of a null child is the seed
    val gotNull = GraftBucketBound(Seq(LongType)).produceResult(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, null))).intValue
    val sparkNull = spark.sql(s"SELECT CAST(pmod(hash(CAST(NULL AS BIGINT)), $n) AS INT)")
      .as[Int].head()
    assert(gotNull === sparkNull)
  }

  test("clusterBy commit records the spec and lays files out bucket-pure") {
    val root = tmp()
    val df = (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    Snapshots.commit(df, root, clusterBy = Some((Seq("k"), 8)))
    val m = Snapshots.manifest(spark, root, 1L)
    assert(m.clustering === Some(Snapshots.Clustering(Seq("k"), 8)))
    assert(m.files.nonEmpty && m.files.size <= 8)
    // every file holds ONLY rows of its named bucket
    m.files.foreach { f =>
      val b = Snapshots.bucketOfFile(new org.apache.hadoop.fs.Path(f).getName).get
      val distinct = spark.read.parquet(f)
        .select(pmod(hash(col("k")), lit(8)).cast("int")).distinct()
        .as[Int].collect().toSeq
      assert(distinct === Seq(b), s"file $f mixes buckets $distinct")
    }
  }

  test("composite-key bucket function matches the writer's chained murmur3 fold") {
    val n = 16
    // df.repartition(n, c1, c2) buckets by pmod(hash(c1, c2), n) — the
    // multi-arg v2 function must reproduce the CHAINED hash exactly
    val rows = Seq((1L, "a"), (-7L, ""), (42L, "tenant-1"), (0L, "ü"))
    val sparkSide = rows.toDF("k", "s")
      .select(pmod(hash(col("k"), col("s")), lit(n)).cast("int")).as[Int].collect().toSeq
    val got = rows.map { case (k, s) =>
      GraftBucketBound(Seq(LongType, StringType)).produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, k,
            org.apache.spark.unsafe.types.UTF8String.fromString(s)))).intValue
    }
    assert(got === sparkSide)
    // a null component leaves the running hash unchanged (Catalyst's rule)
    val gotNull = GraftBucketBound(Seq(LongType, StringType)).produceResult(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, 5L, null))).intValue
    val sparkNull = spark.sql(
      s"SELECT CAST(pmod(hash(CAST(5 AS BIGINT), CAST(NULL AS STRING)), $n) AS INT)")
      .as[Int].head()
    assert(gotNull === sparkNull)
  }

  test("two-column cluster keys join with zero exchanges (composite SPJ)") {
    withSpj {
      val lRoot = tmp()
      val rRoot = tmp()
      // (tenant, day)-shaped composite key
      val left = (1 to 6000).map(i =>
        (s"t${i % 7}", (i % 30).toLong, i.toLong)).toDF("tenant", "day", "a")
      val right = (1 to 4000).map(i =>
        (s"t${i % 9}", (i % 30).toLong, (i % 13).toLong)).toDF("tenant2", "day2", "b")
      Snapshots.commit(left, lRoot, clusterBy = Some((Seq("tenant", "day"), 8)))
      Snapshots.commit(right, rRoot, clusterBy = Some((Seq("tenant2", "day2"), 8)))
      val m = Snapshots.manifest(spark, lRoot, 1L)
      assert(m.clustering === Some(Snapshots.Clustering(Seq("tenant", "day"), 8)),
        "the composite spec must round-trip the manifest record")
      // grid-cell purity: every file holds exactly one (bucket(tenant),
      // bucket(day)) cell, the ids recoverable from its name
      m.files.foreach { f =>
        val name = new org.apache.hadoop.fs.Path(f).getName
        val cell = Snapshots.gridOfFile(name, 2)
          .getOrElse(fail(s"file $name carries no grid suffix"))
        val distinct = spark.read.parquet(f)
          .select(pmod(hash(col("tenant")), lit(8)).cast("int"),
            pmod(hash(col("day")), lit(8)).cast("int"))
          .distinct().as[(Int, Int)].collect().toSeq
        assert(distinct === Seq((cell(0), cell(1))),
          s"file $name mixes grid cells $distinct")
      }
      val l = catalogRead(lRoot)
      val r = catalogRead(rRoot)
      val joined = l.join(r,
        l("tenant") === r("tenant2") && l("day") === r("day2"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(!p.contains("Exchange"),
        s"composite-key co-clustered join must not shuffle either side:\n$p")
      val got = joined.agg(count(lit(1)), sum($"a" * $"b")).as[(Long, Long)].first()
      val exp = left.join(right,
        $"tenant" === $"tenant2" && $"day" === $"day2")
        .agg(count(lit(1)), sum($"a" * $"b")).as[(Long, Long)].first()
      assert(got === exp, "composite SPJ must not change the join result")
    }
  }

  test("co-clustered snapshot tables join with zero exchanges; rows exact") {
    withSpj {
      val lRoot = tmp()
      val rRoot = tmp()
      val left = (1L to 5000L).map(i => (i, i * 2)).toDF("k", "a")
      val right = (2500L to 7500L).map(i => (i, i % 97)).toDF("k2", "b")
      Snapshots.commit(left, lRoot, clusterBy = Some((Seq("k"), 8)))
      Snapshots.commit(right, rRoot, clusterBy = Some((Seq("k2"), 8)))
      val l = catalogRead(lRoot)
      val r = catalogRead(rRoot)
      val joined = l.join(r, l("k") === r("k2"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(!p.contains("Exchange"),
        s"co-clustered snapshot join must not shuffle either side:\n$p")
      val got = joined.agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
      val exp = left.join(right, $"k" === $"k2")
        .agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
      assert(got === exp)
    }
  }

  test("mismatched-but-divisible bucket counts join with ZERO exchanges (reducible buckets)") {
    withSpj {
      val prevCt = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
      try {
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
        val lRoot = tmp()
        val rRoot = tmp()
        val left = (1L to 2000L).map(i => (i, i)).toDF("k", "a")
        val right = (1L to 2000L).map(i => (i, i * 10)).toDF("k2", "b")
        Snapshots.commit(left, lRoot, clusterBy = Some((Seq("k"), 8)))
        Snapshots.commit(right, rRoot, clusterBy = Some((Seq("k2"), 4)))
        val l = catalogRead(lRoot)
        val r = catalogRead(rRoot)
        val joined = l.join(r, l("k") === r("k2"))
        // the 8-bucket side REDUCES (id % 4) into the 4-bucket key space:
        // partitions coalesce, nothing shuffles
        assert(!plan(joined).contains("Exchange"),
          s"divisible bucket counts must storage-partition the join:\n${plan(joined)}")
        assert(joined.count() === 2000L)
        assert(joined.agg(sum($"a" * $"b")).head().getLong(0)
          === (1L to 2000L).map(i => i * i * 10).sum,
          "every key must meet its match (reduced ids route correctly)")
      } finally prevCt.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled"))(
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", _))
    }
  }

  test("non-divisible bucket counts fall back to a shuffled join, rows exact") {
    withSpj {
      val lRoot = tmp()
      val rRoot = tmp()
      Snapshots.commit((1L to 2000L).map(i => (i, i)).toDF("k", "a"),
        lRoot, clusterBy = Some((Seq("k"), 8)))
      Snapshots.commit((1L to 2000L).map(i => (i, i)).toDF("k2", "b"),
        rRoot, clusterBy = Some((Seq("k2"), 6)))
      val l = catalogRead(lRoot)
      val r = catalogRead(rRoot)
      val joined = l.join(r, l("k") === r("k2"))
      assert(plan(joined).contains("Exchange"),
        "8-vs-6 buckets share no reduction and must shuffle")
      assert(joined.count() === 2000L)
    }
  }

  test("a bucket-count-evolved table joins its pre-evolution self with zero exchanges") {
    withSpj {
      val prevCt = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
      try {
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
        val root = tmp()
        Snapshots.commit((1L to 3000L).map(i => (i, i)).toDF("k", "a"),
          root, clusterBy = Some((Seq("k"), 16)))
        // re-cluster at double the bucket count (overwrite commit — the
        // bucket-evolution path; old version stays time-travelable)
        Snapshots.commit(Snapshots.read(spark, root),
          root, clusterBy = Some((Seq("k"), 32)))
        val now = catalogRead(root)
        val before = spark.sql(s"SELECT k AS k0, a AS a0 FROM graft.`$root` VERSION AS OF 1")
        val joined = now.join(before, $"k" === $"k0")
        assert(!plan(joined).contains("Exchange"),
          s"16-vs-32 generations of one table must join exchange-free:\n${plan(joined)}")
        assert(joined.count() === 3000L)
        assert(joined.filter($"a" =!= $"a0").count() === 0L)
      } finally prevCt.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled"))(
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", _))
    }
  }

  test("a grid-evolved composite table joins its pre-evolution self with zero exchanges") {
    withSpj {
      val prevCt = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
      try {
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
        val root = tmp()
        val rows = (1 to 5000).map(i =>
          (s"t${i % 7}", (i % 30).toLong, i.toLong)).toDF("tenant", "day", "a")
        Snapshots.commit(rows, root, clusterBy = Some((Seq("tenant", "day"), 4)))
        // re-cluster the grid at double the per-dimension bucket count
        // (overwrite commit); each dimension's bucket(8) reduces to the
        // old generation's bucket(4), so the join needs no exchange
        Snapshots.commit(Snapshots.read(spark, root), root,
          clusterBy = Some((Seq("tenant", "day"), 8)))
        assert(Snapshots.clusteringAt(spark, root,
          Snapshots.headVersion(spark, root)) ===
          Some(Snapshots.Clustering(Seq("tenant", "day"), 8)))
        val now = catalogRead(root)
        val before = spark.sql(
          s"SELECT tenant AS t0, day AS d0, a AS a0 FROM graft.`$root` VERSION AS OF 1")
        val joined = now.join(before, $"tenant" === $"t0" && $"day" === $"d0")
        val p = plan(joined)
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$p")
        assert(!p.contains("Exchange"),
          s"(4,4)-vs-(8,8) grid generations must join exchange-free:\n$p")
        // rows join themselves exactly: same key-mates pre and post
        val got = joined.agg(count(lit(1)), sum($"a" * $"a0")).as[(Long, Long)].first()
        val exp = rows.join(
          rows.select($"tenant".as("t0"), $"day".as("d0"), $"a".as("a0")),
          $"tenant" === $"t0" && $"day" === $"d0")
          .agg(count(lit(1)), sum($"a" * $"a0")).as[(Long, Long)].first()
        assert(got === exp, "grid evolution must not change the join result")
      } finally prevCt.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled"))(
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", _))
    }
  }

  test("a DV delete preserves clustering; the join stays exchange-free and DV-exact") {
    withSpj {
      val lRoot = tmp()
      val rRoot = tmp()
      val left = (1L to 4000L).map(i => (i, i)).toDF("k", "a")
      val right = (1L to 4000L).map(i => (i, i)).toDF("k2", "b")
      Snapshots.commit(left, lRoot, clusterBy = Some((Seq("k"), 8)),
        statsCols = Seq("k"))
      Snapshots.commit(right, rRoot, clusterBy = Some((Seq("k2"), 8)))
      Snapshots.deleteWhere(spark, lRoot, col("k") <= 1000L)
      val head = Snapshots.headVersion(spark, lRoot)
      val m = Snapshots.manifest(spark, lRoot, head)
      assert(m.dvs.nonEmpty, "the delete must land as vectors")
      assert(m.clustering === Some(Snapshots.Clustering(Seq("k"), 8)),
        "a pure-DV delete must not drop the clustering spec")
      val joined = catalogRead(lRoot).join(catalogRead(rRoot),
        col("k") === col("k2"))
      val p = plan(joined)
      assert(!p.contains("Exchange"), s"DV'd clustered join must stay SPJ:\n$p")
      assert(joined.count() === 3000L)
    }
  }

  test("rewrites drop the spec (compact); metadata-only commits carry it (rename)") {
    val root = tmp()
    Snapshots.commit((1L to 2000L).map(i => (i, i)).toDF("k", "v"), root,
      clusterBy = Some((Seq("k"), 4)))
    Snapshots.renameColumn(spark, root, "k", "key")
    val afterRename = Snapshots.clusteringAt(spark, root,
      Snapshots.headVersion(spark, root))
    assert(afterRename === Some(Snapshots.Clustering(Seq("key"), 4)),
      "rename must carry the spec, relabeled to the new logical name")
    Snapshots.compact(spark, root, targetFiles = 2)
    assert(Snapshots.clusteringAt(spark, root,
      Snapshots.headVersion(spark, root)).isEmpty,
      "a layout rewrite cannot prove bucket purity — the spec must drop")
  }

  test("a clustered append needs the head's spec; same-spec append keeps SPJ working") {
    withSpj {
      val root = tmp()
      val rRoot = tmp()
      Snapshots.commit((1L to 1000L).map(i => (i, i)).toDF("k", "a"), root,
        clusterBy = Some((Seq("k"), 8)))
      Snapshots.commit((1001L to 2000L).map(i => (i, i)).toDF("k", "a"), root,
        append = true, clusterBy = Some((Seq("k"), 8)))
      val e = intercept[IllegalArgumentException] {
        Snapshots.commit((1L to 10L).map(i => (i, i)).toDF("k", "a"), root,
          append = true, clusterBy = Some((Seq("k"), 4)))
      }
      assert(e.getMessage.contains("clustering"))
      // an UNclustered append drops the spec — conservative-correct
      val dropRoot = tmp()
      Snapshots.commit((1L to 100L).map(i => (i, i)).toDF("k", "a"), dropRoot,
        clusterBy = Some((Seq("k"), 8)))
      Snapshots.commit((101L to 200L).map(i => (i, i)).toDF("k", "a"), dropRoot,
        append = true)
      assert(Snapshots.clusteringAt(spark, dropRoot, 2L).isEmpty)
      // the two-commit clustered table still joins exchange-free
      Snapshots.commit((1L to 2000L).map(i => (i, i)).toDF("k2", "b"), rRoot,
        clusterBy = Some((Seq("k2"), 8)))
      val joined = catalogRead(root).join(catalogRead(rRoot),
        col("k") === col("k2"))
      val p = plan(joined)
      assert(!p.contains("Exchange"),
        s"multi-commit clustered join must stay SPJ:\n$p")
      assert(joined.count() === 2000L)
    }
  }

  test("compactClustered merges per-bucket small files, keeps the spec and SPJ") {
    withSpj {
      val root = tmp()
      val rRoot = tmp()
      Snapshots.commit((1L to 1000L).map(i => (i, i)).toDF("k", "a"), root,
        clusterBy = Some((Seq("k"), 4)), statsCols = Seq("k"))
      Snapshots.commit((1001L to 2000L).map(i => (i, i)).toDF("k", "a"), root,
        append = true, clusterBy = Some((Seq("k"), 4)), statsCols = Seq("k"))
      Snapshots.commit((2001L to 3000L).map(i => (i, i)).toDF("k", "a"), root,
        append = true, clusterBy = Some((Seq("k"), 4)), statsCols = Seq("k"))
      Snapshots.deleteWhere(spark, root, col("k") <= 100L)
      assert(Snapshots.manifest(spark, root,
        Snapshots.headVersion(spark, root)).files.size > 4)
      Snapshots.compactClustered(spark, root, statsCols = Seq("k"))
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      assert(m.clustering === Some(Snapshots.Clustering(Seq("k"), 4)),
        "bucket-preserving compaction must republish the spec")
      assert(m.files.size <= 4, s"expected ≤4 files, got ${m.files.size}")
      assert(m.dvs.isEmpty, "compaction must materialize deletion vectors")
      Snapshots.commit((1L to 3000L).map(i => (i, i)).toDF("k2", "b"), rRoot,
        clusterBy = Some((Seq("k2"), 4)))
      val joined = catalogRead(root).join(catalogRead(rRoot),
        col("k") === col("k2"))
      val p = plan(joined)
      assert(!p.contains("Exchange"), s"post-compaction join must stay SPJ:\n$p")
      assert(joined.count() === 2900L)
    }
  }

  test("compactClustered touches only untidy buckets; tidy ones carry by reference") {
    val root = tmp()
    Snapshots.commit((1L to 4000L).map(i => (i, i)).toDF("k", "v"), root,
      clusterBy = Some((Seq("k"), 16)))
    // two hot-key appends land files in a handful of buckets only
    Snapshots.commit(Seq((7L, 70L), (9L, 90L)).toDF("k", "v"), root,
      append = true, clusterBy = Some((Seq("k"), 16)))
    Snapshots.commit(Seq((7L, 71L)).toDF("k", "v"), root,
      append = true, clusterBy = Some((Seq("k"), 16)))
    val before = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
    def bucketsOf(files: Seq[String]) = files.groupBy(u =>
      Snapshots.bucketOfFile(new org.apache.hadoop.fs.Path(u).getName).get)
    val hot = bucketsOf(before.files).filter(_._2.size > 1).keySet
    val tidyFiles = bucketsOf(before.files).filterNot(e => hot.contains(e._1))
      .values.flatten.map(u => new org.apache.hadoop.fs.Path(u).getName).toSet
    assert(hot.nonEmpty && tidyFiles.nonEmpty,
      s"fixture needs both hot and tidy buckets, got hot=$hot tidy=${tidyFiles.size}")
    val v = Snapshots.compactClustered(spark, root)
    val after = Snapshots.manifest(spark, root, v)
    val afterNames = after.files.map(u => new org.apache.hadoop.fs.Path(u).getName).toSet
    assert(tidyFiles.subsetOf(afterNames),
      "single-file buckets must carry by reference, not rewrite")
    assert(bucketsOf(after.files).values.forall(_.size == 1),
      "every bucket must end with exactly one file")
    assert(after.clustering === Some(Snapshots.Clustering(Seq("k"), 16)))
    assert(Snapshots.read(spark, root).count() === 4003L)
    // a tidy table is a true no-op — even when (sparse buckets) the old
    // files<=buckets guard would have been fooled
    assert(Snapshots.compactClustered(spark, root) === v,
      "nothing untidy left: compactClustered must not mint a version")
  }

  test("groupBy on the cluster key aggregates with zero exchanges") {
    withSpj {
      val root = tmp()
      Snapshots.commit((1L to 8000L).map(i => (i % 500, i)).toDF("k", "v"), root,
        clusterBy = Some((Seq("k"), 8)))
      val agg = catalogRead(root).groupBy("k")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val p = plan(agg)
      assert(!p.contains("Exchange"),
        s"clustered groupBy on the bucket key must not shuffle:\n$p")
      val got = agg.agg(count(lit(1)), sum($"n"), sum($"s"))
        .as[(Long, Long, Long)].first()
      assert(got === ((500L, 8000L, (1L to 8000L).sum)))
    }
  }

  test("streamed-into clustered table keeps SPJ through triggers and maintenance") {
    withSpj {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = tmp()
      val rRoot = tmp()
      val ckpt = Files.createTempDirectory("clusteredsink").toString
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      // compactClusteredEvery=2: the second trigger folds the accumulated
      // per-bucket files back to one per bucket WITHOUT dropping the spec
      val q = graft.streaming.SnapshotSink.start(
        input.toDF().toDF("k", "a"), root, ckpt,
        clusterBy = Some((Seq("k"), 4)), compactClusteredEvery = 2)
      try {
        input.addData((1L to 1000L).map(i => (i, i)): _*)
        q.processAllAvailable()
        input.addData((1001L to 2000L).map(i => (i, i)): _*)
        q.processAllAvailable()
      } finally q.stop()
      val m = Snapshots.manifest(spark, root, Snapshots.headVersion(spark, root))
      assert(m.clustering === Some(Snapshots.Clustering(Seq("k"), 4)),
        "every trigger and the maintenance pass must keep the spec")
      assert(m.files.size <= 4,
        s"compactClustered must fold trigger files to one per bucket, got ${m.files.size}")
      Snapshots.commit((1L to 2000L).map(i => (i, i % 7)).toDF("k2", "b"), rRoot,
        clusterBy = Some((Seq("k2"), 4)))
      val joined = catalogRead(root).join(catalogRead(rRoot), col("k") === col("k2"))
      val p = plan(joined)
      assert(!p.contains("Exchange"),
        s"streamed-into clustered table must still join exchange-free:\n$p")
      assert(joined.count() === 2000L)
    }
  }

  test("a spec-dropping race halts clustered ingest with an actionable error, not a bare require") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val ckpt = Files.createTempDirectory("clusteredrace").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = graft.streaming.SnapshotSink.start(
      input.toDF().toDF("k", "a"), root, ckpt, clusterBy = Some((Seq("k"), 4)))
    try {
      input.addData((1L, 1L))
      q.processAllAvailable()
      // a concurrent UNCLUSTERED append drops the head's spec beneath the stream
      Snapshots.commit(Seq((99L, 99L)).toDF("k", "a"), root, append = true)
      assert(Snapshots.manifestMeta(spark, root,
        Snapshots.headVersion(spark, root)).clustering.isEmpty)
      input.addData((2L, 2L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("clustered streaming ingest")),
        s"expected the actionable terminal error, got: ${causes(e).map(_.getClass.getSimpleName)}")
    } finally q.stop()
  }

  test("sorted clustering: SMJ plans with zero exchanges AND zero sorts; files sorted on disk") {
    withSpj {
      val lRoot = tmp()
      val rRoot = tmp()
      val left = (1L to 5000L).map(i => (i, i * 2)).toDF("k", "a")
      val right = (2500L to 7500L).map(i => (i, i % 97)).toDF("k2", "b")
      Snapshots.commit(left, lRoot, clusterBy = Some((Seq("k"), 8)), clusterSorted = true)
      Snapshots.commit(right, rRoot, clusterBy = Some((Seq("k2"), 8)), clusterSorted = true)
      assert(Snapshots.clusteringAt(spark, lRoot, 1L) ===
        Some(Snapshots.Clustering(Seq("k"), 8, sorted = true)),
        "the sorted flag must round-trip through the manifest json")
      // every file's rows ascend on the key (the invariant the report asserts)
      Snapshots.manifest(spark, lRoot, 1L).files.foreach { f =>
        val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
        assert(ks === ks.sorted, s"file $f is not sorted on k")
      }
      val joined = catalogRead(lRoot).join(catalogRead(rRoot), col("k") === col("k2"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"), s"sorted-clustered SMJ must not shuffle:\n$p")
      assert("""\(\d+\) Sort\b""".r.findFirstIn(p).isEmpty,
        s"sorted-clustered SMJ must not re-sort either side:\n$p")
      val got = joined.agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
      val exp = left.join(right, $"k" === $"k2")
        .agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
      assert(got === exp)
      // UNsorted clustering pins the contrast: exchange-free but re-sorted
      val uRoot = tmp()
      val vRoot = tmp()
      Snapshots.commit(left, uRoot, clusterBy = Some((Seq("k"), 8)))
      Snapshots.commit(right, vRoot, clusterBy = Some((Seq("k2"), 8)))
      val p2 = plan(catalogRead(uRoot).join(catalogRead(vRoot), col("k") === col("k2")))
      assert(!p2.contains("Exchange") &&
        """\(\d+\) Sort\b""".r.findFirstIn(p2).isDefined,
        s"unsorted clustering must keep SPJ but sort both sides:\n$p2")
    }
  }

  test("sort report withdraws under multi-file buckets; compactClustered restores it") {
    withSpj {
      val root = tmp()
      val rRoot = tmp()
      Snapshots.commit((1L to 1000L).map(i => (i, i)).toDF("k", "a"), root,
        clusterBy = Some((Seq("k"), 4)), clusterSorted = true)
      Snapshots.commit((1001L to 2000L).map(i => (i, i)).toDF("k", "a"), root,
        append = true, clusterBy = Some((Seq("k"), 4)), clusterSorted = true)
      // an append with a different sortedness is a different spec: refused
      val e = intercept[IllegalArgumentException] {
        Snapshots.commit((1L to 10L).map(i => (i, i)).toDF("k", "a"), root,
          append = true, clusterBy = Some((Seq("k"), 4)))
      }
      assert(e.getMessage.contains("clustering"))
      Snapshots.commit((1L to 2000L).map(i => (i, i)).toDF("k2", "b"), rRoot,
        clusterBy = Some((Seq("k2"), 4)), clusterSorted = true)
      // two sorted files per bucket: their concatenation is NOT sorted —
      // the report must withdraw (Sorts appear) while SPJ holds
      val before = plan(catalogRead(root).join(catalogRead(rRoot),
        col("k") === col("k2")))
      assert(!before.contains("Exchange") &&
        """\(\d+\) Sort\b""".r.findFirstIn(before).isDefined,
        s"multi-file buckets must re-sort (concatenation unsorted):\n$before")
      // bucket-preserving compaction folds to one sorted file per bucket:
      // the report returns and the sorts vanish
      Snapshots.compactClustered(spark, root)
      assert(Snapshots.clusteringAt(spark, root,
        Snapshots.headVersion(spark, root)) ===
        Some(Snapshots.Clustering(Seq("k"), 4, sorted = true)))
      val joined = catalogRead(root).join(catalogRead(rRoot), col("k") === col("k2"))
      val after = plan(joined)
      assert(!after.contains("Exchange") &&
        """\(\d+\) Sort\b""".r.findFirstIn(after).isEmpty,
        s"post-compaction sorted buckets must merge sort-free:\n$after")
      assert(joined.count() === 2000L)
    }
  }

  test("SQL DDL/DML: CREATE TABLE + INSERT INTO + CTAS land as clustered engine commits") {
    withSpj {
      val root = tmp()
      val rRoot = tmp()
      // CREATE TABLE with a bucket layout = empty schema-recording commit
      spark.sql(
        s"CREATE TABLE graft.`$root` (k BIGINT, v BIGINT) " +
          "PARTITIONED BY (bucket(4, k))")
      assert(Snapshots.headVersion(spark, root) === 1L)
      assert(Snapshots.clusteringAt(spark, root, 1L) ===
        Some(Snapshots.Clustering(Seq("k"), 4)))
      assert(spark.table(s"graft.`$root`").count() === 0L)
      // INSERT INTO inherits the clustering — the table stays SPJ-ready
      spark.sql(s"INSERT INTO graft.`$root` " +
        "SELECT id AS k, id * 2 AS v FROM range(1, 2001)")
      assert(Snapshots.clusteringAt(spark, root, 2L) ===
        Some(Snapshots.Clustering(Seq("k"), 4)),
        "a SQL insert must not declassify a clustered table")
      // CTAS stages atomically: the SELECT's write IS v1
      spark.sql(
        s"CREATE TABLE graft.`$rRoot` PARTITIONED BY (bucket(4, k2)) AS " +
          "SELECT id AS k2, id % 7 AS b FROM range(1, 2001)")
      assert(Snapshots.headVersion(spark, rRoot) === 1L)
      assert(Snapshots.clusteringAt(spark, rRoot, 1L) ===
        Some(Snapshots.Clustering(Seq("k2"), 4)))
      // creating over an existing table refuses
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$root` (x BIGINT)")
      }
      // and the two SQL-born tables join exchange-free
      val joined = spark.sql(
        s"SELECT v, b FROM graft.`$root` JOIN graft.`$rRoot` ON k = k2")
      val p = plan(joined)
      assert(!p.contains("Exchange"),
        s"SQL-born co-clustered tables must join without shuffles:\n$p")
      val exp = (1L to 2000L).map(i => i * 2 + i % 7).sum
      assert(joined.agg(sum($"v" + $"b")).head().getLong(0) === exp)
    }
  }

  test("skewed buckets: partially-clustered distribution keeps SPJ row-exact") {
    withSpj {
      val prev = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
      try {
        // SPJ's skew mitigation: the smaller side's matching partitions
        // replicate so one hot storage bucket splits across tasks instead
        // of serializing the stage on it — layout decided at write time,
        // skew handled at plan time. The assertion that matters is
        // ROW-EXACTNESS under replication (a bug here double-counts).
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
          "true")
        val lRoot = tmp()
        val rRoot = tmp()
        // 80% of the fact rows land on ONE key → one hot bucket
        val fact = (1L to 5000L).map(i =>
          (if (i % 5 != 0) 7L else i, i)).toDF("k", "a")
        val dim = (1L to 1000L).map(i => (i, i * 10)).toDF("k2", "b")
        Snapshots.commit(fact, lRoot, clusterBy = Some((Seq("k"), 8)))
        Snapshots.commit(dim, rRoot, clusterBy = Some((Seq("k2"), 8)))
        val joined = catalogRead(lRoot).join(catalogRead(rRoot),
          col("k") === col("k2"))
        val p = plan(joined)
        assert(!p.contains("Exchange"), s"skewed SPJ must still not shuffle:\n$p")
        val got = joined.agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
        val exp = fact.join(dim, col("k") === col("k2"))
          .agg(count(lit(1)), sum($"a" + $"b")).as[(Long, Long)].first()
        assert(got === exp, "partially-clustered replication must stay row-exact")
      } finally prev.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"))(
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", _))
    }
  }

  test("one-side-shuffle SPJ: an unclustered side routes INTO the storage buckets") {
    withSpj {
      val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
      try {
        spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
        val root = tmp()
        Snapshots.commit((1L to 4000L).map(i => (i, i * 3)).toDF("k", "a"), root,
          clusterBy = Some((Seq("k"), 8)))
        val other = (2000L to 6000L).map(i => (i, i % 13)).toDF("k2", "b")
        val joined = catalogRead(root).join(other, col("k") === col("k2"))
        val p = plan(joined)
        // at most ONE exchange (the plain side routing into the buckets);
        // row-exactness is the REAL assertion: Spark shuffles the plain
        // side through OUR bucket function — a writer/function hash
        // disagreement would silently drop matches, not error
        // formatted explain names each node twice (tree + detail): count
        // the detail headers
        assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 1,
          s"only the unclustered side may shuffle:\n$p")
        assert(joined.count() === 2001L)
        val got = joined.agg(sum($"a" + $"b")).as[Long].first()
        val exp = (1L to 4000L).map(i => (i, i * 3)).toDF("k", "a")
          .join(other, col("k") === col("k2"))
          .agg(sum($"a" + $"b")).as[Long].first()
        assert(got === exp)
      } finally prev.fold(
        spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", _))
    }
  }
}
