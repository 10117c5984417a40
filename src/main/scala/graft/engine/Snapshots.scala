package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-manifested table layout: atomic multi-file commits, time-travel
  * reads, optimistic concurrency, and reader-safe compaction.
  *
  * Why this exists at 100 TB: a directory-is-the-table layout (S3Like.putDf,
  * and the reference's whole key-prefix model, pandas_aws/s3.py:33-35) makes
  * a multi-file write visible file by file — a concurrent reader sees a
  * half-written dataset, an overwrite is a destructive window, and a
  * compaction (Compact.scala) swaps files under running queries. The fix is
  * the manifest pattern (Iceberg/Delta's core idea, re-expressed minimally):
  * data files are IMMUTABLE and appear in no query until a manifest lists
  * them; a commit is the creation of ONE small json file; readers pin the
  * manifest they opened with and are immune to everything committed later.
  *
  * Concurrency contract: version v is owned by whoever exclusively creates
  * `_snapshots/manifest-v.json` (`FileSystem.create(overwrite=false)` — an
  * atomic create-if-absent on local/HDFS; an object store needs its
  * conditional-put header here, the one primitive a catalog service
  * supplies). Losers observe the collision and retry at v+1 against the
  * refreshed head — optimistic concurrency with no lock server. The HEAD
  * version is derived by listing `_snapshots/` (one listing of a directory
  * holding one small file per commit — never a data-file listing).
  *
  * Scale shape: reads are `spark.read.parquet(files…)` on the manifest's
  * explicit file list — no directory listing of the data tree at all, which
  * at lake scale (millions of objects) is the difference between plan-time
  * milliseconds and minutes. Compaction commits a rewritten file set as a
  * NEW version: pinned readers keep their files (vacuum is the explicit,
  * separate destruction step), and the head flips atomically.
  */
object Snapshots {

  /** Per-file numeric column range, collected at commit time. The manifest
    * becomes a file-level min/max index: a range predicate prunes the FILE
    * LIST before the scan is even planned — the complement of row-group
    * stats (which require opening every footer) and the payoff side of
    * z-order/range clustering (tight per-file ranges ⇒ most files prune). */
  final case class ColStats(file: String, col: String, min: Double, max: Double)

  /** One committed table state. `files` are absolute URIs, immutable.
    * `tag` is a caller idempotency token ("" = untagged): a commit carrying
    * an already-present tag is skipped, which turns at-least-once callers
    * (streaming foreachBatch replays) into exactly-once table states.
    * `ts` is the publish wall-clock (epoch millis; 0 in pre-ts manifests)
    * — what [[readAsOf]] time-travels by. `schema` is the table schema as
    * StructType json ("" in pre-schema manifests): reads plan against THIS
    * — no footer sampling of data files — and files written before a
    * column existed surface it as nulls (the parquet reader's
    * missing-column fill), which is what makes additive schema evolution
    * safe under every other operation here. */
  final case class Manifest(
      version: Long,
      files: Seq[String],
      parent: Long,
      stats: Seq[ColStats] = Seq.empty,
      tag: String = "",
      ts: Long = 0L,
      schema: String = "")

  private val SnapDir = "_snapshots"
  private val ManifestRe = "manifest-(\\d+)\\.json".r

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long) =
    new Path(s"$root/$SnapDir/manifest-$v.json")

  /** Latest committed version, 0 when the table has no snapshot yet. */
  def headVersion(spark: SparkSession, root: String): Long = {
    val dir = new Path(s"$root/$SnapDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) 0L
    else
      f.listStatus(dir).toSeq
        .flatMap(st => ManifestRe.findFirstMatchIn(st.getPath.getName).map(_.group(1).toLong))
        .maxOption.getOrElse(0L)
  }

  /** Read manifest v (throws with a clear message when v was never
    * committed or has been vacuumed away). */
  def manifest(spark: SparkSession, root: String, v: Long): Manifest = {
    val p = manifestPath(root, v)
    val f = fs(spark, root)
    require(f.exists(p), s"snapshot $v does not exist at $root (vacuumed or never committed)")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseManifest(text)
  }

  /** Whether version v's manifest is still retained (not vacuumed). */
  private[engine] def manifestExists(spark: SparkSession, root: String, v: Long): Boolean =
    fs(spark, root).exists(manifestPath(root, v))

  /** All retained manifests, oldest first. */
  def history(spark: SparkSession, root: String): Seq[Manifest] = {
    val dir = new Path(s"$root/$SnapDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .flatMap(st => ManifestRe.findFirstMatchIn(st.getPath.getName).map(_.group(1).toLong))
        .sorted
        .map(v => manifest(spark, root, v))
  }

  /** Commit `df` as the next snapshot. `append=true` carries the parent
    * manifest's files forward (the new version = old data + this batch);
    * `append=false` is a logical overwrite (old files stay on disk for
    * pinned readers / time travel until `vacuum`). Returns the committed
    * version. Data lands under an unguessable per-commit directory first,
    * so a losing racer's files never collide with the winner's and an
    * aborted write leaves nothing a manifest could ever reference. */
  def commit(
      df: DataFrame,
      root: String,
      append: Boolean = false,
      statsCols: Seq[String] = Seq.empty,
      tag: String = ""): Long = {
    val spark = df.sparkSession
    val (written, newStats) = writeBatch(df, root, statsCols)
    publish(spark, root, written, newStats, tag, df.schema) { head =>
      if (append && head.isDefined) Some(head.get) else None
    }
  }

  /** Write one immutable batch under an unguessable commit dir; return its
    * file URIs + collected stats. Nothing references these files until a
    * manifest publishes them. */
  private def writeBatch(
      df: DataFrame,
      root: String,
      statsCols: Seq[String]): (Seq[String], Seq[ColStats]) = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$root/data/c-$commitId"
    df.write.parquet(dataDir)
    val written = f.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    (written, collectStats(spark, dataDir, statsCols))
  }

  /** Additive schema evolution: the carried schema plus any columns the
    * batch introduces (appended, nullable for old files via parquet's
    * missing-column fill). A same-name column with a different type is a
    * hard error — silent coercion is how lakes corrupt. */
  private def mergeSchemas(parent: Option[StructType], batch: StructType): StructType =
    parent.fold(batch) { p =>
      val byName = p.fields.map(f => f.name -> f).toMap
      batch.fields.foreach { f =>
        byName.get(f.name).foreach { old =>
          require(old.dataType == f.dataType,
            s"schema evolution type conflict on '${f.name}': " +
              s"table has ${old.dataType.simpleString}, batch has ${f.dataType.simpleString}")
        }
      }
      StructType(p.fields ++ batch.fields.filterNot(f => byName.contains(f.name)))
    }

  private def parseSchema(m: Manifest): Option[StructType] =
    if (m.schema.isEmpty) None
    else Some(DataType.fromJson(m.schema).asInstanceOf[StructType])

  /** Scan exactly `files`, planned against the manifest's recorded schema
    * when present (no footer sampling; pre-schema files fill missing
    * columns with nulls). */
  private def readFiles(spark: SparkSession, m: Manifest, files: Seq[String]): DataFrame =
    parseSchema(m) match {
      case Some(s) if files.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case Some(s) => spark.read.schema(s).parquet(files: _*)
      case None if files.isEmpty => spark.emptyDataFrame
      case None => spark.read.parquet(files: _*)
    }

  /** Optimistic-commit loop: re-derive the carried base from the CURRENT
    * head on every attempt (so a retry lands on top of the racer's state,
    * never a stale one), then publish atomically. `base(head)` returns the
    * manifest whose files/stats to carry forward, or None for none. */
  private def publish(
      spark: SparkSession,
      root: String,
      written: Seq[String],
      newStats: Seq[ColStats],
      tag: String,
      batchSchema: StructType)(base: Option[Manifest] => Option[Manifest]): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 50, s"gave up committing to $root after 50 version collisions")
      val head = headVersion(spark, root)
      val parent = base(if (head > 0) Some(manifest(spark, root, head)) else None)
      val m = Manifest(
        head + 1,
        parent.map(_.files).getOrElse(Seq.empty) ++ written,
        head,
        parent.map(_.stats).getOrElse(Seq.empty) ++ newStats,
        tag,
        ts = System.currentTimeMillis(),
        schema = {
          // a field-less schema means "unknown" (legacy restore path) —
          // record "" so reads fall back to footers, not a 0-column plan
          val s = mergeSchemas(parent.flatMap(parseSchema), batchSchema)
          if (s.fields.isEmpty) "" else s.json
        })
      if (tryWriteManifest(spark, root, m)) return m.version
      // else: another writer took version head+1 between our listing and
      // our create — refresh the head and retry on top of THEIR commit
    }
    0L // unreachable
  }

  /** Copy-on-write MERGE (upsert by key): rows of `df` replace same-key
    * rows of the head snapshot; everything else carries forward UNTOUCHED —
    * by file reference, not rewrite. The stats index makes that cheap:
    * when the batch's distinct keys fit the driver cap, a file is touched
    * only if its recorded `key` range CONTAINS one of them (per-file set
    * membership — tight even for keys scattered across the table, whose
    * global [min, max] would cover everything); larger batches prune by
    * that global range. At 100 TB a point-ish upsert rewrites a sliver of
    * the table while a manifest-less layout rewrites (or
    * full-shuffle-joins) all of it. Files without recorded stats rewrite
    * conservatively. The rewrite
    * is one pruned scan → anti join (batch side broadcastable) → union;
    * the commit publishes (untouched ++ rewritten) atomically, losers of a
    * concurrent-commit race retry ON THE RETRY'S OWN head only if the
    * untouched set is unchanged — a conflicting overlap aborts rather than
    * silently dropping the racer's rows. */
  def merge(
      df: DataFrame,
      root: String,
      key: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.{col, min, max}
    val headV = headVersion(spark, root)
    require(headV > 0, s"no snapshot committed at $root yet — merge needs a base")
    val m = manifest(spark, root, headV)
    // key-set pruning first (per-file membership — tight for scattered
    // keys); a too-large set falls back to the global range scalars
    val touched = collectKeys(df, key) match {
      case Some(ks) =>
        require(ks.nonEmpty, "merge batch has no non-null keys")
        candidateFilesForKeys(m, key, ks)
      case None =>
        val r = df.agg(min(col(key).cast("double")), max(col(key).cast("double"))).head()
        require(!r.isNullAt(0), "merge batch has no non-null keys")
        candidateFiles(m, key, r.getDouble(0), r.getDouble(1))
    }
    val untouched = m.files.filterNot(touched.toSet)
    val untouchedNames = untouched.map(u => new Path(u).getName).toSet
    val survivors =
      if (touched.isEmpty) df
      else readFiles(spark, m, touched)
        .join(df.select(col(key)).distinct(), Seq(key), "left_anti")
        // allowMissingColumns: an evolving batch may introduce columns
        // (survivors fill nulls) or omit late-added ones (batch fills)
        .unionByName(df, allowMissingColumns = true)
    val (written, newStats) = writeBatch(survivors, root, statsCols)
    publish(spark, root, written, newStats, tag = "", survivors.schema) { head =>
      val h = head.getOrElse(sys.error("merge base vanished"))
      require(h.version == headV,
        s"concurrent commit (v${h.version} != v$headV) overlaps this merge — retry the merge")
      Some(Manifest(h.version, untouched, h.parent,
        h.stats.filter(s => untouchedNames.contains(s.file)),
        schema = h.schema))
    }
  }

  /** Copy-on-write DELETE by key set: rows of the head snapshot whose `key`
    * appears in `keys` are removed; everything else carries forward BY FILE
    * REFERENCE. The right-to-erasure shape at 100 TB: the stats index
    * prunes to the files whose recorded `key` range overlaps the delete
    * set's [min, max], only those are read, anti-joined (the key set is
    * batch-sized — broadcastable), and rewritten without the matching rows;
    * a delete that can touch nothing is a true no-op (no new version).
    * Old versions still SEE the rows until [[vacuum]] destroys their files
    * — erasure is complete exactly when retention policy says so, the same
    * contract as every other history-bearing operation here. Concurrency:
    * same optimistic arbiter as [[merge]] — a racing commit aborts the
    * delete rather than silently resurrecting rows. */
  def delete(
      keys: DataFrame,
      root: String,
      key: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spark = keys.sparkSession
    import org.apache.spark.sql.functions.{col, min, max}
    val headV = headVersion(spark, root)
    require(headV > 0, s"no snapshot committed at $root yet — delete needs a base")
    val m = manifest(spark, root, headV)
    val touched = collectKeys(keys, key) match {
      case Some(ks) if ks.isEmpty => return headV // empty key set: nothing to delete
      case Some(ks) => candidateFilesForKeys(m, key, ks)
      case None =>
        val r = keys.agg(min(col(key).cast("double")), max(col(key).cast("double"))).head()
        if (r.isNullAt(0)) return headV
        candidateFiles(m, key, r.getDouble(0), r.getDouble(1))
    }
    if (touched.isEmpty) return headV // no file can hold a matching row
    val untouched = m.files.filterNot(touched.toSet)
    val untouchedNames = untouched.map(u => new Path(u).getName).toSet
    val survivors = readFiles(spark, m, touched)
      .join(keys.select(col(key)).distinct(), Seq(key), "left_anti")
    val (written, newStats) = writeBatch(survivors, root, statsCols)
    publish(spark, root, written, newStats, tag = "", survivors.schema) { head =>
      val h = head.getOrElse(sys.error("delete base vanished"))
      require(h.version == headV,
        s"concurrent commit (v${h.version} != v$headV) overlaps this delete — retry")
      Some(Manifest(h.version, untouched, h.parent,
        h.stats.filter(s => untouchedNames.contains(s.file)),
        schema = h.schema))
    }
  }

  /** One scan of the freshly-written files (only — never the table) for
    * per-file min/max of the requested numeric columns. */
  private def collectStats(
      spark: SparkSession,
      dataDir: String,
      statsCols: Seq[String]): Seq[ColStats] = {
    if (statsCols.isEmpty) return Seq.empty
    import org.apache.spark.sql.functions._
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .toSeq
      .flatMap { row =>
        // key by basename: part-file names carry a per-task UUID (globally
        // unique), and input_file_name()'s URI rendering (file:///) differs
        // from listStatus's (file:/) — basenames sidestep the mismatch
        val file = new Path(row.getAs[String]("__f")).getName
        statsCols.flatMap { c =>
          val lo = row.getAs[Any](s"min_$c")
          val hi = row.getAs[Any](s"max_$c")
          if (lo == null || hi == null) None // all-null file: no usable range
          else {
            val (l, h) = (lo.asInstanceOf[Double], hi.asInstanceOf[Double])
            // a NaN/infinite bound can't prune soundly AND won't round-trip
            // as a JSON number — record no range (conservative)
            if (java.lang.Double.isFinite(l) && java.lang.Double.isFinite(h))
              Some(ColStats(file, c, l, h))
            else None
          }
        }
      }
  }

  /** The subset of `m.files` a [lo, hi] range predicate on `c` can touch:
    * files whose recorded range overlaps, plus files with no recorded range
    * (pruning must stay conservative). */
  def candidateFiles(m: Manifest, c: String, lo: Double, hi: Double): Seq[String] = {
    val ranges = m.stats.filter(_.col == c).map(s => s.file -> s).toMap
    m.files.filter { f =>
      ranges.get(new Path(f).getName) match {
        case Some(s) => s.min <= hi && s.max >= lo
        case None => true
      }
    }
  }

  /** Key-SET pruning: the files whose recorded `c` range contains at least
    * one of `keys` (sorted ascending). For a scattered key set — the
    * right-to-erasure shape, keys spread across the table — the set's
    * global [min, max] covers nearly every file, but each FILE's tight
    * range (z-order/range-clustered layouts) contains few or none of the
    * keys, so per-file membership prunes orders of magnitude harder.
    * O(|files| · log |keys|); stat-less files stay conservative. */
  def candidateFilesForKeys(m: Manifest, c: String, keys: Array[Double]): Seq[String] = {
    val ranges = m.stats.filter(_.col == c).map(s => s.file -> s).toMap
    m.files.filter { f =>
      ranges.get(new Path(f).getName) match {
        case Some(s) =>
          val i = java.util.Arrays.binarySearch(keys, s.min)
          val idx = if (i >= 0) i else -i - 1
          idx < keys.length && keys(idx) <= s.max
        case None => true
      }
    }
  }

  /** Distinct non-null keys of a batch, sorted, when they fit the driver
    * cap (one small job — the build-side pattern); None when the set is
    * too large to collect, in which case callers prune by the global
    * range instead (still sound, less tight). */
  private def collectKeys(keysDf: DataFrame, key: String): Option[Array[Double]] = {
    import org.apache.spark.sql.functions.col
    val MaxDriverKeys = 100000
    val collected = keysDf
      .filter(col(key).isNotNull)
      .select(col(key).cast("double")).distinct()
      .limit(MaxDriverKeys + 1).collect().map(_.getDouble(0))
    if (collected.length > MaxDriverKeys) None
    else { java.util.Arrays.sort(collected); Some(collected) }
  }

  /** Range read through the manifest index: prune the file list to the
    * overlapping files, then apply the predicate exactly. Result is
    * identical to filtering a full read — the index only shrinks the scan
    * (at lake scale: from every-file to the z-order/cluster-tight sliver). */
  def readRange(
      spark: SparkSession,
      root: String,
      c: String,
      lo: Double,
      hi: Double,
      version: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = if (version >= 0) version else headVersion(spark, root)
    require(v > 0, s"no snapshot committed at $root yet")
    val m = manifest(spark, root, v)
    val keep = candidateFiles(m, c, lo, hi)
    val pred = col(c).cast("double") >= lo && col(c).cast("double") <= hi
    if (keep.isEmpty)
      // every file pruned: preserve schema (and exactness) via a plan that
      // cannot return rows — with a recorded schema that is a true empty
      // relation; legacy manifests fall back to a lit(false)-filtered scan
      (if (m.schema.nonEmpty) readFiles(spark, m, Seq.empty)
       else spark.read.parquet(m.files: _*))
        .filter(org.apache.spark.sql.functions.lit(false))
    else readFiles(spark, m, keep).filter(pred)
  }

  /** Time travel by wall clock: read the newest version whose publish
    * timestamp is ≤ `tsMillis` (ties: highest version). The reproducibility
    * primitive — "the table as the Tuesday run saw it" without recording a
    * version number anywhere. Throws when every retained version is newer
    * (the asked-for state is vacuumed or never existed). */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame = {
    val eligible = history(spark, root).filter(_.ts <= tsMillis)
    require(eligible.nonEmpty,
      s"no retained snapshot at $root published at or before $tsMillis")
    read(spark, root, eligible.map(_.version).max)
  }

  /** Read snapshot `version` (default: head). The returned plan scans
    * exactly the manifest's file list — no data-directory listing. */
  def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else headVersion(spark, root)
    require(v > 0, s"no snapshot committed at $root yet")
    val m = manifest(spark, root, v)
    readFiles(spark, m, m.files)
  }

  /** File-level diff between two versions: (added, removed) — files present
    * only in `toV`, files present only in `fromV`. `fromV = 0` is the empty
    * base (everything in `toV` is added). The diff is manifest arithmetic:
    * two small file lists, no data I/O and no directory listing. */
  def diffFiles(
      spark: SparkSession,
      root: String,
      fromV: Long,
      toV: Long): (Seq[String], Seq[String]) = {
    val fromFiles =
      if (fromV == 0) Set.empty[String]
      else manifest(spark, root, fromV).files.toSet
    val toFiles = manifest(spark, root, toV).files.toSet
    ((toFiles -- fromFiles).toSeq.sorted, (fromFiles -- toFiles).toSeq.sorted)
  }

  /** Signed row delta between two versions: every row of an added file with
    * `_sign = 1`, every row of a removed file with `_sign = -1`. Rows a
    * rewrite merely carried forward appear once with each sign and CANCEL in
    * any additive aggregate — so an incremental count/sum refresh can
    * consume this directly, one pass, no row-matching join (see
    * [[Incremental]]). Cost ∝ changed files, never the table: an append
    * touches the appended files only, a point-ish merge the overlapping
    * sliver, and a compaction (full rewrite, same rows) is pure
    * cancellation. */
  def signedDelta(
      spark: SparkSession,
      root: String,
      fromV: Long,
      toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (added, removed) = diffFiles(spark, root, fromV, toV)
    val mTo = manifest(spark, root, toV)
    if (mTo.schema.nonEmpty)
      // both sides plan against the TARGET version's recorded schema, so a
      // delta spanning a schema evolution compares rows in one shape
      // (pre-evolution files fill the new columns with nulls) and an empty
      // side is a true empty relation — the plan's only file scans are the
      // changed files, which is the operator's whole point
      readFiles(spark, mTo, added).withColumn("_sign", lit(1))
        .unionByName(readFiles(spark, mTo, removed).withColumn("_sign", lit(-1)))
    else {
      // legacy manifests (no recorded schema): one footer read supplies it
      val addedDf = if (added.nonEmpty) Some(spark.read.parquet(added: _*)) else None
      val removedDf = if (removed.nonEmpty) Some(spark.read.parquet(removed: _*)) else None
      val schema = addedDf.orElse(removedDf).map(_.schema).getOrElse {
        require(mTo.files.nonEmpty,
          s"cannot derive a schema for an empty diff over an empty snapshot at $root")
        spark.read.parquet(mTo.files.head).schema
      }
      def empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      addedDf.getOrElse(empty).withColumn("_sign", lit(1))
        .unionByName(removedDf.getOrElse(empty).withColumn("_sign", lit(-1)))
    }
  }

  /** Net row-level changes between two versions (CDC read): columns of the
    * table plus `_op` — 'I' for net-inserted rows, 'D' for net-deleted rows.
    * Multiset semantics: a row appearing k more times in `toV` than in
    * `fromV` yields k 'I' rows. Built from the signed delta by multiset
    * difference (`exceptAll` both ways), so carried-forward rows in
    * rewritten files drop out and a pure compaction yields ZERO changes.
    * Scans only the manifest diff's files — at 100 TB the cost of reading a
    * day's changes is the day's files, not the table. */
  def changes(
      spark: SparkSession,
      root: String,
      fromV: Long,
      toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val signed = signedDelta(spark, root, fromV, toV)
    val a = signed.filter(col("_sign") === 1).drop("_sign")
    val r = signed.filter(col("_sign") === -1).drop("_sign")
    a.exceptAll(r).withColumn("_op", lit("I"))
      .unionByName(r.exceptAll(a).withColumn("_op", lit("D")))
  }

  /** Idempotent tagged commit: a no-op returning None when any retained
    * manifest already carries `tag`. The streaming-ingest primitive —
    * foreachBatch delivers at-least-once, so a restart may replay a batch
    * the table already absorbed; keying each batch's commit on its batch id
    * makes the replay observable and skippable, and the table's states are
    * exactly-once. (Same contract as EventStream's upsert-based view, but
    * for append-shaped ingest where idempotent-per-key upserts don't apply.) */
  def commitIfAbsent(
      df: DataFrame,
      root: String,
      tag: String,
      append: Boolean = true,
      statsCols: Seq[String] = Seq.empty): Option[Long] = {
    require(tag.nonEmpty, "idempotency tag must be non-empty")
    if (history(df.sparkSession, root).exists(_.tag == tag)) None
    else Some(commit(df, root, append, statsCols, tag))
  }

  /** Roll the table back to `version` — as a NEW commit whose file list is
    * the old version's (by reference, no data movement), so the rollback
    * is itself history: auditable, time-travelable, and CDC between the
    * bad head and the restored head is exactly the bad commits' inverse.
    * Requires the target manifest still retained (vacuum is the only thing
    * that forecloses a restore). */
  def restore(spark: SparkSession, root: String, version: Long): Long = {
    val target = manifest(spark, root, version) // throws if vacuumed away
    publish(spark, root, target.files, target.stats, tag = "",
      parseSchema(target).getOrElse(new StructType())) { _ => None }
  }

  /** Rewrite the head snapshot into `targetFiles` files and commit the
    * compacted layout as a NEW version. Readers pinned to older versions
    * keep their (still-present) files — this is the maintenance operation
    * the manifest layer exists to make safe. */
  def compact(
      spark: SparkSession,
      root: String,
      targetFiles: Int = 1,
      statsCols: Seq[String] = Seq.empty): Long = {
    val head = headVersion(spark, root)
    // a fully-emptied table (e.g. delete removed every row) has nothing to
    // rewrite — and no file to take a schema from; true no-op
    if (head > 0 && manifest(spark, root, head).files.isEmpty) return head
    commit(read(spark, root).repartition(targetFiles), root,
      append = false, statsCols = statsCols)
  }

  /** Z-order-clustering compaction — the OPTIMIZE-by-layout maintenance
    * step: rewrite the head along the Morton curve of `dims`
    * ([[ZOrder.cluster]]) and re-collect per-file stats for those
    * dimensions, so the manifest's min/max index holds TIGHT ranges on
    * every z-dim and [[readRange]] prunes a band scan to a sliver of the
    * file list. Accumulated appends each cover the full key range (every
    * batch's file spans everything), so range reads degrade toward
    * all-files as a table grows; this restores them in one commit, under
    * the same pinned-reader/atomic-flip contract as [[compact]]. Stats
    * default to the z-dims themselves (the columns whose ranges the
    * rewrite just tightened). */
  def compactZOrder(
      spark: SparkSession,
      root: String,
      dims: Seq[String],
      targetFiles: Int,
      statsCols: Seq[String] = Seq.empty): Long = {
    require(dims.nonEmpty, "need at least one z-order dimension")
    val head = headVersion(spark, root)
    if (head > 0 && manifest(spark, root, head).files.isEmpty) return head
    commit(ZOrder.cluster(read(spark, root), dims, targetFiles), root,
      append = false,
      statsCols = if (statsCols.isEmpty) dims else statsCols)
  }

  /** Destroy history: keep the newest `keepLast` manifests, delete older
    * ones plus every data file no retained manifest references. The only
    * operation that deletes data — explicit and separate from commit, so
    * time travel is a retention POLICY decision, not a side effect. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must retain at least the head snapshot")
    val f = fs(spark, root)
    val all = history(spark, root)
    if (all.size <= keepLast) return
    val (drop, keep) = all.splitAt(all.size - keepLast)
    val live = keep.flatMap(_.files).toSet
    drop.flatMap(_.files).distinct.filterNot(live.contains)
      .foreach(uri => f.delete(new Path(uri), false))
    drop.foreach(m => f.delete(manifestPath(root, m.version), false))
  }

  /** Clean up ORPHANED data files — files under `data/` that no retained
    * manifest references and never will: the debris of aborted commits
    * (files written, manifest never published — a crashed writer, a racer
    * that gave up) and of vacuumed history. Invisible to every reader by
    * construction, but they cost storage forever since [[vacuum]] only
    * deletes what a DROPPED manifest referenced. `graceMs` protects
    * commits in flight (a writer that has landed files but not yet
    * published its manifest): only files older than the grace window are
    * eligible. Returns the number of files deleted; empty per-commit
    * directories are removed afterwards. */
  def vacuumOrphans(spark: SparkSession, root: String, graceMs: Long = 3600000L): Int = {
    val f = fs(spark, root)
    val dataDir = new Path(s"$root/data")
    if (!f.exists(dataDir)) return 0
    val live = history(spark, root).flatMap(_.files).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    val it = f.listFiles(dataDir, /*recursive=*/ true)
    val toDelete = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(st => st.isFile &&
        !live.contains(st.getPath.toString) &&
        st.getModificationTime < cutoff)
      .map(_.getPath).toList
    toDelete.foreach { p => if (f.delete(p, false)) deleted += 1 }
    // drop now-empty per-commit directories
    f.listStatus(dataDir).filter(_.isDirectory).foreach { d =>
      if (f.listStatus(d.getPath).isEmpty) f.delete(d.getPath, false)
    }
    deleted
  }

  /** Atomic create-if-absent of a COMPLETE manifest; false = lost the race.
    *
    * Two-phase: render to a per-writer temp file, then publish with an
    * atomic no-replace primitive, so (a) the loser of a version race
    * observes the collision — Hadoop's local `create(overwrite=false)` is
    * check-then-act and lets both racers "win" — and (b) no reader can
    * ever open a half-written manifest. Local POSIX: `createLink` (link(2)
    * fails-if-exists, atomically, with content already durable). HDFS:
    * `rename` (atomic at the namenode, false if the destination exists).
    * S3-like stores have neither — that's the conditional-put / catalog
    * dependency called out in the object scaladoc. */
  private def tryWriteManifest(spark: SparkSession, root: String, m: Manifest): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/$SnapDir"))
    val target = manifestPath(root, m.version)
    val tmp = new Path(s"$root/$SnapDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, /*overwrite=*/ true)
    try out.write(renderManifest(m).getBytes("UTF-8")) finally out.close()
    try {
      if ("file" == target.toUri.getScheme) {
        val t = java.nio.file.Paths.get(target.toUri.getPath)
        val s = java.nio.file.Paths.get(tmp.toUri.getPath)
        try { java.nio.file.Files.createLink(t, s); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        // HDFS-style: rename is atomic and refuses an existing destination
        f.rename(tmp, target)
      }
    } finally f.delete(tmp, false)
  }

  private def renderManifest(m: Manifest): String = {
    // files LAST: the parser anchors its greedy bracket match on the final
    // array, so file arrays never need nested-structure parsing
    val stats = m.stats.map(s =>
      s"""{"file":${graft.JsonStr(s.file)},"col":${graft.JsonStr(s.col)},"min":${s.min},"max":${s.max}}""")
      .mkString("[", ",", "]")
    val files = m.files.map(graft.JsonStr(_)).mkString("[", ",", "]")
    s"""{"version":${m.version},"parent":${m.parent},"ts":${m.ts},"tag":${graft.JsonStr(m.tag)},"schema":${graft.JsonStr(m.schema)},"stats":$stats,"files":$files}"""
  }

  /** Minimal parser for the exact shape renderManifest emits (keys fixed,
    * fixed field order, files array last) — no json library in the
    * classpath contract, same stance as JsonStr on the write side. */
  private def parseManifest(text: String): Manifest = {
    def longField(key: String): Long =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(text)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"bad manifest: missing $key in $text"))
    val files = """"files":\[(.*)\]""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse(sys.error(s"bad manifest: missing files in $text"))
    val fileSeq =
      if (files.trim.isEmpty) Seq.empty[String]
      else """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(files)
        .map(m => unescape(m.group(1))).toSeq
    val num = """-?[0-9.eE+-]+"""
    val statSeq =
      ("""\{"file":"((?:[^"\\]|\\.)*)","col":"((?:[^"\\]|\\.)*)","min":(""" + num +
        """),"max":(""" + num + """)\}""").r
        .findAllMatchIn(text).map { g =>
          ColStats(unescape(g.group(1)), unescape(g.group(2)),
            g.group(3).toDouble, g.group(4).toDouble)
        }.toSeq
    val tag = """"tag":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
      .map(m => unescape(m.group(1))).getOrElse("")
    // optional: pre-ts manifests read as ts=0 (always readAsOf-eligible)
    val ts = """"ts":(-?\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toLong).getOrElse(0L)
    // optional: pre-schema manifests read as "" (reads fall back to footers)
    val schema = """"schema":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
      .map(m => unescape(m.group(1))).getOrElse("")
    Manifest(longField("version"), fileSeq, longField("parent"), statSeq, tag, ts, schema)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
