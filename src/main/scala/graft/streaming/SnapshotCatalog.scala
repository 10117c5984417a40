package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.Snapshots

/** Path-addressed CATALOG over snapshot tables — the piece that turns the
  * engine's hash-clustered layout ([[Snapshots.Clustering]]) into Spark
  * STORAGE-PARTITIONED JOINS.
  *
  * Register once per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.streaming.SnapshotCatalog")
  *   spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  * }}}
  * then address any snapshot table by its root path, backtick-quoted as
  * one identifier part: `spark.table("graft.`/lake/facts`")` (SQL:
  * ``SELECT ... FROM graft.`/lake/facts` ``).
  *
  * Why a catalog at all, when `spark.read.format(...).load()` already
  * reads these tables: Spark resolves a scan's reported
  * `KeyGroupedPartitioning(bucket(n, col))` ONLY for relations whose
  * catalog also implements [[FunctionCatalog]] and serves the `bucket`
  * function — a bare path-based relation has no function catalog, so its
  * reported partitioning is discarded and every join shuffles. Through
  * this catalog, two tables clustered on their join keys with the same
  * bucket count plan a sort-merge join with ZERO ShuffleExchange on
  * either side — at 100 TB the exchange IS the query cost, and this
  * removes it for every repeated join on the clustered key.
  *
  * The served `bucket` function reproduces the writer's mapping exactly:
  * `pmod(murmur3(key, seed=42), n)` — the same `HashPartitioning`
  * arithmetic `df.repartition(n, col)` used when [[Snapshots.commit]]
  * laid the files out (`clusterBy`). The agreement is pinned by spec
  * against Spark's own `hash()` SQL function; it is what makes Spark's
  * one-side-shuffle fallback (`spark.sql.sources.v2.bucketing.shuffle
  * .enabled`) route rows to the correct storage bucket. */
class SnapshotCatalog extends TableCatalog with FunctionCatalog
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** The table root is the identifier itself. One backticked part is the
    * normal form; dotted forms reassemble (a.b.c → "a.b.c") so an
    * unquoted dotted path still resolves. */
  private def rootOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (Snapshots.headVersion(SparkSession.active, root) == 0)
      throw new NoSuchTableException(ident)
    new SnapshotStreamTable(
      SnapshotSource.surfacedSchema(root),
      Map("root" -> root, "sqlResolved" -> "true"))
  }

  /** SQL time travel: ``SELECT ... FROM graft.`/lake/t` VERSION AS OF 3``.
    * The table pins its version as a property — the scan builder's merged
    * options carry it, so pruning/stats/aggregate pushdown all answer for
    * THAT version, and the schema is the version's own (era semantics). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new NoSuchTableException(ident)
    }
    if (v <= 0 || v > Snapshots.headVersion(SparkSession.active, root))
      throw new NoSuchTableException(ident)
    new SnapshotStreamTable(
      SnapshotSource.surfacedSchema(root, v),
      Map("root" -> root, "version" -> v.toString, "sqlResolved" -> "true"))
  }

  /** SQL time travel by wall clock: ``... TIMESTAMP AS OF '2026-08-15'``.
    * `timestamp` arrives in MICROseconds (the TableCatalog contract);
    * resolution is publish-time ≤ ts, ties to the highest version — the
    * same rule as [[Snapshots.readAsOf]]. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (Snapshots.headVersion(SparkSession.active, root) == 0)
      throw new NoSuchTableException(ident)
    val v = SnapshotSource.versionAsOf(root, timestamp / 1000L)
    new SnapshotStreamTable(
      SnapshotSource.surfacedSchema(root, v),
      Map("root" -> root, "version" -> v.toString, "sqlResolved" -> "true"))
  }

  override def tableExists(ident: Identifier): Boolean =
    try Snapshots.headVersion(SparkSession.active, rootOf(ident)) > 0
    catch { case scala.util.control.NonFatal(_) => false }

  /** SQL DDL: ``CREATE TABLE graft.`/lake/t` (k BIGINT, v STRING)
    * PARTITIONED BY (bucket(8, k))`` — materialized as an EMPTY schema-
    * recording commit (v1), so the table immediately exists for
    * `INSERT INTO` / scans, and a `bucket` transform becomes the engine's
    * hash-clustering spec (every later insert validates against it). CTAS
    * rides the same path: create (v1), then the SELECT lands as the
    * append commit (v2). `TBLPROPERTIES ('clusterSorted'='true')` asks
    * for sorted buckets. */
  private def clusterOf(partitions: Array[Transform]): Option[(Seq[String], Int)] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    if (partitions.isEmpty) return None
    // composite keys (round 15): one single-column bucket transform per
    // key — PARTITIONED BY (bucket(4, tenant), bucket(4, day)) — the only
    // shape Spark's storage-partitioned-join resolution honors. All
    // transforms must agree on the count (the engine's grid is uniform).
    val parsed = partitions.toSeq.map {
      case t if t.name == "bucket" =>
        val refs = t.arguments.toSeq.collect {
          case r: NamedReference => r.fieldNames.mkString(".") }
        val n = t.arguments.collectFirst {
          case l: Literal[_] => l.value.toString.toInt }
        require(refs.length == 1,
          s"bucket(${t.arguments.mkString(", ")}): use ONE column per " +
            "bucket transform — composite keys are expressed as " +
            "PARTITIONED BY (bucket(n, c1), bucket(n, c2)) (Spark's " +
            "storage-partitioned joins only resolve single-column buckets)")
        (refs.head, n.getOrElse(sys.error("bucket transform needs a bucket count")))
      case other => sys.error(
        s"graft tables support PARTITIONED BY (bucket(n, col), ...) only, got $other")
    }
    val counts = parsed.map(_._2).distinct
    require(counts.length == 1,
      s"all bucket transforms must share one count (the grid is uniform), " +
        s"got ${parsed.map { case (c, n) => s"bucket($n, $c)" }.mkString(", ")}")
    Some((parsed.map(_._1), counts.head))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val spark = SparkSession.active
    val root = rootOf(ident)
    if (Snapshots.headVersion(spark, root) > 0)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(name(), root))
    val sorted = Option(properties.get("clusterSorted")).exists(_.toBoolean)
    Snapshots.commit(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema),
      root, append = false, clusterBy = clusterOf(partitions), clusterSorted = sorted)
    loadTable(ident)
  }

  /** ATOMIC CTAS/RTAS staging ([[StagingTableCatalog]]): nothing commits
    * until the SELECT's write job succeeds — the write itself IS the
    * table's v1, so a failed CTAS leaves NO visible table (only
    * unreferenced staging debris under the directory) and re-running it
    * simply works. This replaces the old create-empty-v1-then-insert
    * shape, whose failed SELECT stranded a visible empty table that
    * `dropTable` (then unsupported) could not clear. */
  override def stageCreate(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val spark = SparkSession.active
    val root = rootOf(ident)
    if (Snapshots.headVersion(spark, root) > 0)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(name(), root))
    val cluster = clusterOf(info.partitions())
    val sorted = Option(info.properties().get("clusterSorted")).exists(_.toBoolean)
    val props = Map("root" -> root, "sqlResolved" -> "true") ++
      cluster.map { case (cs, n) => Map(
        "clusterBy" -> cs.mkString(","), "clusterBuckets" -> n.toString,
        "clusterSorted" -> sorted.toString)
      }.getOrElse(Map.empty)
    val schema = info.schema()
    new SnapshotStreamTable(schema, props)
      with org.apache.spark.sql.connector.catalog.StagedTable {
      override def commitStagedChanges(): Unit =
        // the CTAS write commit (one append onto the empty root) already
        // published v1 with the SELECT's rows; a write path that never ran
        // still owes the table's existence — record the schema as v1
        if (Snapshots.headVersion(spark, root) == 0)
          Snapshots.commit(
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
            root, append = false, clusterBy = cluster, clusterSorted = sorted)
      override def abortStagedChanges(): Unit = ()
      // nothing to undo: the only publish happens at successful write
      // completion, and deleting on abort could race a concurrent
      // creator's legitimate v1
    }
  }

  override def stageReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    throw new UnsupportedOperationException(
      "REPLACE TABLE is not supported — DROP TABLE (metadata) then CTAS, " +
        "or use an overwrite write")

  override def stageCreateOrReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    throw new UnsupportedOperationException(
      "CREATE OR REPLACE TABLE is not supported — DROP TABLE (metadata) " +
        "then CTAS, or use an overwrite write")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // tables are paths; there is no enumerable namespace

  /** SQL schema evolution — every supported change is a METADATA-ONLY
    * engine commit (no file is ever rewritten; see the Snapshots column-
    * mapping contract):
    *   - `ALTER TABLE ... RENAME COLUMN a TO b` → [[Snapshots.renameColumn]]
    *   - `ALTER TABLE ... DROP COLUMN a`        → [[Snapshots.dropColumn]]
    *   - `ALTER TABLE ... ADD COLUMNS (c TYPE)` → [[Snapshots.addColumn]]
    *   - `ALTER TABLE ... ALTER COLUMN c TYPE t` → [[Snapshots.widenColumn]]
    *     (value-preserving widenings only; narrowings refuse)
    * Nested fields, column positions (FIRST/AFTER), defaults, and
    * property changes refuse loudly — each would need semantics the
    * engine does not record, and a silently-dropped ALTER is a
    * correctness bug waiting downstream. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import TableChange._
    val spark = SparkSession.active
    val root = rootOf(ident)
    if (Snapshots.headVersion(spark, root) == 0)
      throw new NoSuchTableException(ident)
    def topLevel(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"$what: nested column ${fieldNames.mkString(".")} is not supported " +
          "(snapshot schema evolution is top-level)")
      fieldNames(0)
    }
    changes.foreach {
      case r: RenameColumn =>
        Snapshots.renameColumn(spark, root,
          topLevel(r.fieldNames, "RENAME COLUMN"), r.newName)
      case d: DeleteColumn =>
        val col = topLevel(d.fieldNames, "DROP COLUMN")
        val exists = SnapshotSource.surfacedSchema(root).fieldNames.contains(col)
        if (exists) Snapshots.dropColumn(spark, root, col)
        else if (!Option(d.ifExists).exists(_.booleanValue))
          sys.error(s"no column '$col' in $root")
      case a: AddColumn =>
        val col = topLevel(a.fieldNames, "ADD COLUMNS")
        require(a.isNullable,
          s"ADD COLUMNS $col: added columns must be nullable " +
            "(every existing row reads null for them)")
        require(a.position == null,
          s"ADD COLUMNS $col: FIRST/AFTER positions are not supported " +
            "(new columns append last)")
        require(a.defaultValue == null,
          s"ADD COLUMNS $col: column DEFAULT values are not supported")
        Snapshots.addColumn(spark, root, col, a.dataType)
      case u: UpdateColumnType =>
        // value-preserving widenings only (int→long, float→double, decimal
        // growth) — a metadata-only commit with read-side widening in both
        // readers; anything else still refuses inside widenColumn
        Snapshots.widenColumn(spark, root,
          topLevel(u.fieldNames, "ALTER COLUMN TYPE"), u.newDataType)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change $other — supported: RENAME " +
          "COLUMN, DROP COLUMN, ADD COLUMNS (nullable, no default, " +
          "appended last), ALTER COLUMN TYPE (widening); CHECK " +
          "constraints go through graft.engine.Checks")
    }
    loadTable(ident)
  }

  /** SQL DROP TABLE: removes the table's EXISTENCE — the `_snapshots`
    * manifest chain (commit records, metadata shards, checks) — and never
    * a data file. The directory's parquet bytes become unreferenced
    * debris; reclaim them by deleting the directory (path-addressed data
    * stays the caller's to own). Branches are part of the chain and go
    * with it; a branch-qualified identifier refuses (drop the branch via
    * `CALL graft.system.drop_branch` instead). */
  override def dropTable(ident: Identifier): Boolean = {
    val spark = SparkSession.active
    val root = rootOf(ident)
    require(!root.contains("@ref="),
      s"DROP TABLE on branch '$root' — use CALL graft.system.drop_branch")
    if (Snapshots.headVersion(spark, root) == 0) false
    else { Snapshots.dropMetadata(spark, root); true }
  }

  override def renameTable(old: Identifier, nw: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snapshot tables are path-addressed — move the directory instead")

  // ---- ProcedureCatalog: the engine's admin verbs as SQL CALL targets ----
  // CALL graft.system.history('/lake/t') / compact / compact_clustered /
  // compact_zorder / restore / vacuum / vacuum_orphans / convert /
  // add_check / drop_check — see [[SnapshotProcedures]].

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    SnapshotProcedures.all.getOrElse(ident.name().toLowerCase,
      throw new RuntimeException(
        s"no such procedure '${ident.name()}' — available: " +
          SnapshotProcedures.all.keys.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    SnapshotProcedures.all.keys.toArray.sorted
      .map(n => Identifier.of(Array("system"), n))

  // ---- FunctionCatalog: exactly one function, the clustering transform ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The `bucket(numBuckets, col)` v2 function backing
  * [[SnapshotCatalog]]'s reported table partitioning. Binding validates
  * the key type against [[Snapshots.ClusterableTypes]] — the same gate
  * `commit(clusterBy)` enforces, so a spec the writer produced always
  * binds. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, 42), n) — the graft snapshot " +
      "clustered-write bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket takes (numBuckets INT, key, ...), got $inputType")
    val keyTypes = inputType.fields.drop(1).map(_.dataType).toSeq
    keyTypes.foreach(t => require(Snapshots.ClusterableTypes.contains(t),
      s"bucket key type $t is not hash-clusterable " +
        s"(supported: ${Snapshots.ClusterableTypes.mkString(", ")})"))
    GraftBucketBound(keyTypes)
  }
}

/** Bound form: MUST reproduce the writer's `HashPartitioning` bucket id —
  * `pmod(Murmur3Hash(seed=42)(key), n)` per key type, null hashing to the
  * bare seed, exactly Catalyst's interpreted hash semantics. A divergence
  * here would let the one-side-shuffle SPJ fallback route rows to the
  * wrong storage bucket and silently drop join matches; the agreement is
  * spec-pinned against `functions.hash` + `pmod`. */
case class GraftBucketBound(keyTypes: Seq[DataType])
  extends ScalarFunction[Integer]
  with org.apache.spark.sql.connector.catalog.functions.ReducibleFunction[Integer, Integer] {

  /** MISMATCHED-bucket storage-partitioned joins: when the counts divide
    * (32 vs 16), the coarser grouping is recoverable from the finer ids
    * alone — `pmod(h,32) % 16 == pmod(h,16)` — so Spark (under
    * `spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled`)
    * asks the finer side for a reducer and COALESCES its partitions into
    * the coarser side's key space instead of shuffling either side: a
    * 16-vs-32 clustered join plans with zero exchanges. Non-divisible
    * counts return null (no reduction) and fall back to the one-side
    * shuffle against this same function. */
  override def reducer(
      thisNumBuckets: Int,
      other: org.apache.spark.sql.connector.catalog.functions.ReducibleFunction[_, _],
      otherNumBuckets: Int)
      : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
    other match {
      case _: GraftBucketBound
          if thisNumBuckets > otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0 =>
        new org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
          with Serializable {
          override def reduce(v: Integer): Integer =
            Integer.valueOf(v.intValue % otherNumBuckets)
        }
      case _ => null
    }

  override def inputTypes(): Array[DataType] =
    (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // Catalyst's Murmur3Hash(children, 42) CHAINS: each key hashes with the
    // running hash as its seed, nulls leave it unchanged — reproduced
    // exactly so composite-key specs route rows like the writer did
    var h: Int = 42
    var i = 0
    while (i < keyTypes.length) {
      val ord = i + 1
      if (!input.isNullAt(ord)) {
        h = keyTypes(i) match {
          case IntegerType | DateType =>
            Murmur3_x86_32.hashInt(input.getInt(ord), h)
          case LongType | TimestampType | TimestampNTZType =>
            Murmur3_x86_32.hashLong(input.getLong(ord), h)
          case StringType =>
            val s: UTF8String = input.getUTF8String(ord)
            Murmur3_x86_32.hashUnsafeBytes(
              s.getBaseObject, s.getBaseOffset, s.numBytes(), h)
          case t => sys.error(s"unreachable: unclusterable key type $t")
        }
      }
      i += 1
    }
    val m = h % n
    if (m < 0) m + n else m
  }
}
