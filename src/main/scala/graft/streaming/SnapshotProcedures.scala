package graft.streaming

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{Checks, Snapshots}

/** SQL `CALL` procedures — the ADMIN verbs of the engine, exposed so a
  * table's whole lifecycle is drivable from SQL:
  * {{{
  *   CALL graft.system.history('/lake/t')
  *   CALL graft.system.compact('/lake/t', target_files => 4)
  *   CALL graft.system.restore('/lake/t', 3)
  *   CALL graft.system.vacuum('/lake/t', keep_last => 5)
  *   CALL graft.system.add_check('/lake/t', 'score_pos', 'score >= 0')
  * }}}
  * Each call routes to the corresponding [[Snapshots]] / [[Checks]] verb
  * and returns its outcome as a one-result LocalScan (history returns
  * one row per retained version). Maintenance verbs never delete data a
  * retained version references — retention policy stays with vacuum. */
private[streaming] object SnapshotProcedures {

  private def spark: SparkSession = SparkSession.active

  private def str(r: InternalRow, i: Int): String = {
    require(!r.isNullAt(i), s"procedure argument $i must not be null")
    r.getUTF8String(i).toString
  }
  private def csv(r: InternalRow, i: Int): Seq[String] =
    if (r.isNullAt(i)) Seq.empty
    else r.getUTF8String(i).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** One declarative row per procedure: (params, result schema, body). */
  private[streaming] final case class Proc(
      procName: String,
      procDescription: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      body: InternalRow => Seq[InternalRow])
    extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = procDescription

    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // admin verbs mutate state

    override def call(input: InternalRow): JIterator[Scan] = {
      val result = body(input).toArray
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
        override def description(): String = s"graft-procedure-$procName"
      }).iterator()
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private val VersionOut = StructType(Seq(StructField("version", LongType, false)))
  private def versionRow(v: Long): Seq[InternalRow] =
    Seq(new GenericInternalRow(Array[Any](v)))
  private val OkOut = StructType(Seq(StructField("done", BooleanType, false)))
  private val OkRow = Seq(new GenericInternalRow(Array[Any](true)))

  private[streaming] val all: Map[String, Proc] = Seq(
    Proc("history",
      "one row per retained version, oldest first (DESCRIBE HISTORY)",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("version", LongType, false),
        StructField("parent", LongType, false),
        StructField("committed_at", TimestampType, true),
        StructField("tag", StringType, true),
        StructField("shards", IntegerType, false),
        StructField("files", LongType, false),
        StructField("clustering", StringType, true))),
      { r =>
        Snapshots.historyMeta(spark, str(r, 0)).map { m =>
          new GenericInternalRow(Array[Any](
            m.version, m.parent,
            if (m.ts == 0L) null else m.ts * 1000L,
            if (m.tag.isEmpty) null else utf8(m.tag),
            m.shardRefs.size,
            m.shardRefs.map(_.n).sum,
            m.clustering.map(c => utf8(
              s"bucket(${c.buckets}, ${c.cols.mkString(", ")})${if (c.sorted) " sorted" else ""}"))
              .orNull))
        }
      }),

    Proc("compact",
      "rewrite the head's files into target_files (stats/blooms re-collected)",
      Seq(in("table", StringType),
        inDefault("target_files", IntegerType, "1"),
        inDefault("stats_cols", StringType, "''"),
        inDefault("bloom_cols", StringType, "''")),
      VersionOut,
      r => versionRow(Snapshots.compact(spark, str(r, 0), r.getInt(1),
        csv(r, 2), csv(r, 3)))),

    Proc("reindex",
      "ANALYZE: heal per-file stats/blooms (scan ∝ decay; force => full rebuild), metadata-only commit",
      Seq(in("table", StringType),
        inDefault("stats_cols", StringType, "''"),
        inDefault("bloom_cols", StringType, "''"),
        inDefault("force", BooleanType, "false")),
      VersionOut,
      r => versionRow(Snapshots.reindexStats(spark, str(r, 0),
        csv(r, 1), csv(r, 2), force = !r.isNullAt(3) && r.getBoolean(3)))),

    Proc("compact_clustered",
      "bucket-preserving small-file folding; republishes the clustering spec",
      Seq(in("table", StringType),
        inDefault("stats_cols", StringType, "''"),
        inDefault("bloom_cols", StringType, "''")),
      VersionOut,
      r => versionRow(Snapshots.compactClustered(spark, str(r, 0),
        csv(r, 1), csv(r, 2)))),

    Proc("compact_where",
      "compact only the files the predicate's stats/bloom mining touches",
      Seq(in("table", StringType), in("cond", StringType),
        inDefault("target_files", IntegerType, "1"),
        inDefault("stats_cols", StringType, "''")),
      VersionOut,
      r => versionRow(Snapshots.compactWhere(spark, str(r, 0),
        org.apache.spark.sql.functions.expr(str(r, 1)), r.getInt(2),
        csv(r, 3)))),

    Proc("compact_zorder",
      "rewrite along the Morton curve of dims (csv); re-collects their stats",
      Seq(in("table", StringType), in("dims", StringType),
        inDefault("target_files", IntegerType, "8")),
      VersionOut,
      r => versionRow(Snapshots.compactZOrder(spark, str(r, 0), csv(r, 1),
        r.getInt(2), statsCols = csv(r, 1)))),

    Proc("restore",
      "roll the table back to `version` AS HISTORY (a new commit; auditable)",
      Seq(in("table", StringType), in("version", LongType)),
      VersionOut,
      r => versionRow(Snapshots.restore(spark, str(r, 0), r.getLong(1)))),

    Proc("vacuum",
      "delete data files only unreachable from the newest keep_last versions",
      Seq(in("table", StringType), inDefault("keep_last", IntegerType, "1")),
      OkOut,
      { r => Snapshots.vacuum(spark, str(r, 0), r.getInt(1)); OkRow }),

    Proc("vacuum_orphans",
      "sweep files of aborted (never-published) commits older than grace_ms",
      Seq(in("table", StringType),
        inDefault("grace_ms", LongType, "3600000")),
      StructType(Seq(StructField("removed", IntegerType, false))),
      r => Seq(new GenericInternalRow(Array[Any](
        Snapshots.vacuumOrphans(spark, str(r, 0), r.getLong(1)))))),

    Proc("convert",
      "adopt an existing plain-parquet directory as snapshot v1, zero-copy",
      Seq(in("table", StringType),
        inDefault("stats_cols", StringType, "''"),
        inDefault("bloom_cols", StringType, "''")),
      VersionOut,
      r => versionRow(Snapshots.convertInPlace(spark, str(r, 0),
        csv(r, 1), csv(r, 2)))),

    Proc("table_stats",
      "one row per data file of `version` (default head): rows, vectored " +
        "deletes, byte-range-splittable flag — DESCRIBE DETAIL at file grain",
      Seq(in("table", StringType), inDefault("version", LongType, "-1")),
      StructType(Seq(
        StructField("file", StringType, false),
        StructField("rows", LongType, true),
        StructField("deleted", LongType, false),
        StructField("indexed_cols", StringType, true))),
      { r =>
        val root = str(r, 0)
        val v0 = r.getLong(1)
        val v = if (v0 > 0) v0 else Snapshots.headVersion(spark, root)
        val m = Snapshots.manifest(spark, root, v)
        val rows = m.rows.map(x => x.file -> x.n).toMap
        val dvs = m.dvs.map(d => d.file -> d.deleted).toMap
        val cols = (m.stats.map(s => s.file -> s.col) ++
          m.blooms.map(b => b.file -> b.col))
          .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).distinct.sorted }
        m.files.sorted.map { u =>
          val base = new org.apache.hadoop.fs.Path(u).getName
          new GenericInternalRow(Array[Any](
            utf8(base),
            rows.get(base).filter(_ >= 0L).map(Long.box).orNull,
            dvs.getOrElse(base, 0L),
            cols.get(base).map(cs => utf8(cs.mkString(","))).orNull))
        }
      }),

    Proc("create_branch",
      "zero-copy fork of the table (at `version`, default head) as a WAP " +
        "branch — address it as graft.`<table>@ref=<name>` for reads/writes",
      Seq(in("table", StringType), in("name", StringType),
        inDefault("version", LongType, "-1")),
      VersionOut,
      r => versionRow(graft.engine.Branches.fork(spark, str(r, 0), str(r, 1),
        r.getLong(2)))),

    Proc("publish_branch",
      "atomically fast-forward main to the branch head; rebase => true " +
        "auto-rebases append-only branches onto an advanced main first",
      Seq(in("table", StringType), in("name", StringType),
        inDefault("rebase", BooleanType, "true")),
      VersionOut,
      r => versionRow(
        if (r.getBoolean(2))
          graft.engine.Branches.publishRebase(spark, str(r, 0), str(r, 1))
        else graft.engine.Branches.publish(spark, str(r, 0), str(r, 1)))),

    Proc("drop_branch",
      "delete a branch's manifests (reference-safe: shared data stays)",
      Seq(in("table", StringType), in("name", StringType)),
      OkOut,
      { r => graft.engine.Branches.drop(spark, str(r, 0), str(r, 1)); OkRow }),

    Proc("list_branches",
      "one row per live branch of the table",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("branch", StringType, false))),
      r => graft.engine.Branches.list(spark, str(r, 0)).sorted
        .map(n => new GenericInternalRow(Array[Any](utf8(n))))),

    Proc("add_check",
      "add a table CHECK constraint (validates existing data first)",
      Seq(in("table", StringType), in("name", StringType), in("expr", StringType)),
      OkOut,
      { r => Checks.add(spark, str(r, 0), str(r, 1), str(r, 2)); OkRow }),

    Proc("drop_check",
      "drop a table CHECK constraint by name",
      Seq(in("table", StringType), in("name", StringType)),
      OkOut,
      { r => Checks.drop(spark, str(r, 0), str(r, 1)); OkRow })
  ).map(p => p.procName -> p).toMap
}
