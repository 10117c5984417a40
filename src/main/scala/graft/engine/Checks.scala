package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted table-level CHECK constraints over [[Snapshots]] tables — the
  * lakehouse-native form of the warehouse DDL constraints the reference
  * declares at CREATE TABLE time (NOT NULL / sort-key hygiene,
  * pandas_aws/redshift.py:193-247): a rule attached to the TABLE, not to
  * any one writer, enforced on every path that writes rows — commit, merge,
  * MERGE INTO, copy-on-write delete rewrites, compaction, and every
  * streaming sink riding them.
  *
  * Semantics follow SQL CHECK: a row passes when the predicate is TRUE or
  * NULL; only FALSE is a violation (so `col("x") >= 0` admits null x, and
  * NOT NULL is spelled `col("x").isNotNull`).
  *
  * Enforcement is ZERO extra passes: [[Snapshots]] attaches the rules as
  * `Observation` metrics on the batch being written, so violation counts
  * ride the write job itself — no second scan of the batch, at any batch
  * size. A violating batch aborts BEFORE the manifest publishes: the staged
  * data directory is deleted and nothing becomes visible (the same
  * invisible-abort contract every snapshot write has), so readers never see
  * a half-admitted batch and a retry after fixing the data is a plain
  * re-run.
  *
  * `add` validates EXISTING data first (one pruned head scan) and refuses
  * if any current row violates the rule — the Delta/Iceberg contract that
  * makes "all committed rows satisfy all checks" an invariant rather than a
  * hope. Rules persist as `_snapshots/checks-<n>.json` generations, each a
  * full rule list published create-if-absent through the store's
  * [[CommitArbiter]] — concurrent adds race safely (the loser re-reads and
  * republishes), and crash-interrupted updates leave the prior generation
  * intact. Rules are stored as SQL expression text (re-parsed per write),
  * so they survive sessions and travel with the table directory; branches
  * of the table share them (the rule set is table policy, like
  * [[MaintenancePolicy]] — a WAP staging branch is checked at write time,
  * before its publish-time audit even runs).
  */
object Checks {

  /** One named constraint; `exprSql` is the predicate's SQL text. */
  final case class Rule(name: String, exprSql: String) {
    def cond: Column = expr(exprSql)
  }

  private val FileRe = "checks-(\\d+)\\.json".r

  private def checksDir(root: String) = s"${Snapshots.dataRoot(root)}/_snapshots"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(Snapshots.dataRoot(root))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (latest generation number, its rules) — (0, empty) when none. */
  private def latest(spark: SparkSession, root: String): (Long, Seq[Rule]) = {
    val f = fsOf(spark, root)
    val dir = new Path(checksDir(root))
    if (!f.exists(dir)) return (0L, Seq.empty)
    val n = f.listStatus(dir).toSeq
      .flatMap(st => FileRe.findFirstMatchIn(st.getPath.getName).map(_.group(1).toLong))
      .maxOption.getOrElse(0L)
    if (n == 0) (0L, Seq.empty)
    else (n, parseRules(Snapshots.readText(spark, root,
      new Path(s"${checksDir(root)}/checks-$n.json"))))
  }

  /** The table's current rule set (empty when unconstrained). */
  def list(spark: SparkSession, root: String): Seq[Rule] =
    latest(spark, root)._2

  /** Attach a named CHECK, its predicate as SQL text (the DDL shape:
    * `CHECK (quality >= 0)` travels as `"quality >= 0"`). Validates
    * existing data first: if any current row of the table violates the
    * predicate, the add refuses and nothing changes — after a successful
    * add, every committed row (past and future) satisfies every listed
    * rule. */
  def add(spark: SparkSession, root: String, name: String, condSql: String): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"check name '$name' must match [A-Za-z0-9._-]+")
    val cond = expr(condSql) // must parse, or every write would fail
    if (Snapshots.headVersion(spark, root) > 0) {
      val bad = Snapshots.read(spark, root).filter(!coalesce(cond, lit(true)))
      require(bad.isEmpty,
        s"cannot add check '$name' at $root: existing rows violate it")
    }
    publishRules(spark, root, { rules =>
      require(!rules.exists(_.name == name),
        s"check '$name' already exists at $root")
      rules :+ Rule(name, condSql)
    })
  }

  /** Remove a named CHECK (future writes stop enforcing it). */
  def drop(spark: SparkSession, root: String, name: String): Unit =
    publishRules(spark, root, { rules =>
      require(rules.exists(_.name == name), s"no check '$name' at $root")
      rules.filterNot(_.name == name)
    })

  /** Column names a rule set references — the guard rename/drop schema
    * evolution consults (a rename would orphan the rule's text). */
  private[engine] def referenced(
      spark: SparkSession, rules: Seq[Rule]): Set[String] =
    rules.flatMap(r =>
      spark.sessionState.sqlParser.parseExpression(r.exprSql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last
      }).toSet

  /** Per-rule violation-count metrics for the write-path observation:
    * rows where the predicate is strictly FALSE (null passes, per SQL). */
  private[engine] def violationCounts(rules: Seq[Rule]): Seq[Column] =
    rules.map(r => count_if(!coalesce(r.cond, lit(true))).as(r.name))

  /** Optimistic create-if-absent publish of the next rules generation. */
  private def publishRules(
      spark: SparkSession, root: String, f: Seq[Rule] => Seq[Rule]): Unit = {
    val fsys = fsOf(spark, root)
    var done = false
    while (!done) {
      val (n, cur) = latest(spark, root)
      val next = f(cur)
      fsys.mkdirs(new Path(checksDir(root)))
      val tmp = new Path(s"${checksDir(root)}/.tmp-${java.util.UUID.randomUUID()}")
      val out = fsys.create(tmp, /*overwrite=*/ true)
      try out.write(render(next).getBytes("UTF-8")) finally out.close()
      val target = new Path(s"${checksDir(root)}/checks-${n + 1}.json")
      done = try Snapshots.atomicNoReplace(fsys, tmp, target)
        finally fsys.delete(tmp, false)
      // lost the race: another writer published n+1 — re-read, re-apply
    }
  }

  private def render(rules: Seq[Rule]): String =
    rules.map(r =>
      s"""{"name":${graft.JsonStr(r.name)},"expr":${graft.JsonStr(r.exprSql)}}""")
      .mkString("[", ",", "]")

  private def parseRules(text: String): Seq[Rule] = {
    val str = """"([^"\\]*(?:\\.[^"\\]*)*)""""
    (s"""\\{"name":$str,"expr":$str\\}""").r.findAllMatchIn(text)
      .map(m => Rule(Snapshots.unescape(m.group(1)), Snapshots.unescape(m.group(2))))
      .toSeq
  }
}
