package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.engine.Snapshots

/** STRING file statistics (ColStats slo/shi, round 15) and the pruning
  * they fund: prefix (`LIKE 'p%'`), string comparisons, and equality
  * bands over the manifest index — the file-level complement of the
  * per-file Bloom equality index and the row-group prefix pushdown. */
class PrefixPruneSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  private def tmp(p: String): String =
    "file:" + Files.createTempDirectory(p).toString + "/t"

  /** keys "a000".."j499" (letter block per 500), range-laid-out. */
  private def seed(root: String, buckets: Int = 5): Snapshots.Manifest = {
    val df = (0 until 5000).map { i =>
      (f"${('a' + i / 500).toChar}${i % 500}%03d", i.toLong)
    }.toDF("k", "v")
    Snapshots.commit(df.repartitionByRange(buckets, col("k")).sortWithinPartitions("k"),
      root, statsCols = Seq("k"))
    Snapshots.manifest(spark, root, 1L)
  }

  test("string statsCols record slo/shi bounds that round-trip the shard json") {
    val root = tmp("ppx")
    val m = seed(root)
    val entries = m.stats.filter(_.col == "k")
    assert(entries.nonEmpty)
    assert(entries.forall(s => s.slo != null && s.shi != null && s.slo <= s.shi))
    assert(m.files.forall(f => entries.exists(_.file == new Path(f).getName)),
      "every file must carry string bounds")
    // numeric placeholder never leaks into the numeric index
    assert(Snapshots.candidateFiles(m, "k", 0.0, 0.0) === m.files,
      "a numeric probe on a string column must not prune")
    assert(Snapshots.statsRange(spark, root, "k") === None,
      "the numeric range API must answer None for a string column")
  }

  test("prefix band prunes files; result equals the unpruned filter") {
    val root = tmp("ppb")
    val m = seed(root)
    val band = Snapshots.candidateFilesForStringBand(m, "k", "c",
      graft.engine.RowGroupFilters.nextPrefix("c"))
    assert(band.nonEmpty && band.size < m.files.size,
      s"prefix band must prune (${band.size} of ${m.files.size})")
    // DSv2: LIKE 'c%' plans fewer partitions than files and stays exact
    val q = spark.read.format(Fmt).option("root", root).load()
      .filter(col("k").startsWith("c"))
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum
    assert(planned > 0 && planned < m.files.size,
      s"LIKE 'c%' must prune files at planning ($planned of ${m.files.size})")
    val got = q.as[(String, Long)].collect().toSet
    val expected = (0 until 5000)
      .map(i => (f"${('a' + i / 500).toChar}${i % 500}%03d", i.toLong))
      .filter(_._1.startsWith("c")).toSet
    assert(got === expected)
  }

  test("string comparisons and equality prune through the bounds (no blooms)") {
    val root = tmp("ppc")
    val m = seed(root)
    assert(m.blooms.isEmpty, "this table records no blooms — bounds do the work")
    // equality: the point lives in exactly one range file
    val eq = spark.read.format(Fmt).option("root", root).load()
      .filter(col("k") === "e250")
    val eqPlanned = eq.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum
    assert(eqPlanned >= 1 && eqPlanned < m.files.size,
      s"string equality must prune via bounds ($eqPlanned of ${m.files.size})")
    assert(eq.count() === 1L)
    // ordered comparison: k >= 'i' keeps the tail file(s) only
    val ge = spark.read.format(Fmt).option("root", root).load()
      .filter(col("k") >= "i")
    val gePlanned = ge.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum
    assert(gePlanned < m.files.size,
      s"k >= 'i' must prune leading files ($gePlanned of ${m.files.size})")
    assert(ge.count() === 1000L) // 'i*' and 'j*' keys
  }

  test("bounds survive exotic characters (escapes, unicode) through the json") {
    val root = tmp("ppe")
    val weird = Seq("a\"quote", "b\\slash", "c\nnewline", "d\ttab",
      "eéaccent", "f中文", "g]bracket")
    Snapshots.commit(weird.zipWithIndex.toDF("k", "v").coalesce(1), root,
      statsCols = Seq("k"))
    val m = Snapshots.manifest(spark, root, 1L)
    val e = m.stats.find(_.col == "k").get
    assert(e.slo === "a\"quote" && e.shi === "g]bracket")
    // a reparse of the shard text (fresh manifest read) sees the same bounds
    val again = Snapshots.manifest(spark, root, 1L).stats.find(_.col == "k").get
    assert(again.slo === e.slo && again.shi === e.shi)
  }

  test("pre-round-15 consumers: files without string bounds stay conservative") {
    val root = tmp("ppo")
    // commit WITHOUT statsCols: no bounds recorded anywhere
    Snapshots.commit((0 until 100).map(i => (f"k$i%03d", i)).toDF("k", "v"), root)
    val m = Snapshots.manifest(spark, root, 1L)
    assert(Snapshots.candidateFilesForStringBand(m, "k", "zzz", None) === m.files,
      "no recorded bounds = every file stays a candidate")
  }
}
