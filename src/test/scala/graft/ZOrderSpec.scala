package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.ZOrder

/** Z-order clustering: the row set must be unchanged (layout-only op), and
  * the layout must deliver its point — rows matching a selective predicate
  * on EITHER clustered dimension concentrate in a small fraction of the
  * files, where an insertion-ordered layout spreads them over all of them
  * (file-level min/max stats can then skip the rest at scale).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // a 128×128 grid, insertion-ordered by row id: x cycles fast, y slow —
  // an x-filter touches EVERY id-range file, the worst case z-order fixes
  private def grid = spark.range(0, 128L * 128L)
    .select((col("id") % 128).cast("int").as("x"),
      (col("id") / 128).cast("int").as("y"),
      col("id"))

  private def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(dir).filter(pred)
      .select(input_file_name()).distinct().count()

  test("clustering preserves the row set exactly") {
    val before = grid.collect().toSet
    val after = ZOrder.cluster(grid, Seq("x", "y"), files = 16).collect().toSet
    assert(after == before)
  }

  test("matching rows concentrate in few files on BOTH dimensions") {
    val base = Files.createTempDirectory("zorder").toString
    grid.repartitionByRange(16, col("id"))
      .write.parquet(s"$base/linear")
    ZOrder.cluster(grid, Seq("x", "y"), files = 16)
      .write.parquet(s"$base/zorder")

    // a 16-wide band = 1/8 of either dimension
    for ((name, pred) <- Seq(
        ("x", col("x").between(32, 47)), ("y", col("y").between(32, 47)))) {
      val z = filesTouched(s"$base/zorder", pred)
      assert(z <= 8, s"$name-band hit $z of 16 z-ordered files")
    }
    // the insertion order only localizes y (it is the slow axis); x spreads
    // over (practically) every file — that asymmetry is what z-order
    // removes (>= 15, not == 16: sampled range boundaries can drop a file)
    assert(filesTouched(s"$base/linear", col("x").between(32, 47)) >= 15)
    // and z-order keeps single-dimension locality competitive: the x-band
    // files it touches are a strict subset of the linear layout's
    assert(filesTouched(s"$base/zorder", col("x").between(32, 47)) < 16)
  }

  test("a constant dimension degrades to the remaining dimensions' curve") {
    val flat = grid.withColumn("x", lit(7))
    val out = ZOrder.cluster(flat, Seq("x", "y"), files = 4)
    assert(out.count() == 128L * 128L)
  }

  test("empty input passes through (no stats to scale by)") {
    val empty = grid.filter(col("x") < 0)
    assert(ZOrder.cluster(empty, Seq("x", "y"), files = 4).isEmpty)
  }

  test("partitionKeys × zorderKeys compose: directory pruning AND file skipping") {
    // 3 tenants × a 64×64 grid each, insertion-ordered worst case; the
    // composed layout must prune at BOTH levels: the tenant predicate at
    // plan time (PartitionFilters — whole directories never listed into
    // the scan) and the 2-dim band at file level (narrow min/max footers
    // inside each directory)
    val rows = spark.range(0, 3L * 64 * 64)
      .select(concat(lit("t"), (col("id") % 3)).as("tenant"),
        ((col("id") / 3) % 64).cast("int").as("x"),
        ((col("id") / 3) / 64).cast("int").as("y"),
        col("id"))
    val uri = s"file:${Files.createTempDirectory("zpart")}/lake"
    graft.engine.S3Like.putDf(rows, uri, format = "parquet",
      parts = 12, partitionKeys = Seq("tenant"), zorderKeys = Seq("x", "y"))
    val back = spark.read.parquet(uri)
    assert(back.select("tenant", "x", "y", "id").collect().toSet ==
      rows.collect().toSet, "composed layout changed the row set")

    // level 1: the tenant predicate prunes directories in the PLAN
    val pruned = back.filter(col("tenant") === "t1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tenant".r.findFirstIn(plan).isDefined,
      "tenant predicate did not land in PartitionFilters")

    // level 2: inside the surviving directory, a band on EITHER dimension
    // touches a minority of its files (~4 of 12 land per tenant; the
    // insertion order would spread an x-band over every one of them)
    val dirFiles = pruned.select(input_file_name()).distinct().count()
    assert(dirFiles >= 2, s"degenerate layout: $dirFiles files for tenant t1")
    for ((name, pred) <- Seq(
        ("x", col("x").between(16, 23)), ("y", col("y").between(16, 23)))) {
      val touched = pruned.filter(pred).select(input_file_name()).distinct().count()
      assert(touched < dirFiles,
        s"$name-band touched all $dirFiles files of the tenant directory")
    }
  }

  test("putDf(zorderKeys) writes the clustered layout: parts files, same rows") {
    val uri = s"file:${Files.createTempDirectory("zput")}/grid"
    graft.engine.S3Like.putDf(grid, uri, format = "parquet",
      parts = 8, zorderKeys = Seq("x", "y"))
    val back = spark.read.parquet(uri)
    // range boundaries come from RangePartitioner's SAMPLE (seeded off rdd
    // ids, which shift with session history), so the split can jitter: a
    // duplicated boundary drops a file, a shifted one leaks a band into an
    // extra file — assert the layout property with that slack, not an
    // exact placement this operator never promised
    val nFiles = back.select(input_file_name()).distinct().count()
    assert(nFiles >= 6 && nFiles <= 8, s"expected ~8 clustered files, got $nFiles")
    assert(back.collect().toSet == grid.collect().toSet)
    // a band on the FAST insertion axis still lands in few of the files
    // (an id-ordered layout puts every x in every file)
    assert(back.filter(col("x").between(32, 47))
      .select(input_file_name()).distinct().count() <= 5)
  }
}
