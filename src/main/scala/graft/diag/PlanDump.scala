package graft.diag

import graft._
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Diagnostic main: write `.explain("formatted")` for every declared query
  * to a directory (optimization-round evidence, plans/rNN/<q>_<tag>.txt).
  *
  * Mirrors Bench's session config so the captured plan is the benched plan.
  * Building a DataFrame runs the closure's in-query table builds (lake
  * queries commit their own roots) but never executes the final query.
  *
  *   SPARK_GRAFT_SF_DIR   data dir        (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     local cores     (default 4)
  *   SPARK_GRAFT_ONLY     subset q names  (default all)
  *   SPARK_GRAFT_PLAN_DIR output dir      (default plans/tmp)
  *   SPARK_GRAFT_PLAN_TAG filename suffix (default none)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/tmp"))
    val tag = sys.env.get("SPARK_GRAFT_PLAN_TAG").map("_" + _).getOrElse("")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val text =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case NonFatal(e) =>
            s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}"
          }
        java.nio.file.Files.writeString(outDir.resolve(s"$name$tag.txt"), text)
        spark.catalog.clearCache()
        println(s"[plandump] $name")
      }
    spark.stop()
  }
}
