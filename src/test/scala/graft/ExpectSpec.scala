package graft

import org.apache.spark.sql.functions._

import graft.operators.Expect
import graft.operators.Expect.Rule

/** Expectation operator: counts, null-fails semantics, annotate/quarantine
  * split, and the one-scan two-stage aggregation shape.
  */
class ExpectSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10), "ok"),
    (2L, Some(200), "ok"),   // fails cap
    (3L, None, "ok"),        // null value → fails cap
    (4L, Some(20), "bad"),   // fails domain
    (5L, Some(300), "bad")   // fails both
  ).toDF("id", "v", "s")

  private val rules = Seq(
    Rule("v_cap", col("v") <= 100),
    Rule("s_domain", col("s") === "ok"))

  test("audit counts violations per rule in one pass; NULL predicate fails") {
    val got = Expect.audit(df, rules)
      .select("rule", "n_violations", "n_rows", "viol_rate")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("v_cap", 3L, 5L, 0.6),      // 200, null, 300
      ("s_domain", 2L, 5L, 0.4)))  // ids 4, 5
  }

  test("annotate names each row's failed rules; quarantine splits losslessly") {
    val a = Expect.annotate(df, rules)
      .select($"id", $"_failed")
      .as[(Long, Seq[String])].collect().toMap
    assert(a(1L) === Seq.empty)
    assert(a(2L) === Seq("v_cap"))
    assert(a(3L) === Seq("v_cap"))
    assert(a(4L) === Seq("s_domain"))
    assert(a(5L) === Seq("v_cap", "s_domain"))

    val (clean, bad) = Expect.quarantine(df, rules)
    assert(clean.select("id").as[Long].collect().toSet === Set(1L))
    assert(bad.select("id").as[Long].collect().toSet === Set(2L, 3L, 4L, 5L))
    assert(clean.columns.toSeq === df.columns.toSeq, "clean side keeps the input schema")
    assert(clean.count() + bad.count() === df.count())
  }

  test("refAudit counts orphaned child keys; parent duplicates cannot inflate counts") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 99L)).toDF("id", "fk")
    val parent = Seq(10L, 10L, 20L, 30L).toDF("pk") // 10 twice: dedup matters
    val got = Expect.refAudit("fk_exists", child, "fk", parent, "pk")
      .select("rule", "n_violations", "n_rows", "viol_rate")
      .as[(String, Long, Long, Double)].head()
    assert(got === (("fk_exists", 1L, 4L, 0.25))) // only id=4 (fk=99) orphaned
  }

  test("audit is one scan with partial+final aggregation, rule count notwithstanding") {
    val many = (1 to 20).map(i => Rule(s"r$i", col("v") <= i * 10))
    val p = Expect.audit(df, many).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
    assert("LocalTableScan".r.findAllIn(p).length === 1, "more than one scan of the input")
  }
}
