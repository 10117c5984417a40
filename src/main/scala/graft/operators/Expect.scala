package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Declarative data-quality expectations — the validation gate in front of
  * a training-data pipeline (schema-level constraints the reference leaves
  * to the warehouse: domain checks, cross-column invariants, freshness).
  *
  * Null semantics: a row whose predicate evaluates to NULL fails the
  * expectation (`when(p, 0).otherwise(1)` — the OTHERWISE branch catches
  * both false and null). An unknown is not a pass; this is also the only
  * convention both engines express identically (`NOT p` would silently
  * drop nulls from the count on either side).
  *
  * Scale shape: [[audit]] is ONE partial+final aggregate over ONE scan —
  * every rule is a conditional sum, so 20 rules cost the same scan as one
  * and the per-executor state is 20 longs (PlanSpec-style two-stage
  * aggregation; merges are associative so task retries are safe).
  * [[annotate]] is a narrow map (no shuffle at all) built from
  * codegen-friendly `concat_ws`/`split` — not array lambdas, which
  * evaluate interpreted per element.
  */
object Expect {

  /** One named expectation over a row. */
  final case class Rule(name: String, predicate: Column) {
    require(name.nonEmpty && !name.contains(","),
      s"rule name '$name' must be non-empty and comma-free (annotate packs names)")
  }

  /** Per-rule violation report: (rule, n_violations, n_rows, viol_rate),
    * one row per rule, from a single aggregate pass over `df`. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => sum(when(r.predicate, 0).otherwise(1)).as(s"v_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.map(r =>
      struct(lit(r.name).as("rule"), col(s"v_${r.name}").as("n_violations")))
    one.select(explode(array(pairs: _*)).as("e"), col("n_rows"))
      .select(col("e.rule").as("rule"), col("e.n_violations").as("n_violations"),
        col("n_rows"),
        (col("e.n_violations").cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("viol_rate"))
  }

  /** The input plus `_failed`: the names of the rules each row fails
    * (empty array = clean row). Pure per-row projection — composes with
    * any downstream filter without a shuffle. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val packed = concat_ws(",",
      rules.map(r => when(r.predicate, lit(null).cast("string"))
        .otherwise(lit(r.name))): _*)
    df.withColumn("_failed",
      when(packed === "", array().cast("array<string>"))
        .otherwise(split(packed, ",")))
  }

  /** Referential expectation — every `child.childKey` must exist in
    * `parent.parentKey` (the FK check DDL can't enforce on a lake). One
    * LEFT JOIN marks presence, then the standard [[audit]] counts the
    * misses (a NULL marker IS the violation, via the null-fails
    * convention). Parent keys deduplicate first so fan-out cannot inflate
    * the row count; at scale the distinct key relation broadcasts when
    * small and otherwise shuffles both sides once on the key. */
  def refAudit(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val marked = child.join(
      parent.select(col(parentKey).as(childKey)).distinct()
        .withColumn("__present", lit(true)),
      Seq(childKey), "left")
    audit(marked, Seq(Rule(name, col("__present"))))
  }

  /** (clean, quarantined) split: a row quarantines when ANY rule fails;
    * quarantined rows keep their `_failed` names for triage. Two filters
    * over the same annotated projection — persist the annotated frame
    * first if both sides feed further stages. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(size(col("_failed")) === 0).drop("_failed"),
      a.filter(size(col("_failed")) > 0))
  }
}
