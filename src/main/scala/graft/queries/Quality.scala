package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Expect

/** Data-quality expectation audit (`operators.Expect`) — the validation
  * gate a pipeline runs before training data (or a warehouse load) is
  * accepted. The reference delegates constraint checking to Redshift DDL
  * (pandas_aws/redshift.py:79-175 builds the schema, the engine enforces
  * it); here the expectations are first-class and run as ONE aggregate
  * pass over one scan regardless of rule count.
  */
object Quality {

  val queries: Seq[OracleQuery] = Seq(
    // ---- q84: expectation audit over lineitem — domain rules that fire
    //           (quantity cap, discount cap, tax cap) next to rules that
    //           hold (flag domain, positive price), all counted in a
    //           single conditional-sum aggregate; NULL predicate = fail on
    //           both engines (CASE WHEN p THEN 0 ELSE 1). ----
    OracleQuery(
      "q84_expectation_audit",
      """WITH a AS (SELECT COUNT(*) AS n_rows,
        |  SUM(CASE WHEN l_discount <= 0.05 THEN 0 ELSE 1 END) AS v_discount_le_5pct,
        |  SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS v_positive_price,
        |  SUM(CASE WHEN l_quantity <= 30 THEN 0 ELSE 1 END) AS v_qty_le_30,
        |  SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS v_returnflag_domain,
        |  SUM(CASE WHEN l_tax <= 0.06 THEN 0 ELSE 1 END) AS v_tax_le_6pct
        |  FROM lineitem),
        |u AS (
        |  SELECT 'discount_le_5pct' AS rule, v_discount_le_5pct AS v, n_rows FROM a
        |  UNION ALL SELECT 'positive_price', v_positive_price, n_rows FROM a
        |  UNION ALL SELECT 'qty_le_30', v_qty_le_30, n_rows FROM a
        |  UNION ALL SELECT 'returnflag_domain', v_returnflag_domain, n_rows FROM a
        |  UNION ALL SELECT 'tax_le_6pct', v_tax_le_6pct, n_rows FROM a)
        |SELECT rule, CAST(v AS BIGINT) AS n_violations, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(v AS DOUBLE) / CAST(n_rows AS DOUBLE) AS viol_rate
        |FROM u ORDER BY rule""".stripMargin) { (spark, dir) =>
      Expect.audit(
        Tables(spark, dir, "lineitem"),
        Seq(
          Expect.Rule("discount_le_5pct", col("l_discount") <= 0.05),
          Expect.Rule("positive_price", col("l_extendedprice") > 0),
          Expect.Rule("qty_le_30", col("l_quantity") <= 30),
          Expect.Rule("returnflag_domain", col("l_returnflag").isin("A", "N", "R")),
          Expect.Rule("tax_le_6pct", col("l_tax") <= 0.06)))
        .orderBy("rule")
    },

    // ---- q86: referential expectation — after a right-to-erasure pass
    //           removes a customer segment (the q83 theme), every event
    //           must still reference a surviving customer; the orphan
    //           count is the signal that downstream tables need the same
    //           erasure. One LEFT JOIN presence-mark + the q84
    //           conditional-sum audit (NULL marker = violation on both
    //           engines). ----
    OracleQuery(
      "q86_referential_audit",
      """WITH parent AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0)
        |SELECT 'event_user_exists' AS rule,
        |  CAST(SUM(CASE WHEN p.c_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN p.c_custkey IS NOT NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS viol_rate
        |FROM events e LEFT JOIN parent p ON p.c_custkey = e.user_id""".stripMargin) { (spark, dir) =>
      Expect.refAudit(
        "event_user_exists",
        Tables(spark, dir, "events"), "user_id",
        Tables(spark, dir, "customer")
          .filter(col("c_custkey") % 97 =!= 0), "c_custkey")
    },
  )
}
