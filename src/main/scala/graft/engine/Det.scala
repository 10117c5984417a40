package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-arithmetic helpers for oracle-checked queries.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation order
  * differs run-to-run and from DuckDB's — so a naive `sum(double)` can never
  * hash-match an oracle. Instead: cast the (2-decimal) source values to
  * DECIMAL(18,2), aggregate exactly (decimal arithmetic is associative and
  * engine-independent), and cast the final exact value back to double. The
  * result is bit-identical in any engine and any partitioning — which is also
  * the property that makes these aggregates safe at 1000-executor scale
  * (no nondeterministic retries/results under task re-execution).
  */
object Det {
  /** Exact 2-decimal view of a monetary/measure column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent, engine-exact sum of a 2-decimal column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact average: exact decimal sum cast to double, IEEE-divided by count.
    * (Both engines do double/bigint → double with identical operands.) */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** lineitem revenue: l_extendedprice * (1 - l_discount), exact decimals. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1) - dec(discount))

  /** SQL fragments mirroring the above, for DuckDB oracle text. */
  object sql {
    def dec(c: String): String = s"CAST($c AS DECIMAL(18,2))"
    def dsum(c: String): String = s"CAST(SUM(${dec(c)}) AS DOUBLE)"
    def davg(c: String): String = s"CAST(SUM(${dec(c)}) AS DOUBLE) / COUNT($c)"
    def revenue(price: String, discount: String): String =
      s"${dec(price)} * (1 - ${dec(discount)})"
  }
}
