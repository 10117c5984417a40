package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.engine.{Det, Tables}
import graft.operators.Salt

/** Skew-safe aggregation as an oracle-checked query (wires operators.Salt
  * into the correctness gate — previously spec-only).
  *
  * l_returnflag has 3 values and 'N' alone carries ~half of lineitem, so a
  * plain groupBy funnels half the table through one reducer; the salted
  * two-phase plan spreads each flag over the full shuffle parallelism for
  * the partial aggregate and reduces `buckets` tiny partial rows per flag in
  * phase two. Sums run on the exact DECIMAL(18,2) view (Det), which is what
  * makes the two-phase result BIT-IDENTICAL to the oracle's single-phase
  * sum — decimal addition is associative, double addition is not.
  */
object Skew {

  val queries: Seq[OracleQuery] = Seq(
    OracleQuery(
      "q51_salted_skew_agg",
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${Det.sql.dsum("l_quantity")} AS sum_qty,
         |  ${Det.sql.dsum("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          Det.dec(col("l_quantity")).as("qty"),
          Det.dec(col("l_extendedprice")).as("price"))
      Salt.saltedSumCount(li, keys = Seq("l_returnflag"),
          saltFrom = Seq("l_orderkey", "l_linenumber"), buckets = parts,
          sums = Seq("qty", "price"))
        .select(col("l_returnflag"), col("n"),
          col("sum_qty").cast(DoubleType).as("sum_qty"),
          col("sum_price").cast(DoubleType).as("sum_price"))
        .orderBy("l_returnflag")
    },

    // ---- q70: skew-safe salted JOIN (Salt.saltedJoin). q51 levels
    //           aggregation skew; this levels JOIN skew for the case AQE
    //           can't fix (hot build-side key) and broadcast can't dodge
    //           (dimension over the broadcast budget): big side salted
    //           deterministically, small side replicated ×buckets, join on
    //           (key, salt). Inner-join semantics are exact, so the oracle
    //           is the PLAIN join — same rows, same sums, bit-identical via
    //           the decimal view. ----
    OracleQuery(
      "q70_salted_skew_join",
      s"""SELECT p_brand, count(*) AS n,
         |  ${Det.sql.dsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (spark, dir) =>
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_orderkey"), col("l_linenumber"),
          Det.dec(col("l_quantity")).as("qty"))
      val pt = Tables(spark, dir, "part")
        .select(col("p_partkey").as("pk"), col("p_brand"))
      Salt.saltedJoin(li, pt, key = "pk",
          saltFrom = Seq("l_orderkey", "l_linenumber"), buckets = parts)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(col("qty")).cast(DoubleType).as("sum_qty"))
        .orderBy("p_brand")
    },
  )
}
