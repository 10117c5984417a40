package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark DataFrame build plus (optionally) the
  * equivalent DuckDB SQL over the same parquet tables. Column names, types,
  * and row order are matched exactly between the two (the driver sorts
  * columns by name and hashes values — see the contract in SparkEntry).
  */
final case class OracleQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OracleQuery {
  def apply(name: String, sql: String)(build: (SparkSession, String) => DataFrame): OracleQuery =
    OracleQuery(name, build, Some(sql))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): OracleQuery =
    OracleQuery(name, build, None)
}
