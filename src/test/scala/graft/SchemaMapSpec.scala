package graft

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import graft.engine.SchemaMap

/** SchemaMap unit + property tests (type-mapping totality, normalization
  * idempotence — properties the reference never tested, SURVEY.md §5). */
class SchemaMapSpec extends SparkSpec {
  import spark.implicits._

  test("type mapping matches the reference table (SURVEY.md §1.3)") {
    assert(SchemaMap.toSqlType(IntegerType) == "INTEGER")
    assert(SchemaMap.toSqlType(LongType) == "BIGINT")
    assert(SchemaMap.toSqlType(DoubleType) == "DOUBLE PRECISION")
    assert(SchemaMap.toSqlType(TimestampType) == "TIMESTAMP")
    assert(SchemaMap.toSqlType(BooleanType) == "BOOLEAN")
    assert(SchemaMap.toSqlType(StringType) == "VARCHAR(256)") // catch-all
    assert(SchemaMap.toSqlType(ArrayType(FloatType)) == "VARCHAR(256)") // catch-all
  }

  test("toSqlType is total over common Catalyst types") {
    val types = Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, DecimalType(10, 2), TimestampType, DateType, BooleanType,
      BinaryType, StringType, ArrayType(IntegerType), MapType(StringType, LongType))
    types.foreach(t => assert(SchemaMap.toSqlType(t).nonEmpty))
  }

  test("fromSqlType inverts the scalar mappings") {
    Seq(IntegerType, LongType, DoubleType, TimestampType, DateType, BooleanType)
      .foreach(t => assert(SchemaMap.fromSqlType(SchemaMap.toSqlType(t)) == t, t))
    assert(SchemaMap.fromSqlType("DECIMAL(12,3)") == DecimalType(12, 3))
  }

  test("normalizeName lowercases and replaces spaces (pandas_aws/redshift.py:93)") {
    assert(SchemaMap.normalizeName("My Col Name") == "my_col_name")
    val gen = Gen.listOfN(12, Gen.frequency((8, Gen.alphaNumChar), (2, Gen.const(' ')))).map(_.mkString)
    Iterator.continually(gen.sample).flatten.take(200).foreach { s =>
      val n = SchemaMap.normalizeName(s)
      assert(SchemaMap.normalizeName(n) == n, s"not idempotent on $s") // idempotent
      assert(!n.contains(' '))
    }
  }

  test("normalizeColumns rejects reserved words") {
    val bad = Seq((1L, "x")).toDF("select", "ok")
    val e = intercept[IllegalArgumentException](SchemaMap.normalizeColumns(bad))
    assert(e.getMessage.contains("select"))
    // case-insensitive: 'TABLE' normalizes to reserved 'table'
    intercept[IllegalArgumentException](SchemaMap.normalizeColumns(Seq((1L, "x")).toDF("TABLE", "ok")))
  }

  test("addReservedWords extends the list (pandas_aws/redshift.py:79-86)") {
    SchemaMap.addReservedWords(Seq(" CustomWord "))
    try {
      assert(SchemaMap.reservedWords.contains("customword"))
      intercept[IllegalArgumentException](
        SchemaMap.normalizeColumns(Seq(1L).toDF("customword")))
    } finally SchemaMap.removeReservedWords(Seq("customword")) // shared JVM — restore
    assert(!SchemaMap.reservedWords.contains("customword"))
  }

  test("ident rejects injection attempts (fixes reference f-string SQL)") {
    assert(SchemaMap.ident("schema.table") == "schema.table")
    intercept[IllegalArgumentException](SchemaMap.ident("t; DROP TABLE x"))
    intercept[IllegalArgumentException](SchemaMap.ident("t'--"))
  }

  test("createTableDdl generates valid DDL with overrides and audit column") {
    val df = Seq((1, "a", 2.5)).toDF("id", "name col", "val")
    val ddl = SchemaMap.createTableDdl(df, "t1",
      columnTypes = Map("name col" -> "VARCHAR(64)"), includeDateInsert = true)
    assert(ddl == "CREATE TABLE IF NOT EXISTS t1 (id INTEGER, name_col VARCHAR(64), " +
      "val DOUBLE PRECISION, date_insert TIMESTAMP) USING PARQUET")
  }
}
