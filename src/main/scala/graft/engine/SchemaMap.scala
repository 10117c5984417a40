package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema services for the warehouse path (reference: pandas_aws/redshift.py).
  *
  * The reference infers warehouse DDL from pandas dtypes by string prefix
  * (`_to_redshift_types`, pandas_aws/redshift.py:102-122): int*→INTEGER,
  * float*→REAL, datetime*→TIMESTAMP, bool→BOOLEAN, else VARCHAR(256). Here the
  * source of truth is the Catalyst schema (`df.schema`), mapped type-for-type
  * (SURVEY.md §1.3). Deviation (documented): floats map to DOUBLE PRECISION,
  * not 4-byte REAL — testdata is double end-to-end and narrowing would break
  * oracle exactness.
  *
  * Column-name normalization mirrors `_validate_column_names`
  * (pandas_aws/redshift.py:88-100): lowercase, spaces→underscores, reject
  * reserved words. The reserved list is standard SQL/warehouse reserved words
  * carried as data, extensible at runtime like `add_reserved_words`
  * (pandas_aws/redshift.py:79-86).
  */
object SchemaMap {

  /** Catalyst type → warehouse SQL type (CREATE TABLE DDL). */
  def toSqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType | DoubleType             => "DOUBLE PRECISION"
    case d: DecimalType                     => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType   => "TIMESTAMP"
    case DateType                           => "DATE"
    case BooleanType                        => "BOOLEAN"
    case BinaryType                         => "VARBYTE"
    case _                                  => "VARCHAR(256)" // catch-all, as the reference
  }

  /** Warehouse SQL type → Catalyst type (read-side inverse). */
  def fromSqlType(s: String): DataType = s.trim.toUpperCase match {
    case "INTEGER" | "INT" | "INT4"             => IntegerType
    case "BIGINT" | "INT8"                      => LongType
    case "REAL" | "FLOAT4"                      => FloatType
    case "DOUBLE PRECISION" | "FLOAT8" | "FLOAT" => DoubleType
    case "TIMESTAMP" | "DATETIME"               => TimestampType
    case "DATE"                                 => DateType
    case "BOOLEAN" | "BOOL"                     => BooleanType
    case t if t.startsWith("DECIMAL") || t.startsWith("NUMERIC") =>
      // precision-less DECIMAL/NUMERIC is valid SQL → warehouse default (18,0)
      t.dropWhile(_ != '(').drop(1).takeWhile(_ != ')').split(',').map(_.trim).toSeq match {
        case Seq(p, sc) if p.nonEmpty => DecimalType(p.toInt, sc.toInt)
        case Seq(p) if p.nonEmpty     => DecimalType(p.toInt, 0)
        case _                        => DecimalType(18, 0)
      }
    case t if t.startsWith("VARCHAR") || t.startsWith("CHAR") => StringType
    case _ => StringType
  }

  /** Standard SQL reserved words a column may not be named (subset shared by
    * Redshift/ANSI; extensible via [[addReservedWords]]). The base list is
    * immutable — runtime extensions live in their own set so
    * [[removeReservedWords]] can only undo extensions, never weaken the
    * built-in guard. */
  private val baseReserved: Set[String] = Set(
    "all", "analyse", "analyze", "and", "any", "array", "as", "asc",
    "between", "binary", "both", "by", "case", "cast", "check", "column",
    "constraint", "create", "cross", "current_date", "current_time",
    "current_timestamp", "current_user", "default", "deferrable", "desc",
    "distinct", "do", "else", "end", "except", "false", "for", "foreign",
    "freeze", "from", "full", "grant", "group", "having", "ilike", "in",
    "initially", "inner", "intersect", "into", "is", "isnull", "join",
    "leading", "left", "like", "limit", "localtime", "localtimestamp",
    "natural", "new", "not", "notnull", "null", "nulls", "off", "offset",
    "old", "on", "only", "or", "order", "outer", "overlaps", "partition",
    "percent", "placing", "primary", "references", "right", "select",
    "session_user", "similar", "some", "table", "then", "to", "top",
    "trailing", "true", "union", "unique", "user", "using", "verbose",
    "when", "where", "with", "without")

  @volatile private var extraReserved: Set[String] = Set.empty

  def reservedWords: Set[String] = baseReserved ++ extraReserved

  def addReservedWords(words: Seq[String]): Unit =
    extraReserved = extraReserved ++ words.map(_.trim.toLowerCase)

  /** Inverse of [[addReservedWords]] — undoes runtime extensions only; the
    * built-in base words cannot be unreserved. */
  def removeReservedWords(words: Seq[String]): Unit =
    extraReserved = extraReserved -- words.map(_.trim.toLowerCase)

  /** Normalize one column name: lowercase, spaces → underscores. */
  def normalizeName(name: String): String =
    name.toLowerCase.replace(' ', '_')

  /** Normalize all column names; reject reserved words (fail fast, like the
    * reference's ValueError at pandas_aws/redshift.py:95-99). */
  def normalizeColumns(df: DataFrame): DataFrame = {
    val normed = df.columns.map(normalizeName)
    val bad = normed.filter(reservedWords.contains)
    require(bad.isEmpty, s"reserved word(s) used as column name: ${bad.mkString(", ")}")
    val collisions = df.columns.zip(normed).groupBy(_._2).filter(_._2.length > 1)
    require(collisions.isEmpty,
      s"column names collide after normalization: " +
        collisions.map { case (n, cs) => s"${cs.map(_._1).mkString("/")} -> $n" }.mkString(", "))
    df.toDF(normed.toIndexedSeq: _*)
  }

  /** Validated SQL identifier — the reference interpolates raw strings into
    * SQL (injection-prone, SURVEY.md §7.4); we only pass identifiers matching
    * a strict pattern. */
  def ident(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"invalid SQL identifier: $name")
    name
  }

  /** CREATE TABLE IF NOT EXISTS DDL from a DataFrame schema, with optional
    * per-column overrides/constraints and an injectable audit column
    * (the reference's `date_insert DATETIME DEFAULT GETDATE()`,
    * pandas_aws/redshift.py:218-219, made deterministic/injectable). */
  def createTableDdl(
      df: DataFrame,
      table: String,
      columnTypes: Map[String, String] = Map.empty,
      columnConstraints: Map[String, String] = Map.empty,
      includeDateInsert: Boolean = false): String = {
    val cols = df.schema.fields.map { f =>
      val name = ident(normalizeName(f.name))
      val tpe = columnTypes.getOrElse(f.name, toSqlType(f.dataType))
      val cons = columnConstraints.get(f.name).map(" " + _).getOrElse("")
      s"$name $tpe$cons"
    }
    val audit = if (includeDateInsert) Seq("date_insert TIMESTAMP") else Seq.empty
    s"CREATE TABLE IF NOT EXISTS ${ident(table)} (${(cols ++ audit).mkString(", ")}) USING PARQUET"
  }
}
