package graft

import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.RowGroupFilters

/** Translation soundness for the row-group predicate pushdown
  * ([[graft.engine.RowGroupFilters]]): what ships, what refuses, and what
  * each FILE's footer re-validation keeps. The invariants here are the
  * no-lost-rows contract — a conjunct may only ever be dropped (weakening
  * the predicate), never strengthened.
  */
class RowGroupFiltersSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("s", StringType), StructField("b", BooleanType),
    StructField("dt", DateType), StructField("dec", DecimalType(5, 2)),
    StructField("wdec", DecimalType(25, 2)),
    StructField("ts", TimestampType), StructField("tsn", TimestampNTZType),
    StructField("arr", ArrayType(LongType)), StructField("raw", BinaryType)))

  private val footer = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional int32 i;
      |  optional int64 l;
      |  optional float f;
      |  optional double d;
      |  optional binary s (STRING);
      |  optional boolean b;
      |  optional int32 dt (DATE);
      |  optional int32 dec (DECIMAL(5,2));
      |  optional int64 ts (TIMESTAMP(MICROS,true));
      |  optional int64 tsn (TIMESTAMP(MICROS,false));
      |  optional binary raw;
      |}""".stripMargin)

  private def t(fs: Filter*) =
    RowGroupFilters.translate(fs, schema, Map.empty)

  test("simple comparisons on primitive types translate; opaque types refuse") {
    assert(t(EqualTo("i", 5)).length === 1)
    assert(t(GreaterThan("l", 10L)).length === 1)
    assert(t(LessThanOrEqual("d", 1.5)).length === 1)
    assert(t(EqualTo("s", "x")).length === 1)
    assert(t(EqualTo("b", true)).length === 1)
    assert(t(EqualTo("dt", java.sql.Date.valueOf("2024-01-01"))).length === 1)
    // narrow decimals and timestamps now ship (round 15)
    assert(t(EqualTo("dec", new java.math.BigDecimal("1.23"))).length === 1)
    assert(t(GreaterThan("ts", java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))).length === 1)
    assert(t(LessThan("tsn", java.time.LocalDateTime.of(2024, 6, 1, 0, 0))).length === 1)
    // wide (>18-digit) decimals and array columns never ship
    assert(t(EqualTo("wdec", new java.math.BigDecimal("1.23"))).isEmpty)
    assert(t(EqualTo("arr", Array(1L))).isEmpty)
    // unknown column refuses
    assert(t(EqualTo("nope", 1)).isEmpty)
  }

  test("timestamp conjuncts require the exact TIMESTAMP(MICROS) annotation per file") {
    val f = t(GreaterThan("ts", java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
    val fn = t(EqualTo("tsn", java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
    assert(RowGroupFilters.build(f, footer).isDefined)
    assert(RowGroupFilters.build(fn, footer).isDefined)
    // MILLIS file generation: omit (micros literal would mis-compare)
    val millis = MessageTypeParser.parseMessageType(
      "message s { optional int64 ts (TIMESTAMP(MILLIS,true)); }")
    assert(RowGroupFilters.build(f, millis).isEmpty)
    // INT96 legacy storage: omit
    val int96 = MessageTypeParser.parseMessageType(
      "message s { optional int96 ts; }")
    assert(RowGroupFilters.build(f, int96).isEmpty)
    // UTC-adjustment mismatch (an LTZ predicate against an NTZ file): omit
    val ntzFile = MessageTypeParser.parseMessageType(
      "message s { optional int64 ts (TIMESTAMP(MICROS,false)); }")
    assert(RowGroupFilters.build(f, ntzFile).isEmpty)
    assert(RowGroupFilters.build(
      t(EqualTo("tsn", java.time.LocalDateTime.of(2024, 6, 1, 0, 0))),
      MessageTypeParser.parseMessageType(
        "message s { optional int64 tsn (TIMESTAMP(MICROS,true)); }")).isEmpty)
  }

  test("decimal conjuncts resolve per file generation and refuse scale drift") {
    val f = t(GreaterThanOrEqual("dec", new java.math.BigDecimal("12.50")))
    // INT32 storage (precision <= 9): builds at int width
    assert(RowGroupFilters.build(f, footer).isDefined)
    // INT64 storage (a precision-widened generation, same scale): builds
    val wide = MessageTypeParser.parseMessageType(
      "message s { optional int64 dec (DECIMAL(12,2)); }")
    assert(RowGroupFilters.build(f, wide).isDefined)
    // scale mismatch: unscaled values are not comparable — omit
    val drift = MessageTypeParser.parseMessageType(
      "message s { optional int32 dec (DECIMAL(5,3)); }")
    assert(RowGroupFilters.build(f, drift).isEmpty)
    // binary-backed decimal storage: omit
    val fixed = MessageTypeParser.parseMessageType(
      "message s { optional fixed_len_byte_array(16) dec (DECIMAL(5,2)); }")
    assert(RowGroupFilters.build(f, fixed).isEmpty)
    // a literal the column scale cannot represent exactly refuses at translate
    assert(t(EqualTo("dec", new java.math.BigDecimal("1.005"))).isEmpty)
  }

  test("fractional literals against integral columns never truncate-push") {
    // lt(l, 1) built from LessThan(l, 1.5) would wrongly drop a row group
    // whose only value is 1 (1 < 1.5 matches). Fractional Number boxes must
    // refuse the integral tags outright — only Byte/Short/Integer/Long ship.
    assert(t(LessThan("l", java.lang.Double.valueOf(1.5))).isEmpty)
    assert(t(GreaterThan("i", java.lang.Float.valueOf(2.5f))).isEmpty)
    assert(t(EqualTo("l", new java.math.BigDecimal("3.7"))).isEmpty)
    // integral boxes still push, including cross-width ones
    assert(t(LessThan("l", java.lang.Integer.valueOf(1))).length === 1)
    assert(t(EqualTo("i", java.lang.Long.valueOf(7L))).length === 1)
    // an int-tagged literal outside Int range refuses (no wraparound)
    assert(t(EqualTo("i", java.lang.Long.valueOf(Long.MaxValue))).isEmpty)
  }

  test("NaN literals never push (footer stats omit NaN - could wrongly drop groups)") {
    assert(t(EqualTo("f", Float.NaN)).isEmpty)
    assert(t(EqualTo("d", Double.NaN)).isEmpty)
    assert(t(GreaterThan("d", Double.NaN)).isEmpty)
    // ordinary floats still push
    assert(t(EqualTo("f", 1.5f)).length === 1)
  }

  test("null literals only ship through the null-test shapes") {
    assert(t(EqualTo("i", null)).isEmpty)
    assert(t(IsNull("i")).length === 1)
    assert(t(IsNotNull("s")).length === 1)
    assert(t(EqualNullSafe("i", null)).length === 1) // <=> null IS a null test
  }

  test("IN is all-or-nothing: a null or untranslatable member kills the whole set") {
    assert(t(In("i", Array(1, 2, 3))).length === 1)
    assert(t(In("i", Array(1, null, 3))).isEmpty)
    assert(t(In("i", Array.empty[Any])).isEmpty)
    // over the ship cap: refused, the file-level index already ran
    assert(t(In("i", (1 to 20000).map(x => x: Any).toArray)).isEmpty)
  }

  test("OR requires both sides; AND keeps a translatable side alone (implied weaker predicate)") {
    assert(t(Or(EqualTo("i", 1), EqualTo("l", 2L))).length === 1)
    assert(t(Or(EqualTo("i", 1), EqualTo("wdec", new java.math.BigDecimal("1")))).isEmpty)
    assert(t(And(EqualTo("i", 1), EqualTo("wdec", new java.math.BigDecimal("1")))).length === 1)
    assert(t(And(EqualTo("wdec", new java.math.BigDecimal("1")), EqualTo("l", 2L))).length === 1)
  }

  test("StringStartsWith translates to the [p, nextPrefix(p)) range on string columns") {
    assert(t(StringStartsWith("s", "ab")).length === 1)
    assert(RowGroupFilters.build(t(StringStartsWith("s", "ab")), footer).isDefined)
    // non-string columns and empty prefixes refuse
    assert(t(StringStartsWith("i", "1")).isEmpty)
    assert(t(StringStartsWith("s", "")).isEmpty)
    // a non-UTF8-annotated binary file generation drops the conjunct
    val rawS = MessageTypeParser.parseMessageType(
      "message spark_schema { optional binary s; }")
    assert(RowGroupFilters.build(t(StringStartsWith("s", "ab")), rawS).isEmpty)
  }

  test("nextPrefix increments the last code point in code-point order") {
    def cps(xs: Int*): String = new String(xs.toArray, 0, xs.length)
    assert(RowGroupFilters.nextPrefix("ab") === Some("ac"))
    assert(RowGroupFilters.nextPrefix("a") === Some("b"))
    // BMP max: U+FFFF + 1 = U+10000 (a supplementary code point)
    assert(RowGroupFilters.nextPrefix(cps('a', 0xFFFF)) === Some(cps('a', 0x10000)))
    // surrogate block: U+D7FF + 1 jumps to U+E000 (no valid cp between)
    assert(RowGroupFilters.nextPrefix(cps('a', 0xD7FF)) === Some(cps('a', 0xE000)))
    // trailing U+10FFFF positions drop before incrementing
    assert(RowGroupFilters.nextPrefix("ab" + cps(0x10FFFF)) === Some("ac"))
    // an all-max prefix has no upper bound
    assert(RowGroupFilters.nextPrefix(cps(0x10FFFF, 0x10FFFF)) === None)
  }

  test("footer re-validation drops missing columns and type-mismatched generations") {
    // column present with matching physical type: predicate builds
    assert(RowGroupFilters.build(t(EqualTo("i", 5)), footer).isDefined)
    // pre-evolution file lacking the column: conjunct drops -> no predicate
    val noI = MessageTypeParser.parseMessageType(
      "message spark_schema { optional int64 l; }")
    assert(RowGroupFilters.build(t(EqualTo("i", 5)), noI).isEmpty)
    // a widened column's OLD files hold the narrow type: long predicate
    // against an int32 footer drops (the residual filter still runs)
    val narrowL = MessageTypeParser.parseMessageType(
      "message spark_schema { optional int32 l; }")
    assert(RowGroupFilters.build(t(EqualTo("l", 5L)), narrowL).isEmpty)
    // string predicate requires the UTF8 annotation (unsigned comparator)
    assert(RowGroupFilters.build(t(EqualTo("s", "x")), footer).isDefined)
    val rawS = MessageTypeParser.parseMessageType(
      "message spark_schema { optional binary s; }")
    assert(RowGroupFilters.build(t(EqualTo("s", "x")), rawS).isEmpty)
    // OR with one footer-dropped side drops whole (strengthening is unsound)
    val orF = t(Or(EqualTo("i", 1), EqualTo("l", 2L)))
    assert(RowGroupFilters.build(orF, noI).isEmpty)
    // AND with one footer-dropped side keeps the other
    val andF = t(And(EqualTo("i", 1), EqualTo("l", 2L)))
    assert(RowGroupFilters.build(andF, noI).isDefined)
  }

  test("binary point predicates ship against un-annotated BINARY only") {
    val f = t(EqualTo("raw", Array[Byte](1, 2, 3)))
    assert(f.length === 1)
    assert(RowGroupFilters.build(f, footer).isDefined)
    // range and IN shapes ship too (unsigned comparator on both sides)
    assert(RowGroupFilters.build(
      t(GreaterThan("raw", Array[Byte](0x7f.toByte))), footer).isDefined)
    assert(RowGroupFilters.build(
      t(In("raw", Array(Array[Byte](1), Array[Byte](2)))), footer).isDefined)
    // an ANNOTATED binary generation (string/decimal/...) may order
    // differently — the footer check omits
    val annotated = MessageTypeParser.parseMessageType(
      "message s { optional binary raw (STRING); }")
    assert(RowGroupFilters.build(f, annotated).isEmpty)
    // and a string predicate never lands on the raw column either way
    assert(RowGroupFilters.build(t(EqualTo("s", "x")),
      MessageTypeParser.parseMessageType(
        "message s { optional binary s; }")).isEmpty)
  }

  test("NTZ java.sql.Timestamp literals canonicalize by WALL CLOCK, zone-independent") {
    // Timestamp.valueOf parses the wall clock in the JVM default zone;
    // an NTZ column stores those same wall-clock micros. The canon must
    // round-trip through the LOCAL fields — an instant-based conversion
    // (fromJavaTimestamp) would shift the bound by the zone offset and
    // prune row groups that hold matching rows.
    val wall = java.time.LocalDateTime.of(2024, 6, 1, 12, 30, 15)
    val expect = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .localDateTimeToMicros(wall)
    val old = java.util.TimeZone.getDefault
    try {
      for (z <- Seq("UTC", "America/New_York", "Asia/Tokyo")) {
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(z))
        val ts = java.sql.Timestamp.valueOf("2024-06-01 12:30:15")
        assert(RowGroupFilters.canon("tsn", ts) === Some(expect),
          s"NTZ canon must be zone-independent (zone $z)")
        // the LocalDateTime flavor is the reference arithmetic
        assert(RowGroupFilters.canon("tsn", wall) === Some(expect))
        // LTZ ('ts') literals ARE instants: canon stays instant-based and
        // therefore tracks the zone the wall-clock string was parsed in
        assert(RowGroupFilters.canon("ts", ts) ===
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(ts)))
      }
    } finally java.util.TimeZone.setDefault(old)
  }
}
