package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import graft.engine.Xlsx

/** Property tests for the self-contained xlsx codec: arbitrary strings —
  * including control chars, CR/LF, XML metachars, and adversarial literal
  * `_xHHHH_` sequences — must survive a render→parse round-trip bit-exactly
  * (in-memory, no Spark session needed). */
object XlsxProps extends Properties("Xlsx") {

  // char pool biased toward the hostile cases: XML metachars, controls,
  // CR/LF/tab, underscores and hex runs that mimic the escape convention
  private val hostileChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('<', '>', '&', '"', '\'', ' '),
    2 -> Gen.oneOf('\t', '\n', '\r'),
    2 -> Gen.choose(1.toChar, 31.toChar),
    3 -> Gen.oneOf('_', 'x', '0', '5', 'F', 'f'))

  private val hostileString: Gen[String] =
    Gen.listOf(hostileChar).map(_.mkString)

  private val literalEscape: Gen[String] = for {
    pre <- hostileString; hex <- Gen.listOfN(4, Gen.hexChar); post <- hostileString
  } yield pre + "_x" + hex.mkString + "_" + post

  // the junction case: `_x`+4 hex directly followed by a control char, so
  // the control's inserted escape supplies the trailing underscore of an
  // accidental _xHHHH_ pattern
  private val junction: Gen[String] = for {
    pre <- hostileString; hex <- Gen.listOfN(4, Gen.hexChar)
    ctl <- Gen.choose(1.toChar, 8.toChar); post <- hostileString
  } yield pre + "_x" + hex.mkString + ctl + post

  private val anyString: Gen[String] = Gen.oneOf(hostileString, literalEscape, junction)

  property("ooxmlEscape/ooxmlUnescape invert on any string") =
    Prop.forAll(anyString) { s =>
      Xlsx.ooxmlUnescape(Xlsx.ooxmlEscape(s)) == s
    }

  property("render→parse round-trips string cells bit-exactly") =
    Prop.forAll(Gen.listOfN(3, anyString)) { vals =>
      val schema = StructType(Seq(StructField("s", StringType)))
      // \n in a stored string is legal XML and round-trips; every other
      // control char goes through _xHHHH_
      val rows = vals.map(v => Row(v)).toArray
      val bytes = Xlsx.render(schema, rows)
      val back = Xlsx.parseForTest(bytes)
      back._1 == Seq("s") && back._2.flatten.flatten.map(_._1) == vals
    }
}
