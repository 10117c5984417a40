package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Multimodal

/** Multimodal pipeline coverage: synthetic binary payloads → mapPartitions
  * decode → relational aggregation. The decode stub's pseudo-metadata is a
  * pure function of the md5 payload, so DuckDB reproduces it nibble by
  * nibble and the whole binary path stays hash-checked.
  */
object MultimodalQ {

  // DuckDB nibble k (1-based) of md5(text)
  private def nib(k: String) =
    s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"

  val queries: Seq[OracleQuery] = Seq(
    OracleQuery(
      "q32_multimodal_features",
      s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
         |bytes AS (
         |  SELECT doc_id,
         |    CAST(SUM(${nib("2*g.j - 1")} * 16 + ${nib("2*g.j")}) AS INTEGER) AS byte_sum
         |  FROM m, unnest(generate_series(1, 16)) AS g(j)
         |  GROUP BY doc_id),
         |f AS (
         |  SELECT m.doc_id,
         |    CAST(${nib("1")} * 4096 + ${nib("2")} * 256 + ${nib("3")} * 16 + ${nib("4")} AS INTEGER) AS width,
         |    CAST(${nib("5")} * 4096 + ${nib("6")} * 256 + ${nib("7")} * 16 + ${nib("8")} AS INTEGER) AS height,
         |    CAST(${nib("10")} + 1 AS INTEGER) AS n_frames,
         |    CAST(byte_sum AS DOUBLE) / 16.0 AS brightness
         |  FROM m JOIN bytes ON bytes.doc_id = m.doc_id)
         |SELECT doc_id, width, height, n_frames, brightness
         |FROM f ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.attachSyntheticMedia(Tables(spark, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    },
  )
}
