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

    // ---- q60: media resize through the mapPartitions stage. The stub keeps
    //           every 4th payload byte; with the 16-byte md5 payload that is
    //           bytes 0/4/8/12 = md5-hex chars (1,2)(9,10)(17,18)(25,26),
    //           which DuckDB reproduces by substring — the binary output is
    //           compared as uppercase hex so no engine binary-codec quirks
    //           enter the hash. ----
    OracleQuery(
      "q60_multimodal_resize",
      """SELECT doc_id,
        |  upper(substr(h, 1, 2) || substr(h, 9, 2) || substr(h, 17, 2) || substr(h, 25, 2)) AS resized_hex
        |FROM (SELECT doc_id, md5(text) AS h FROM documents) m
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Multimodal.resize(
          Multimodal.attachSyntheticMedia(Tables(spark, dir, "documents")), 4)
        .select(col("doc_id"), hex(col("content")).as("resized_hex"))
        .orderBy("doc_id")
    },

    // ---- q61: video-style frame sampling (4-byte chunks, every 2nd chunk
    //           of the 16-byte payload = chunks 0 and 2 = hex chars 1-8 and
    //           17-24), emitted as ':'-joined hex frames. ----
    OracleQuery(
      "q61_multimodal_frames",
      """SELECT doc_id, CAST(2 AS INTEGER) AS n_frames,
        |  upper(substr(h, 1, 8)) || ':' || upper(substr(h, 17, 8)) AS frames_hex
        |FROM (SELECT doc_id, md5(text) AS h FROM documents) m
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Multimodal.frameSample(
          Multimodal.attachSyntheticMedia(Tables(spark, dir, "documents")),
          chunkBytes = 4, step = 2)
        .select(col("doc_id"),
          size(col("frames")).as("n_frames"),
          array_join(transform(col("frames"), b => hex(b)), ":").as("frames_hex"))
        .orderBy("doc_id")
    },
  )
}
