package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Multimodal

/** Plumbing checks for the multimodal binary path: payload shape, decode
  * determinism, partition preservation, frame sampling geometry. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.attachSyntheticMedia(Tables(spark, sf, "documents"))

  test("synthetic payload is 16 opaque bytes with a mime tag") {
    val row = media.select(length(col("content")), col("mime")).head()
    assert(row.getInt(0) == 16 && row.getString(1) == "image/x-stub")
  }

  test("decode is deterministic and bounded") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
    assert(a.forall(f => f.width >= 0 && f.width < 65536 &&
      f.n_frames >= 1 && f.n_frames <= 16 &&
      f.brightness >= 0 && f.brightness <= 255 * 16 / 16.0))
  }

  test("decode preserves partitioning (no exchange inserted)") {
    val reparted = media.repartition(3)
    assert(Multimodal.decodeFeatures(reparted).rdd.getNumPartitions == 3)
  }

  test("frame sampling takes every step-th fixed chunk") {
    val frames = Multimodal.frameSample(media, chunkBytes = 4, step = 2)
      .select(col("doc_id"), size(col("frames")).as("n")).as[(Long, Int)].collect()
    // 16 bytes → 4 chunks of 4 → indices 0,2 sampled
    assert(frames.nonEmpty && frames.forall(_._2 == 2))
  }

  test("resize keeps every k-th byte, preserving ids") {
    val resized = Multimodal.resize(media, factor = 4)
      .select(col("doc_id"), length(col("content")).as("n")).as[(Long, Int)].collect()
    assert(resized.nonEmpty && resized.forall(_._2 == 4)) // 16 bytes / 4
  }
}
