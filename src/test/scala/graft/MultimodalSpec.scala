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

  test("decode is deterministic and matches an independent byte derivation") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
    // independently recompute doc 0's features from MessageDigest md5 of its
    // text — a wrong byte index or shift in the decode stub fails here
    val text0 = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val d = java.security.MessageDigest.getInstance("MD5").digest(text0.getBytes("UTF-8"))
    def u(i: Int): Int = d(i) & 0xff
    val want = Multimodal.MediaFeatures(
      doc_id = 0L,
      width = (u(0) << 8) | u(1),
      height = (u(2) << 8) | u(3),
      n_frames = (u(4) & 0x0f) + 1,
      brightness = d.iterator.map(_ & 0xff).sum / 16.0)
    assert(a.head == want)
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

  test("binaryFile ingestion: media files become rows, glob prunes at listing") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    val bytes = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    java.nio.file.Files.write(dir.resolve("a.jpg"), bytes)
    java.nio.file.Files.write(dir.resolve("b.jpg"), bytes.map(b => (b + 1).toByte))
    java.nio.file.Files.write(dir.resolve("skip.txt"), "not media".getBytes)
    val got = Multimodal.ingestBinary(spark, "file:" + dir, glob = "*.jpg")
    assert(got.count() == 2, "glob did not prune the non-media file")
    val row = got.filter(col("path").endsWith("a.jpg"))
      .select("length", "content").head()
    assert(row.getLong(0) == 16L && row.getAs[Array[Byte]](1).sameElements(bytes))
    // ingested rows feed the decode stage unchanged (same (doc_id, content)
    // contract as column-borne media); doc_id is a stable path hash
    val feats = Multimodal.decodeFeatures(got).collect()
    assert(feats.length == 2 && feats.map(_.doc_id).distinct.length == 2)
    val wantWidth = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    assert(feats.exists(_.width == wantWidth))
  }
}
