package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver-mandated extension): media travel as
  * opaque `binary` content columns + typed metadata, and per-item decode /
  * feature-extraction runs as iterator-in/iterator-out `mapPartitions` — the
  * JVM analogue of a Pandas-UDF `mapInPandas` stage: batched, partition-
  * preserving, no driver participation, arbitrary library code inside.
  *
  * The decode step is a STUB by design (no image/audio codecs exist in this
  * environment): it derives deterministic pseudo-metadata from the bytes
  * where a real build would call the codec. Everything around it — schema,
  * partitioning, batch shape, downstream relational use — is real.
  */
object Multimodal {

  /** Decoded per-item features. A real decoder would fill these from the
    * actual media header/pixels. */
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, n_frames: Int, brightness: Double)

  /** Ingest raw media FILES as binary rows via Spark's binaryFile source —
    * the front door of the multimodal pipeline when media live as objects
    * (jpg/wav/mp4 keys) rather than columns. Each file becomes one row of
    * (doc_id, path, length, content); doc_id is a stable hash of the path so
    * downstream joins and dedup have a numeric key. The source prunes by
    * `pathGlobFilter` at LISTING time and pushes `length`/`modificationTime`
    * predicates down to file status (never opening filtered files) — at
    * 100 TB of media, selection happens on metadata, and the bytes of a
    * selected file go straight to the owning task, no driver hop. */
  def ingestBinary(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("path"), col("length"), col("content"))

  /** Attach a synthetic 16-byte binary payload (md5 of the text) standing in
    * for real media bytes, plus a mime tag. Deterministic, so the pipeline
    * stays oracle-checkable end to end. */
  def attachSyntheticMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("content", unhex(md5(col("text"))))
      .withColumn("mime", lit("image/x-stub"))

  /** Batched decode over (doc_id, content). Iterator-to-iterator so a real
    * decoder can amortize per-batch setup (model load, codec init) exactly
    * like mapInPandas batches do. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // >>> STUB BOUNDARY: real codec goes here (parse header, decode
        // frames). Below derives the same fields deterministically from the
        // payload bytes so tests and oracles can pin the plumbing. <<<
        batch.map { case (id, b) =>
          def u(i: Int): Int = b(i) & 0xff
          MediaFeatures(
            doc_id = id,
            width = (u(0) << 8) | u(1),
            height = (u(2) << 8) | u(3),
            n_frames = (u(4) & 0x0f) + 1,
            brightness = b.iterator.map(_ & 0xff).sum / 16.0)
        }
      }
  }

  /** Resize: keep every `factor`-th byte of the payload — the byte-level
    * shape of image downsampling (a real build would decode, resample
    * pixels, re-encode inside the same mapPartitions stage). */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "factor must be > 0")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // >>> STUB BOUNDARY: real resampling goes here <<<
        batch.map { case (id, b) =>
          (id, b.zipWithIndex.collect { case (v, i) if i % factor == 0 => v })
        }
      }
      .toDF("doc_id", "content")
  }

  /** Frame sampling: every `step`-th fixed-size chunk of the payload —
    * the byte-level shape of video frame extraction (array<binary> out). */
  def frameSample(media: DataFrame, chunkBytes: Int, step: Int): DataFrame = {
    require(chunkBytes > 0 && step > 0, "chunkBytes and step must be > 0")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // >>> STUB BOUNDARY: real frame extraction goes here — iterator-in/
        // iterator-out like the other stages so per-batch codec setup
        // amortizes <<<
        batch.map { case (id, b) =>
          val frames = b.grouped(chunkBytes).zipWithIndex
            .collect { case (chunk, i) if i % step == 0 => chunk }
            .toSeq
          (id, frames)
        }
      }
      .toDF("doc_id", "frames")
  }
}
