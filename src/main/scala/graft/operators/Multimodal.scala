package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as partition-parallel typed transforms
  * (the Scala analogue of arrow-batched Pandas UDFs).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[FakeDecoder]]) — the Spark-side
  * plumbing (schema, batching via mapPartitions, partition parallelism, no
  * driver collection) is real and is what matters at 100 TB: payload bytes
  * never leave the executors, and feature extraction streams one partition at
  * a time with one decoder instance per partition.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long,
      payload_len: Int,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB decoder: derives deterministic pseudo-metadata from the payload
    * bytes. A real deployment replaces this object with an actual
    * image/audio/video codec; nothing else changes in the plumbing. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (String, Int, Int, Int) = {
      val n = payload.length
      val fmt = n % 3 match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webm"
      }
      // real codec goes here (??? in production without one); deterministic fake:
      val width = 64 + (n % 640)
      val height = 64 + ((n * 7) % 480)
      val frames = if (fmt == "webm") 1 + (n % 24) else 1
      (fmt, width, height, frames)
    }

    /** FNV-1a 64-bit over the payload — stands in for a perceptual hash. */
    def checksum(payload: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h ^= (payload(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** Attach a binary payload column to `documents` (UTF-8 bytes of the text —
    * the testdata has no real media, but the column type and downstream
    * plumbing are exactly what a real binary column uses). */
  def withBinaryPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Decode + feature-extract the payload column, partition-parallel; one
    * decoder per partition, payload bytes never reach the driver. */
  def extractFeatures(withPayload: DataFrame): DataFrame = {
    val input = withPayload
      .select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (fmt, w, h, f) = FakeDecoder.decode(payload)
          MediaFeatures(id, payload.length, fmt, w, h, f, FakeDecoder.checksum(payload))
        }
      }(Encoders.product[MediaFeatures])
      .toDF()
  }

  /** Deterministic frame sampling for video payloads: every `stride`-th frame
    * index, one output row per sampled frame (the explode-to-frames shape real
    * video pipelines use before per-frame feature extraction). */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .filter(col("format") === "webm")
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
}
