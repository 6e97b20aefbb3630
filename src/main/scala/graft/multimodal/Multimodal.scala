package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §2.10 north star.
  *
  * Media (image/audio/video) travels as an opaque `binary` column plus
  * typed metadata; decode / feature-extract / frame-sample run as typed
  * mapPartitions stages so each partition amortizes decoder setup (the
  * Scala analogue of batch-at-a-time Pandas UDFs). The actual codecs are
  * NOT available in this environment, so [[DecodeStub]] is a clearly-marked
  * deterministic fake; the Spark-side contract — schema, partitioning,
  * batch iteration shape — is real and tested (MultimodalSpec).
  */
object Multimodal {

  /** A media payload: id + raw bytes + declared kind ("image"/"audio"/...). */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded feature row (shape the real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,      // stub: derived, a real decoder reads the header
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * codec (none installed in this container). Field values are pure
    * functions of the payload bytes so tests are reproducible; swap this
    * object for a real codec binding without touching the pipeline. */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      val sum = r.payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        n_bytes = n.toLong,
        width = 16 + (math.abs(sum) % 1024).toInt,
        height = 16 + (math.abs(sum / 7) % 1024).toInt,
        n_frames = if (r.kind == "video") 1 + n % 64 else 1,
        checksum = sum)
    }
  }

  /** Decode a media Dataset partition-at-a-time. One decoder per partition
    * (setup cost amortized), rows streamed — never materialize a partition
    * in memory. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: open codec context here, close after the iterator
      it.map(DecodeStub.decode)
    }
  }

  /** Frame sampling for video-kind payloads: every `stride`-th chunk of the
    * payload becomes one "frame" row (the real operator emits decoded
    * frames; the chunking/explode shape is identical). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { r =>
        r.payload.grouped(stride).zipWithIndex.collect {
          case (chunk, i) if i % 2 == 0 => (r.media_id, i, chunk.length)
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Resized media row: payload downsampled to the target cell count. */
  case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize stage: every payload reduced to a `targetW x targetH` byte
    * grid by strided selection — the STUB standing in for a real
    * interpolating resampler, with the real pipeline shape: one typed
    * mapPartitions stage, per-partition setup amortization, bounded output
    * size regardless of input payload size (the property that makes the
    * downstream shuffle predictable at 100 TB). */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int)
      : Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    val cells = targetW * targetH
    media.mapPartitions { it =>
      // real impl: allocate the resampler once per partition here
      it.map { r =>
        val n = r.payload.length
        val out =
          if (n == 0) Array.emptyByteArray
          else Array.tabulate(cells)(i => r.payload((i.toLong * n / cells).toInt))
        ResizedMedia(r.media_id, r.kind, targetW, targetH, out)
      }
    }
  }

  /** Wrap a text table as media records (UTF-8 bytes) — the fixture path
    * used by queries/tests, since the corpus has no true binary column. */
  def fromDocuments(docs: DataFrame, kind: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit(kind).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
}
