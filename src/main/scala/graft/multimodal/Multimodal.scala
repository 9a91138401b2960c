package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, processed
  * by batch-shaped per-partition functions.
  *
  * The actual media decode is STUBBED (this environment ships no
  * image/audio codecs): [[decodeStub]] derives deterministic fake
  * metadata from the payload bytes. Everything around it — the binary
  * schema, the Dataset[Media] typed surface, partition-batched
  * processing (the JVM analogue of `mapInPandas` batch semantics),
  * frame sampling, and feature projection — is real Spark plumbing and
  * is what a production decode would plug into.
  *
  * Scale: decode is per-row work inside mapPartitions — embarrassingly
  * parallel, no shuffle; batches bound peak memory per task the way
  * arrow batches do for pandas UDFs. Binary payloads stay columnar in
  * parquet and are never collected to the driver.
  */
object Multimodal {

  case class Media(id: Long, kind: String, bytes: Array[Byte])
  case class MediaMeta(id: Long, kind: String, nBytes: Int, width: Int,
      height: Int, durationMs: Long, checksum: Long)
  case class Frame(id: Long, frameIdx: Int, offset: Int, length: Int)

  /** STUB decode ??? -> deterministic fake: a real build swaps in an
    * image/audio codec here (signature and surrounding plumbing stay
    * identical). Metadata is a pure function of the payload so tests
    * and oracles are stable.
    */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    val width = 16 + (n % 64)
    val height = 16 + ((n * 7) % 64)
    val durationMs = kind match {
      case "audio" | "video" => n.toLong * 40L
      case _                 => 0L
    }
    (width, height, durationMs)
  }

  /** Cheap payload checksum (sum of unsigned bytes) — stands in for a
    * content hash in the typed pipeline.
    */
  private def checksum(bytes: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  /** Partition-batched decode: iterate each partition in fixed-size
    * batches (mapInPandas-style), decode each payload, emit typed
    * metadata rows.
    */
  def extractMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, d) = decodeStub(m.kind, m.bytes)
          MediaMeta(m.id, m.kind, m.bytes.length, w, h, d,
            checksum(m.bytes))
        }
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * window of the byte stream becomes a "frame" reference (offset +
    * length — a real decoder seeks; the plumbing is identical).
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 256,
      stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, m.bytes.length / frameBytes)
      (0 until nFrames by stride).map { f =>
        Frame(m.id, f, f * frameBytes,
          math.min(frameBytes, m.bytes.length - f * frameBytes))
      }
    }
  }

  /** Build a Media dataset from the documents table (text payload as
    * the opaque binary; kind assigned deterministically) — the loader a
    * real pipeline replaces with `spark.read.format("binaryFile")`.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr("case when doc_id % 3 = 0 then 'image' when doc_id % 3 = 1 then 'audio' else 'video' end")
          .as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) => Media(id, kind, bytes) }
  }
}
