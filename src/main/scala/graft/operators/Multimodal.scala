package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as partition-batched
  * iterator transforms (`mapPartitions`) so a real decoder (image/audio
  * codec) slots in without touching the distributed plumbing.
  *
  * The decode itself is a STUB — the container has no image/audio
  * libraries — implemented as a deterministic function of the bytes so
  * the pipeline shape (schema, batching, partitioning) is real and
  * testable end-to-end. Swap `FakeDecoder` for a JNI/FFM codec binding
  * in production; nothing else changes.
  */
object Multimodal {

  /** A decoded media record: what a real image decoder would emit. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** STUB DECODER — deterministic fake standing in for e.g. a JPEG
    * header parse. Real implementation would read actual dimensions
    * from the payload; this derives them from byte length so results
    * are reproducible and assertable. */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(
        doc_id = id,
        byte_len = n,
        width = (n % 640L).toInt + 16,
        height = ((n / 640L) % 480L).toInt + 16,
        channels = 3,
        format = if (n % 2 == 0) "fake/rgb" else "fake/bgr")
    }
  }

  /** Attach a binary payload column + lightweight metadata (here the
    * UTF-8 encoding of a text column stands in for real media bytes). */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(textCol)).cast("long").as("declared_len")).as("meta"))

  /** Partition-batched decode: each partition's rows stream through the
    * decoder in batches of `batchSize` (the shape a vectorized /
    * GPU decoder wants), never materializing the partition in memory. */
  def decodeMeta(binDf: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.iterator.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
        }
      }
  }

  /** Deterministic frame sampling stand-in: pick every `stride`-th
    * 16-byte window of the payload as a "frame" fingerprint. */
  def sampleFrames(binDf: DataFrame, stride: Int = 256): DataFrame = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          Iterator.range(0, math.max(bytes.length - 15, 0), stride).map { off =>
            val window = bytes.slice(off, off + 16)
            (id, off.toLong, window.map(b => (b & 0xff).toLong).sum)
          }
        }
      }.toDF("doc_id", "frame_offset", "frame_checksum")
  }
}
