package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as partition-batched
  * iterator transforms (`mapPartitions`) so a real decoder (image/audio
  * codec) slots in without touching the distributed plumbing.
  *
  * Images decode for REAL via the JDK's `javax.imageio` ([[PngCodec]] /
  * [[decodeImage]]): dimensions, channel count and a raster checksum
  * are recovered from actual PNG bytes. Audio/video codecs aren't in
  * the JDK, so those paths keep the deterministic [[FakeDecoder]]
  * stand-in — swap in a JNI/FFM codec binding per batch in production;
  * the distributed plumbing (schema, batching, partitioning) is
  * identical either way.
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

  /** A REAL decoded image record: every field below is recovered from
    * the PNG bytes by an actual codec, not derived from length. */
  final case class ImageMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String,
      pixel_sum: Long)

  /** Deterministic tiny-PNG codec over the JDK's real `javax.imageio`
    * (no external library): geometry and pixel values are closed-form
    * functions of the id, so an engine-independent oracle can recompute
    * everything a REAL decode must recover — dimensions from the IHDR
    * and a checksum over the decoded raster (which fails if the decoder
    * merely parsed the header). This replaces the earlier FakeDecoder
    * stub for the decode-path queries; [[FakeDecoder]] remains only as
    * the stand-in for codecs the JDK lacks (audio/video). */
  object PngCodec {
    def widthOf(id: Long): Int = 16 + (id % 5).toInt * 8
    def heightOf(id: Long): Int = 12 + (id % 3).toInt * 8
    /** Gray value written to all three RGB channels at (x, y). */
    def pixel(id: Long, x: Int, y: Int): Int =
      ((7L * x + 13L * y + id) % 256L).toInt

    def encode(id: Long): Array[Byte] = {
      val (w, h) = (widthOf(id), heightOf(id))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = pixel(id, x, y)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(id: Long, bytes: Array[Byte]): ImageMeta = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no image reader for doc $id")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += raster.getSample(x, y, 0) // red band of the gray fill
              x += 1
            }
            y += 1
          }
          ImageMeta(id, img.getWidth, img.getHeight,
            raster.getNumBands, fmt, sum)
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Generate a real PNG payload per id — the fixture side of the
    * decode path, batched like every other media transform. */
  def attachPng(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap(_.iterator.map(id =>
          (id, PngCodec.encode(id))))
      }.toDF("doc_id", "content")
  }

  /** REAL partition-batched image decode via `javax.imageio`: width,
    * height and channel count come from the codec, and `pixel_sum`
    * proves the raster itself was decoded. Same iterator/batch shape
    * as [[decodeMeta]] — a vectorized/GPU decoder drops in per batch. */
  def decodeImage(binDf: DataFrame, batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) => PngCodec.decode(id, bytes) }
        }
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

  /** Feature-extraction stand-in: a position-strided byte histogram —
    * bucket `i` sums the payload bytes at offsets ≡ i (mod `dim`) —
    * which is the output SHAPE of a real embedding model's
    * preprocessing (fixed-width vector per media item) with fully
    * deterministic integer values. Batched per partition like
    * [[decodeMeta]] (one vectorized call per batch in production).
    * Null/empty payloads emit no rows. */
  def extractFeatures(binDf: DataFrame, dim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            if (bytes == null || bytes.isEmpty) Iterator.empty
            else {
              val sums = new Array[Long](dim)
              var i = 0
              while (i < bytes.length) {
                sums(i % dim) += bytes(i) & 0xff
                i += 1
              }
              // bucket b has rows iff some offset ≡ b exists, i.e.
              // b < min(dim, len) — shorter payloads emit fewer buckets
              Iterator.range(0, math.min(dim, bytes.length))
                .map(b => (id, b.toLong, sums(b)))
            }
          }
        }
      }.toDF("doc_id", "bucket", "feat_sum")
  }

  /** Resize stand-in: nearest-neighbor downsample of the decoded
    * byte grid to `w`×`h`, emitting a per-item checksum of the sampled
    * grid — deterministic, so the distributed shape (batching, one
    * output row per input) is assertable without a codec. */
  def resizeStub(binDf: DataFrame, w: Int, h: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val meta = FakeDecoder.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
            // sample a w×h grid over the (width × height) byte plane
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              val srcY = (y.toLong * meta.height) / h
              while (x < w) {
                val srcX = (x.toLong * meta.width) / w
                val off = srcY * meta.width + srcX
                if (bytes != null && bytes.length > 0)
                  sum += bytes(((off % bytes.length).toInt + bytes.length)
                    % bytes.length) & 0xff
                x += 1
              }
              y += 1
            }
            (id, w, h, sum)
          }
        }
      }.toDF("doc_id", "out_w", "out_h", "grid_checksum")
  }
}
