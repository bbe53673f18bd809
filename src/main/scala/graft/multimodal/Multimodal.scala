package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batched executor-side
  * loops.
  *
  * Image payloads decode for REAL via the JDK's `javax.imageio`
  * (PNG/JPEG/GIF/BMP ship with the JVM — no external codecs): true
  * width/height plus a bounded-cost pixel-content fingerprint.
  * Payloads ImageIO can't parse (audio/video/unknown — codecs this
  * container lacks) fall back to [[decodeStub]], a deterministic fake
  * parse of the payload bytes, keeping the pipeline total. Swapping in
  * further codecs touches only the decode dispatch; everything else
  * (the `mapPartitions` batching, the output schema, the pipeline
  * wiring) stays.
  *
  * In Python the equivalent surface is a pandas UDF over
  * `mapInPandas`; the Scala-native equivalent used here is
  * `mapPartitions` over a typed Dataset with explicit micro-batches,
  * which gives the same amortize-per-batch-setup behavior (decoder
  * init once per batch, not once per row).
  */
object Multimodal {

  /** One media item: opaque payload + metadata. */
  final case class MediaItem(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      byte_len: Long)

  /** Extracted features (stub-decoded). */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feat_hash: Long)

  /** Pack a text column as a fake media payload (UTF-8 bytes) with
    * metadata — stands in for reading real image/audio blobs. */
  def pack(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("bigint").as("doc_id"),
      lit("image/stub").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      octet_length(col(textCol)).cast("bigint").as("byte_len"))

  /** Magic-byte media-type sniff for real binary payloads (the
    * JDK-decodable image formats plus octet-stream fallthrough). */
  def sniffMediaType(payload: Array[Byte]): String = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xFF else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
    else if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "image/jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "image/gif"
    else if (at(0) == 'B' && at(1) == 'M') "image/bmp"
    else "application/octet-stream"
  }

  /** Pack a real binary column (actual image/audio blobs) with sniffed
    * media type — the production twin of [[pack]]. Null payloads sniff
    * to octet-stream rather than crashing the task. */
  def packBinary(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val sniff = udf((b: Array[Byte]) =>
      if (b == null) "application/octet-stream" else sniffMediaType(b))
    df.select(
      col(idCol).cast("bigint").as("doc_id"),
      sniff(col(binCol)).as("media_type"),
      col(binCol).as("payload"),
      octet_length(col(binCol)).cast("bigint").as("byte_len"))
  }

  /** Deterministic bounded-cost content fingerprint: FNV-1a over an
    * 8×8 grid sample of ARGB pixels — O(1) per image regardless of
    * resolution, so a 100-megapixel payload costs the same as a
    * thumbnail. */
  def pixelHash(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val bb = java.nio.ByteBuffer.allocate(8 * 8 * 4)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        bb.putInt(im.getRGB(gx * w / 8, gy * h / 8))
        gx += 1
      }
      gy += 1
    }
    Hashing.mix64(Hashing.fnv64(bb.array()))
  }

  /** Refuse to materialize images above this pixel count: a payload
    * whose magic bytes match an image format but whose header is
    * garbage (e.g. text starting with "GIF8" or "BM") can declare a
    * bogus multi-gigapixel size and the decoder would try to allocate
    * it. Header dimensions are read FIRST (cheap, no pixel decode)
    * and checked against this bound. */
  val maxDecodePixels: Long = 64L * 1000 * 1000

  /** Real image decode via `javax.imageio` (JDK-only; PNG/JPEG/GIF/
    * BMP). None when the payload isn't a decodable image, when its
    * header declares an implausible size, or when the plugin throws
    * ANY non-fatal exception (ImageIO readers throw runtime
    * exceptions, not just IOException, on malformed input) — the
    * caller falls back to the stub so the pipeline stays total. */
  def tryDecodeImage(item: MediaItem): Option[MediaFeatures] =
    try {
      if (item.payload == null) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(item.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              if (w <= 0 || h <= 0 || w.toLong * h > maxDecodePixels) None
              else {
                val im = reader.read(0)
                Some(MediaFeatures(
                  doc_id = item.doc_id,
                  byte_len = item.byte_len,
                  width = w,
                  height = h,
                  n_frames = 1,
                  feat_hash = pixelHash(im)))
              }
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder for non-image payloads — deterministic fake parse of
    * the payload bytes. Audio/video codecs aren't in this container;
    * when they are, add a tryDecode* sibling and extend [[decode]]'s
    * dispatch — signature and batch shape are the real contract. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val h = Hashing.mix64(Hashing.fnv64(item.payload))
    MediaFeatures(
      doc_id = item.doc_id,
      byte_len = item.byte_len,
      width = 64 + (math.abs(h) % 1920).toInt,
      height = 64 + (math.abs(h >>> 11) % 1080).toInt,
      n_frames = 1 + (math.abs(h >>> 23) % 32).toInt,
      feat_hash = h)
  }

  /** Decode dispatch: real ImageIO parse first, stub fallback. */
  def decode(item: MediaItem): MediaFeatures =
    tryDecodeImage(item).getOrElse(decodeStub(item))

  /** Batched feature extraction: partitions stream through in
    * micro-batches of `batchSize` rows — the decoder-setup
    * amortization point. Parallelism = input partitions; repartition
    * upstream to size batches for executor memory (payloads are the
    * fat column — never collect them). */
  def extractFeatures(items: Dataset[MediaItem], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-task decoder setup: keep ImageIO off its disk-backed
      // stream cache (executor temp dirs) — decode stays in-memory
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        // per-batch amortization point: heavier codecs init here once
        batch.map(decode)
      }
    }
  }

  /** End-to-end: pack + batch-decode, returning a plain DataFrame. */
  def features(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    extractFeatures(pack(df, idCol, textCol).as[MediaItem]).toDF()
  }
}
