package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batched executor-side
  * loops.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batch iteration — while the actual media decode is a STUB (this
  * container has no image/audio codecs): `decodeStub` derives
  * deterministic fake features from the payload bytes. Swapping in a
  * real decoder touches only [[decodeStub]]'s body; everything else
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

  /** STUB decoder — deterministic fake parse of the payload bytes.
    * ??? in spirit: replace with a real codec (JPEG/PNG/ffmpeg) when
    * available; signature and batch shape are the real contract. */
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

  /** Batched feature extraction: partitions stream through in
    * micro-batches of `batchSize` rows — the decoder-setup
    * amortization point. Parallelism = input partitions; repartition
    * upstream to size batches for executor memory (payloads are the
    * fat column — never collect them). */
  def extractFeatures(items: Dataset[MediaItem], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: init decoder once here, decode the batch vectorized
        batch.map(decodeStub)
      }
    }
  }

  /** End-to-end: pack + batch-decode, returning a plain DataFrame. */
  def features(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    extractFeatures(pack(df, idCol, textCol).as[MediaItem]).toDF()
  }
}
