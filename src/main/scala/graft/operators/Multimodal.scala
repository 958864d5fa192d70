package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition kernels
  * (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * NOTE: this container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked DETERMINISTIC STUB — it derives "metadata" from real
  * bytes of the payload. Everything around it (binary schema, typed
  * Dataset kernel boundary, partition-wise batching, feature vectors,
  * frame sampling) is the real Spark plumbing a production decode would
  * use: swap `fakeDecode` for an actual codec and nothing else changes.
  */
object Multimodal {

  final case class Asset(id: Long, media_type: String, content: Array[Byte])
  final case class Decoded(
      id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, checksum: Long)

  /** Deterministic synthetic assets derived from the documents table: the
    * text bytes become the opaque payload. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("id"),
      when(col("id") % 3 === 0, lit("image/png"))
        .when(col("id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      col("text").cast("binary").as("content"))

  /** STUB decoder — stands in for an image/audio codec. Reads real bytes,
    * produces deterministic pseudo-metadata. */
  def fakeDecode(a: Asset): Decoded = {
    val n = a.content.length
    val b0 = if (n > 0) a.content(0) & 0xff else 0
    val b1 = if (n > 1) a.content(1) & 0xff else 0
    var crc = 0L
    var i = 0
    while (i < n) { crc = (crc * 31 + (a.content(i) & 0xff)) & 0xffffffffL; i += 1 }
    Decoded(a.id, a.media_type, n,
      width = 16 + b0 % 112, height = 16 + b1 % 112,
      channels = if (a.media_type == "image/png") 3 else 1, checksum = crc)
  }

  /** Partition-wise decode: one kernel invocation per partition iterator —
    * the batch boundary a real codec (or JNI/native lib) wants. */
  def decode(spark: SparkSession, assets: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(fakeDecode))
  }

  /** Byte-histogram feature vector (real distributed byte math, no stub):
    * 16 buckets over the payload bytes, L1-normalized floats. */
  def byteHistogramFeatures(spark: SparkSession, assets: DataFrame, bins: Int = 16): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val h = new Array[Double](bins)
        a.content.foreach(b => h(((b & 0xff) * bins) / 256) += 1.0)
        val n = math.max(a.content.length, 1).toDouble
        (a.id, h.map(x => math.rint(x / n * 10000) / 10000))
      }
    }.toDF("id", "features")
  }

  /** Long-form byte histogram (id, bin, freq) — the oracle-checked face of
    * the multimodal path: REAL distributed byte math over the binary
    * payloads (no stub), emitted long-form with the roundHU ratio
    * convention so DuckDB can replay it. All `bins` rows are emitted per
    * asset (zeros included). */
  def byteHistogramLong(spark: SparkSession, assets: DataFrame, bins: Int = 16): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val h = new Array[Long](bins)
      a.content.foreach(b => h(((b & 0xff) * bins) / 256) += 1L)
      val n = math.max(a.content.length, 1).toDouble
      h.iterator.zipWithIndex.map { case (c, i) =>
        (a.id, i, math.floor(c / n * 10000.0 + 0.5) / 10000.0)
      }
    }.toDF("id", "bin", "freq")
  }

  /** Resize kernel: block-mean pooling of the payload to a fixed
    * `targetLen` bytes (the 1-D analogue of image resampling — a real
    * codec's resize slots in at exactly this kernel boundary). Block b
    * averages bytes [b·n/target, (b+1)·n/target); payloads shorter than
    * targetLen zero-pad. Deterministic integer math. */
  def resizeBytes(spark: SparkSession, assets: DataFrame, targetLen: Int = 32): DataFrame = {
    import spark.implicits._
    assets.as[Asset].map { a =>
      val n = a.content.length
      val out = new Array[Byte](targetLen)
      var b = 0
      while (b < targetLen) {
        val lo = b.toLong * n / targetLen
        val hi = (b + 1).toLong * n / targetLen
        if (hi > lo) {
          var s = 0L
          var i = lo
          while (i < hi) { s += (a.content(i.toInt) & 0xff); i += 1 }
          out(b) = (s / (hi - lo)).toByte
        }
        b += 1
      }
      (a.id, a.media_type, out)
    }.toDF("id", "media_type", "content")
  }

  /** Frame sampling plumbing: every `stride`-th byte as a "frame"
    * (id, media_type, frame_idx, frame_val). A real video pipeline samples
    * frames the same way — per-partition kernel emitting index + payload. */
  def frameSample(spark: SparkSession, assets: DataFrame, stride: Int = 32): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      Range(0, a.content.length, stride).map(i =>
        (a.id, a.media_type, i / stride, a.content(i) & 0xff))
    }.toDF("id", "media_type", "frame_idx", "frame_val")
  }
}
