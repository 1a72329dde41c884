package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Design: media is an opaque `BINARY` column plus a typed metadata struct
  * (`modality`, `mime`, `n_bytes`, and decoded shape fields). All pipeline
  * plumbing — schema, batching, partition-parallel decode, feature
  * columns — is real Spark; the codec calls themselves are STUBBED with
  * deterministic byte-level fakes because no image/audio libraries exist in
  * this container. Swapping `StubCodec` for a JNI/Python decoder changes no
  * operator shape: decode runs per-partition (`mapPartitions`-style via
  * flatMapGroups-free projection UDFs batched by Spark), so at 100 TB the
  * work is embarrassingly parallel and shuffle-free until an explicit
  * aggregation.
  */
object Multimodal {

  /** Typed media metadata carried beside the opaque binary column. */
  case class MediaMeta(modality: String, mime: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  /** STUB decode: a real implementation calls an image codec here. The
    * deterministic fake derives "dimensions" from the byte content so the
    * downstream plumbing (schema, nullability, batch shape) is exercised
    * honestly. */
  object StubCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 193), 64 + math.abs((h / 193) % 129))
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + bytes.length / 1024
    /** Fake feature vector: 8 moments of the byte histogram — deterministic
      * and content-sensitive, standing in for a CNN embedding. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      if (bytes.length > 0) {
        val n = math.max(1, bytes.length / dim)
        var j = 0
        while (j < dim) { out(j) /= n; j += 1 }
      }
      out
    }
  }

  private val decodeImageUdf = udf((bytes: Array[Byte], mime: String) =>
    if (bytes == null) null
    else {
      val (w, h) = StubCodec.imageDims(bytes)
      MediaMeta("image", mime, bytes.length.toLong, w, h, 1)
    })

  private val frameSampleUdf = udf((bytes: Array[Byte], everyN: Int) =>
    if (bytes == null) null
    else {
      val frames = StubCodec.frameCount(bytes)
      (0 until frames by math.max(1, everyN)).toArray
    })

  private val featureUdf = udf((bytes: Array[Byte], dim: Int) =>
    if (bytes == null) null else StubCodec.features(bytes, dim))

  /** Attach decoded metadata to a binary media column. Narrow — no shuffle;
    * decode cost spreads across partitions. */
  def decodeImage(df: DataFrame, binCol: String, mime: String): DataFrame =
    df.withColumn("media_meta", decodeImageUdf(col(binCol), lit(mime)))

  /** Sample every Nth frame index of a video column (stub: frame count is
    * derived from payload size; a real codec returns actual frames). */
  def frameSample(df: DataFrame, binCol: String, everyN: Int): DataFrame =
    df.withColumn("frame_indices", frameSampleUdf(col(binCol), lit(everyN)))

  /** Content-derived embedding column (stand-in for model inference). */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int): DataFrame =
    df.withColumn("features", featureUdf(col(binCol), lit(dim)))

  /** "Resize": a real pipeline re-encodes; the stub records the target box
    * in metadata and keeps bytes opaque — plumbing only. */
  def resize(df: DataFrame, metaCol: String, maxW: Int, maxH: Int): DataFrame =
    df.withColumn(metaCol,
      col(metaCol).withField("width", least(col(s"$metaCol.width"), lit(maxW)))
        .withField("height", least(col(s"$metaCol.height"), lit(maxH))))
}
