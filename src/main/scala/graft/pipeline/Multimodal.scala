package graft.pipeline

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Design: media is an opaque `BINARY` column plus a typed metadata struct
  * (`modality`, `mime`, `n_bytes`, and decoded shape fields). All pipeline
  * plumbing — schema, batching, partition-parallel decode, feature
  * columns — is real Spark. IMAGE decode is REAL for every format the
  * JDK ships a reader for (PNG/JPEG/GIF/BMP via `javax.imageio`):
  * dimensions come from the stream header (no pixel decode), channel
  * means from the decoded raster. Payloads no JDK reader recognizes —
  * and audio/video, where the container has no codec libraries — fall
  * back to [[StubCodec]]'s deterministic byte-level fakes so the
  * operator shape stays exercised. Decode runs per-partition inside
  * projection UDFs, so at 100 TB the work is embarrassingly parallel
  * and shuffle-free until an explicit aggregation.
  */
object Multimodal {

  /** Typed media metadata carried beside the opaque binary column. */
  case class MediaMeta(modality: String, mime: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  /** Real JDK image codec. `imageDims` reads width/height from the
    * stream header via the format's `ImageReader` — O(header bytes),
    * not O(pixels) — which is what a 100 TB metadata pass wants.
    * `channelMeans` decodes the raster (use on sampled subsets). */
  object JdkCodec {
    // ImageIO's stream cache defaults to DISK (a temp file created and
    // deleted per createImageInputStream call — ~0.5 ms of filesystem
    // churn per ROW in the decode stage, measured round 18). The inputs
    // here are in-memory byte arrays; cache in memory instead. JVM-global
    // by API design, set once; nothing else in this process reads images
    // from non-seekable streams where the disk cache would matter.
    ImageIO.setUseCache(false)
    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(in); Some((r.getWidth(0), r.getHeight(0))) }
          catch { case _: Exception => None }
          finally r.dispose()
        }
      } finally in.close()
    }

    /** Per-channel (R, G, B) means in [0, 1]; None if not an image. */
    def channelMeans(bytes: Array[Byte]): Option[Array[Double]] =
      try {
        Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
          val sums = new Array[Double](3)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sums(0) += ((rgb >> 16) & 0xff) / 255.0
              sums(1) += ((rgb >> 8) & 0xff) / 255.0
              sums(2) += (rgb & 0xff) / 255.0
              x += 1
            }
            y += 1
          }
          val n = (img.getWidth * img.getHeight).toDouble
          sums.map(_ / n)
        }
      } catch { case _: Exception => None }

    /** Deterministic PNG fixture: `w`×`h`, pixels derived from `seed`
      * (for specs and fixture-generating queries — real bytes a real
      * decoder must agree with). */
    def encodePng(w: Int, h: Int, seed: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = if (seed.nonEmpty) seed(i % seed.length) & 0xff else 0
          img.setRGB(x, y, (b << 16) | (((x * 31 + y) & 0xff) << 8) | b)
          i += 1; x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** STUB decode for payloads no JDK reader recognizes (and for the
    * audio/video modalities — no codec libraries in this container).
    * The deterministic fake derives "dimensions" from the byte content
    * so the downstream plumbing stays exercised honestly. */
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
      // real decode first; byte-level stub only when no reader matches
      val (w, h) = JdkCodec.imageDims(bytes)
        .getOrElse(StubCodec.imageDims(bytes))
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

  private val channelMeansUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) null else JdkCodec.channelMeans(bytes).orNull)

  /** Attach decoded metadata to a binary media column. Narrow — no shuffle;
    * decode cost spreads across partitions. Dimensions are REAL for any
    * format the JDK reads (header-only, no pixel decode). */
  def decodeImage(df: DataFrame, binCol: String, mime: String): DataFrame =
    df.withColumn("media_meta", decodeImageUdf(col(binCol), lit(mime)))

  /** Per-channel pixel means (real raster decode — run on samples). */
  def channelStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("channel_means", channelMeansUdf(col(binCol)))

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
