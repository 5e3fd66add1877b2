package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column operators: media as opaque `binary` columns with typed
  * metadata, processed by batch-shaped functions so the Spark-side plumbing
  * (schema, partitioning, batch iteration) is the real thing.
  *
  * Image decode / feature-extract / resize are REAL (JDK javax.imageio —
  * available in this container). Audio/video decoding libraries are NOT in
  * the container, so those decoders are STUBS behind the same plumbing: a
  * deterministic fake that parses our own byte layout. Swap the stub body
  * for ffmpeg/javacv bindings in a real deployment; nothing else changes.
  */
object Multimodal {

  // ------------------------------------------------------------- images ----

  final case class ImageFeatures(ok: Boolean, w: Int, h: Int, mean_luma: Double, ahash: Long, err: String)

  /** Decode + feature-extract. One UDF call per row in the scan stage; the
    * output struct is all a downstream pipeline needs, so `bytes` never
    * travels past the scan.
    */
  val imageFeatures = udf { bytes: Array[Byte] =>
    if (bytes == null) ImageFeatures(ok = false, -1, -1, 0.0, 0L, "null bytes")
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) ImageFeatures(ok = false, -1, -1, 0.0, 0L, "undecodable")
        else {
          var sum = 0.0
          val cell = new Array[Double](64)
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              sum += lum
              cell((y * 8 / h) * 8 + (x * 8 / w)) += lum
              x += 1
            }
            y += 1
          }
          val mean = cell.sum / 64
          var bits = 0L; var k = 0
          while (k < 64) { if (cell(k) > mean) bits |= (1L << k); k += 1 }
          ImageFeatures(ok = true, w, h, sum / (w.toLong * h), bits, null)
        }
      } catch { case e: Exception => ImageFeatures(ok = false, -1, -1, 0.0, 0L, e.getClass.getSimpleName) }
  }

  /** REAL resize (Graphics2D bilinear) → re-encoded PNG bytes. */
  val resizePng = udf { (bytes: Array[Byte], tw: Int, th: Int) =>
    if (bytes == null) null
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
          )
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          ImageIO.write(out, "png", baos)
          baos.toByteArray
        }
      } catch { case _: Exception => null }
  }

  // -------------------------------------------------------------- audio ----

  final case class AudioFeatures(ok: Boolean, n_samples: Int, mean_amp: Double, rms: Double, err: String)

  /** STUB DECODER: interprets the binary as 16-bit little-endian PCM.
    * A real deployment replaces the body with an actual codec; the Spark
    * surface (binary in → typed feature struct out, evaluated in the scan
    * stage) is the production shape.
    */
  val audioFeatures = udf { bytes: Array[Byte] =>
    if (bytes == null || bytes.length < 2) AudioFeatures(ok = false, 0, 0.0, 0.0, "null/short bytes")
    else {
      val n = bytes.length / 2
      var sum = 0.0; var sq = 0.0; var i = 0
      while (i < n) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toDouble / 32768.0
        sum += s; sq += s * s; i += 1
      }
      AudioFeatures(ok = true, n, sum / n, math.sqrt(sq / n), null)
    }
  }

  // -------------------------------------------------------------- video ----

  /** STUB frame sampler: treats the binary as fixed-size "frames" of
    * `frameBytes` and emits every `stride`-th frame with its offset — the
    * explode-shaped plumbing (one media row → N frame rows) of a real
    * frame sampler. Runs as pure Columns; only the "decode" is fake.
    */
  def sampleFrames(df: DataFrame, bytesCol: String, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = (length(col(bytesCol)) / frameBytes).cast("int")
    df.withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame", col(bytesCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .withColumn("frame_hash", xxhash64(col("frame")))
      .drop(bytesCol)
  }
}
