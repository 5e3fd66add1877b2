package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.gen.SyntheticImages
import graft.gen.SyntheticImages.Plant

class GeneratorSpec extends SparkSpec {

  val N = 3000L

  test("generation is deterministic and partitioning-invariant") {
    import spark.implicits._
    val a = SyntheticImages
      .images(spark, N, 3)
      .map(r => (r.image_id, java.util.Arrays.hashCode(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash))
      .collect()
      .sortBy(_.toString)
    val b = SyntheticImages
      .images(spark, N, 7)
      .map(r => (r.image_id, java.util.Arrays.hashCode(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash))
      .collect()
      .sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("clean rows decode to declared dims; jpeg PSNR >= 40 dB") {
    val rows = (0L until 400L).map(i => (i, SyntheticImages.rowOf(i, drift = false, contentPool = 0)))
    val clean = rows.filter { case (i, _) =>
      !Plant.truncatedBytes(i) && !Plant.dimsMismatch(i) && !Plant.bigW(i) && !Plant.zeroW(i) && !Plant.negH(i)
    }
    assert(clean.nonEmpty)
    var jpegSeen = 0
    clean.foreach { case (i, r) =>
      val img = ImageIO.read(new ByteArrayInputStream(r.bytes))
      assert(img != null, s"row $i undecodable")
      assert(img.getWidth == r.w && img.getHeight == r.h, s"row $i dims")
      if (r.fmt == "jpeg") {
        jpegSeen += 1
        var sse = 0.0
        for (y <- 0 until r.h; x <- 0 until r.w) {
          val got = img.getRGB(x, y)
          val ref = SyntheticImages.pixelAt(i, r.w, r.h, x, y)
          for (k <- 0 until 3) {
            val d = ((got >> (k * 8)) & 0xff) - ((ref >> (k * 8)) & 0xff)
            sse += d.toDouble * d
          }
        }
        val psnr =
          if (sse == 0) Double.PositiveInfinity
          else 10.0 * math.log10(255.0 * 255.0 * (r.w.toLong * r.h * 3) / sse)
        assert(psnr >= 40.0, s"row $i fmt=jpeg psnr=$psnr")
      }
    }
    assert(jpegSeen > 10)
  }

  test("metaRowOf ≡ rowOf on every shared field (drift × pool × phash)") {
    for (drift <- Seq(false, true); pool <- Seq(0, 64)) {
      (0L until 1200L).foreach { i =>
        val full = SyntheticImages.rowOf(i, drift, pool)
        val meta = SyntheticImages.metaRowOf(i, drift, pool, withPhash = true)
        assert(meta.image_id == full.image_id && meta.w == full.w && meta.h == full.h &&
          meta.fmt == full.fmt && meta.caption == full.caption && meta.phash == full.phash,
          s"i=$i drift=$drift pool=$pool: $meta vs $full")
        // phash-free mode must agree on everything except phash
        val lite = SyntheticImages.metaRowOf(i, drift, pool, withPhash = false)
        assert(lite.copy(phash = meta.phash) == meta, s"i=$i drift=$drift pool=$pool lite")
      }
    }
  }

  test("image_id embeds a recoverable index and matches the uuid pattern") {
    val r = SyntheticImages.rowOf(12345L, drift = false, contentPool = 0)
    assert(r.image_id.matches(graft.engine.ImageConstraints.UuidRe))
    assert(SyntheticImages.indexOf(r.image_id).contains(12345L))
  }

  test("hot phash buckets hold ~20% of rows") {
    import spark.implicits._
    val df = SyntheticImages.images(spark, N, 4).toDF()
    val hot = df.filter(col("phash").isin(SyntheticImages.hotPhashes.toSeq: _*)).count()
    assert(math.abs(hot.toDouble / N - 0.2) < 0.02, s"hot fraction ${hot.toDouble / N}")
  }

  test("phash is content-diverse, not degenerate") {
    import spark.implicits._
    val df = SyntheticImages.images(spark, 1000, 4).toDF()
    val distinctCold = df
      .filter(!col("phash").isin(SyntheticImages.hotPhashes.toSeq: _*))
      .select("phash")
      .distinct()
      .count()
    assert(distinctCold > 100, s"only $distinctCold distinct cold phashes")
  }

  test("captions table plants orphans and dangling rows") {
    val caps = SyntheticImages.captions(spark, N, 4)
    val dangling = caps.filter(col("image_id").startsWith("dangling-")).count()
    assert(dangling == (0L until N).count(Plant.danglingCaption))
    // planted image orphans: images whose id never appears in captions
    val imgs = SyntheticImages.images(spark, N, 4).toDF()
    val orphans = imgs
      .filter(col("image_id").isNotNull)
      .join(caps, Seq("image_id"), "left_anti")
      .count()
    assert(orphans >= (0L until N).count(i => Plant.orphanImage(i) && !Plant.nullId(i) && !Plant.dupId(i) && !Plant.badPatternId(i)))
  }
}
