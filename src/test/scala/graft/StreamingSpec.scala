package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.{EngineOptions, ImageConstraints, ValidationEngine}
import graft.gen.SyntheticImages
import graft.streaming.StreamingValidation

class StreamingSpec extends SparkSpec {

  test("foreachBatch gate: streaming output == batch engine output") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val imgs = SyntheticImages.images(spark, 1500, 3).toDF()
    imgs.write.mode("overwrite").parquet(src)

    val q = StreamingValidation.start(spark, src, imgs.schema, ImageConstraints.v1, out, ckpt)
    q.awaitTermination()

    val streamValid = spark.read.parquet(s"$out/valid")
    val batchValid = new ValidationEngine(ImageConstraints.v1, EngineOptions()).process(spark.read.parquet(src)).valid
    assert(streamValid.count() == batchValid.count())
    val a = streamValid.select("image_id").collect().map(_.toString).sorted
    val b = batchValid.select("image_id").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(spark.read.parquet(s"$out/rollups").agg(sum("n_invalid")).collect()(0).getLong(0) > 0)
  }

  test("restart with same checkpoint does not duplicate output") {
    val src = Files.createTempDirectory("graft_stream_src2").toString
    val out = Files.createTempDirectory("graft_stream_out2").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt2").toString
    val imgs = SyntheticImages.images(spark, 500, 2).toDF()
    imgs.write.mode("overwrite").parquet(src)
    val q1 = StreamingValidation.start(spark, src, imgs.schema, ImageConstraints.v1, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(s"$out/valid").count()
    // restart: no new files → no new micro-batch → no duplicates
    val q2 = StreamingValidation.start(spark, src, imgs.schema, ImageConstraints.v1, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$out/valid").count() == n1)
  }

  test("watermarked windowed counts over an event stream") {
    val src = Files.createTempDirectory("graft_stream_ev").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = StreamingValidation.windowedCounts(stream, "ts", "event_type", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Complete()).format("memory").queryName("win_counts").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT * FROM win_counts")
    assert(rows.count() > 0)
    val total = rows.agg(sum("n")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(src).count())
  }

  test("mapGroupsWithState accumulates per-key totals across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamingValidation
      .runningTotals(mem.toDS())
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("totals")
      .start()
    mem.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
    mem.addData(("a", 10L)); q.processAllAvailable()
    q.stop()
    val last = spark.sql("SELECT * FROM totals").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(last.contains(("a", 11L)), s"state not accumulated: ${last.mkString(",")}")
    assert(last.contains(("b", 2L)))
  }
}
