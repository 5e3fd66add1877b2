package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.constraint.ConstraintSet
import graft.engine.{EngineOptions, ValidationEngine}

/** Streaming face of the gate. The reference is an unbounded intake loop in
  * which each HTTP batch is processed independently
  * (/root/reference/routes/events.js:43-145, no cross-batch state) — the
  * exact shape of Structured Streaming `foreachBatch`: every micro-batch
  * goes through the same validate→triage→produce gate and its outputs are
  * appended under a per-batch snapshot id. Checkpointing gives the restart
  * semantics the reference gets from Kafka delivery confirmation.
  */
object StreamingValidation {

  /** Validate a file stream; write valid/violations/rollups per micro-batch. */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      cs: ConstraintSet,
      outDir: String,
      checkpointDir: String
  ): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val res = new ValidationEngine(cs, EngineOptions(snapshotId = s"batch-$batchId")).process(batch)
        res.valid.write.mode("append").parquet(s"$outDir/valid")
        res.violations.write.mode("append").parquet(s"$outDir/violations")
        res.rollups.write.mode("append").parquet(s"$outDir/rollups")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked windowed metrics over an event stream (the streaming
    * rollup analog: counts per window per key, late data bounded by the
    * watermark).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String, window_ : String, watermark: String): DataFrame =
    stream
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", watermark)
      .groupBy(window(col("_ts"), window_), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Custom-state example: running per-key totals across micro-batches via
    * mapGroupsWithState (KeyValueGroupedDataset), the engine's stateful
    * extension point.
    */
  def runningTotals(ds: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) { (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
        val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
        state.update(total)
        (key, total)
      }
  }
}
