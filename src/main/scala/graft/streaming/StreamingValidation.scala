package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.constraint.ConstraintSet
import graft.engine.{EngineOptions, ValidationEngine}
import graft.table.{Manifest, SnapshotLog}

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

  /** Snapshot-committed micro-batch gate: all three outputs of a batch
    * become visible atomically through ONE SnapshotLog manifest — a crash
    * mid-batch leaves no partially visible output, the same all-or-nothing
    * the batch path provides (round-1 advisory: three independent appends
    * could surface a half-written batch). Idempotent on micro-batch replay:
    * a batch id already in the chain is skipped, so foreachBatch's
    * at-least-once re-delivery after restart stays exactly-once-visible.
    */
  def processAndCommit(log: SnapshotLog, cs: ConstraintSet, batch: DataFrame, batchId: Long): Option[Manifest] = {
    val head = log.head
    if (head.exists(m => log.committedPartitions(m).contains(batchId.toInt))) return None
    if (batch.isEmpty) return None // empty body -> 400 analog: nothing to produce

    val spark = batch.sparkSession
    val snapshotId = s"batch-$batchId"
    val res = new ValidationEngine(cs, EngineOptions(snapshotId = snapshotId)).process(batch)
    val tag = s"stream-$batchId"
    val annotatedPath = log.dataDir(tag, "annotated")
    val vioPath = log.dataDir(tag, "violations")
    val rollPath = log.dataDir(tag, "rollups")

    // ONE pass over the micro-batch (the batch job's produce shape): the
    // annotated frame is written partitioned by status; everything else
    // derives from the written table, not from re-running the pipeline.
    res.annotated.drop("_decode")
      .write.mode("overwrite").partitionBy("status").parquet(annotatedPath)
    val ann = spark.read.parquet(annotatedPath) // (status back as partition col)
    val rollups = ann
      .groupBy(col("partition_id"))
      .agg(
        count(when(col("status") === graft.model.Status.Success, 1)).as("n_success"),
        count(when(col("status") === graft.model.Status.Invalid, 1)).as("n_invalid"),
        count(when(col("status") === graft.model.Status.Error, 1)).as("n_error")
      )
      .select(lit(snapshotId).as("snapshot_id"), col("partition_id"),
        col("n_success"), col("n_invalid"), col("n_error"))
    rollups.coalesce(1).write.mode("overwrite").parquet(rollPath)
    val roll = spark.read.parquet(rollPath)
      .agg(
        coalesce(sum("n_success"), lit(0L)),
        coalesce(sum("n_invalid"), lit(0L)),
        coalesce(sum("n_error"), lit(0L))
      ).collect()(0)
    val (nS, nI, nE) = (roll.getLong(0), roll.getLong(1), roll.getLong(2))

    val failingDirs = Seq(graft.model.Status.Invalid -> nI, graft.model.Status.Error -> nE)
      .collect { case (st, n) if n > 0 => s"$annotatedPath/status=$st" }
    val vio =
      if (failingDirs.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          ValidationEngine.violationRowSchema)
      else
        ValidationEngine.violationRows(
          spark.read.option("basePath", annotatedPath).parquet(failingDirs: _*),
          snapshotId, "image_id")
    vio.write.mode("overwrite").parquet(vioPath)

    val validPaths =
      if (nS > 0) Seq(s"$annotatedPath/status=${graft.model.Status.Success}") else Seq.empty[String]
    val prev = head.map(_.metrics).getOrElse(Map.empty)
    Some(log.commit(Manifest(
      snapshotId = "",
      sequence = 0L,
      parentId = head.map(_.snapshotId),
      constraintVersion = cs.version,
      partitionSpec = "stream-batch",
      partitionsDelta = Seq(batchId.toInt),
      complete = false, // a stream is never complete
      tables = Map(
        "valid" -> validPaths,
        "annotated" -> Seq(annotatedPath),
        "violations" -> Seq(vioPath),
        "rollups" -> Seq(rollPath)
      ),
      metrics = Map(
        "n_success" -> (prev.getOrElse("n_success", 0L) + nS),
        "n_invalid" -> (prev.getOrElse("n_invalid", 0L) + nI),
        "n_error" -> (prev.getOrElse("n_error", 0L) + nE)
      ),
      sketches = head.map(_.sketches).getOrElse(Map.empty),
      createdAtMs = System.currentTimeMillis()
    )))
  }

  /** Snapshot-committed MULTI-STREAM micro-batch gate — the closest analog
    * of the reference service itself: an unbounded intake of heterogeneous
    * events, each validated against its own declared constraint set and
    * produced to its stream's destination
    * (/root/reference/lib/factories/default-eventgate.js:132-152 routing +
    * :242-278 per-topic produce), with each micro-batch's fan-out made
    * atomic through one manifest. Idempotent on replay like
    * [[processAndCommit]].
    */
  def processAndCommitMultiStream(
      log: graft.table.SnapshotLog,
      registry: graft.engine.ConstraintRegistry,
      batch: DataFrame,
      batchId: Long,
      streamCol: String = "stream",
      idField: String = "image_id"
  ): Option[Manifest] = {
    val head = log.head
    if (head.exists(m => log.committedPartitions(m).contains(batchId.toInt))) return None
    if (batch.isEmpty) return None // empty body -> 400 analog: nothing to produce

    val spark = batch.sparkSession
    val snapshotId = s"batch-$batchId"
    val res = new graft.engine.MultiStreamEngine(
      registry,
      EngineOptions(snapshotId = snapshotId, idField = idField),
      streamCol
    ).process(batch)
    val tag = s"stream-$batchId"
    val annotatedPath = log.dataDir(tag, "annotated")
    val vioPath = log.dataDir(tag, "violations")
    val rollPath = log.dataDir(tag, "rollups")
    // ONE pass: annotated written routed per (status, stream); rollups and
    // violations derive from the written table (partition-pruned reads).
    res.annotated.write.mode("overwrite").partitionBy("status", streamCol).parquet(annotatedPath)
    val ann = spark.read.parquet(annotatedPath)
    ann
      .groupBy(col(streamCol).as("stream"), col("partition_id"))
      .agg(
        count(when(col("status") === graft.model.Status.Success, 1)).as("n_success"),
        count(when(col("status") === graft.model.Status.Invalid, 1)).as("n_invalid"),
        count(when(col("status") === graft.model.Status.Error, 1)).as("n_error")
      )
      .select(lit(snapshotId).as("snapshot_id"), col("stream"), col("partition_id"),
        col("n_success"), col("n_invalid"), col("n_error"))
      .coalesce(1).write.mode("overwrite").parquet(rollPath)
    graft.engine.MultiStreamEngine
      .violationRows(ann.filter(col("status") =!= graft.model.Status.Success), snapshotId, idField, streamCol)
      .write.mode("overwrite").parquet(vioPath)
    val roll = spark.read.parquet(rollPath)
      .agg(
        coalesce(sum("n_success"), lit(0L)),
        coalesce(sum("n_invalid"), lit(0L)),
        coalesce(sum("n_error"), lit(0L))
      ).collect()(0)
    val prev = head.map(_.metrics).getOrElse(Map.empty)
    Some(log.commit(Manifest(
      snapshotId = "",
      sequence = 0L,
      parentId = head.map(_.snapshotId),
      constraintVersion = registry.sets.map(_.version).sorted.mkString(","),
      partitionSpec = "stream-batch",
      partitionsDelta = Seq(batchId.toInt),
      complete = false,
      tables = Map(
        "annotated" -> Seq(annotatedPath),
        "violations" -> Seq(vioPath),
        "rollups" -> Seq(rollPath)
      ),
      metrics = Map(
        "n_success" -> (prev.getOrElse("n_success", 0L) + roll.getLong(0)),
        "n_invalid" -> (prev.getOrElse("n_invalid", 0L) + roll.getLong(1)),
        "n_error" -> (prev.getOrElse("n_error", 0L) + roll.getLong(2))
      ),
      sketches = head.map(_.sketches).getOrElse(Map.empty),
      createdAtMs = System.currentTimeMillis()
    )))
  }

  /** File stream of heterogeneous events → multi-stream snapshotted gate. */
  def startMultiStream(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      registry: graft.engine.ConstraintRegistry,
      log: graft.table.SnapshotLog,
      checkpointDir: String,
      streamCol: String = "stream",
      idField: String = "image_id"
  ): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAndCommitMultiStream(log, registry, batch, batchId, streamCol, idField)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** File stream → snapshot-committed gate (the durable streaming face). */
  def startSnapshotted(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      cs: ConstraintSet,
      log: SnapshotLog,
      checkpointDir: String
  ): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAndCommit(log, cs, batch, batchId)
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
