package graft.table

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.constraint.ConstraintSet
import graft.engine.{ConstraintRegistry, EngineOptions, MultiStreamEngine, ValidationEngine}
import graft.model.Status

/** The heterogeneous-batch validate-then-produce job: rows declare their
  * stream, the registry dispatches each to its compiled constraint set, and
  * VALID OUTPUT IS ROUTED PER STREAM — the reference's "produce each event
  * to its stream's topic" (/root/reference/lib/factories/
  * default-eventgate.js:242-278) with the Guaranteed-producer contract: all
  * streams' outputs for a batch become visible through ONE atomic manifest
  * or not at all.
  *
  * Execution shape per batch of `commitBatch` partitions:
  *  1. ONE full pass writes the annotated frame partitioned by
  *     (status, stream) — the valid table is the status=success subtree,
  *     already laid out one directory per stream.
  *  2. Rollups per (stream, partition) aggregate over the WRITTEN annotated
  *     table — a columnar re-read that touches only the partition
  *     directories plus one narrow column, not the data.
  *  3. Violations are derived from the written failing slice only and
  *     re-ingested through the error-schema gate
  *     (/root/reference/lib/eventgate.js:243-270).
  *  4. One manifest commit (delta file lists, duration metrics).
  *
  * Resume semantics are identical to [[ValidationJob]]: a killed run skips
  * every partition already in the chain's committed set.
  */
final class MultiStreamValidationJob(
    spark: SparkSession,
    log: SnapshotLog,
    registry: ConstraintRegistry,
    streamCol: String = "stream",
    idField: String = "image_id",
    partitionSpec: String = "explicit",
    suppressViolations: Option[Column] = None,
    commitBatch: Int = 8,
    violationsSchema: Option[ConstraintSet] = Some(ValidationJob.violationsSchemaV1)
) {
  require(commitBatch >= 1, "commitBatch must be >= 1")

  def run(inputFor: Int => DataFrame, partitions: Seq[Int]): Manifest = {
    var current = log.head
    val done = current.map(log.committedPartitions).getOrElse(Set.empty[Int])
    val todo = partitions.filterNot(done)

    for (batch <- todo.grouped(commitBatch)) {
      val wallMs = scala.collection.mutable.Map.empty[String, Long]
      def phase[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        try body
        finally wallMs(name) = wallMs.getOrElse(name, 0L) + (System.nanoTime() - t0) / 1000000L
      }

      val snapshotId = current.map(_.snapshotId).getOrElse("snap-00000000")
      val opts = EngineOptions(snapshotId = snapshotId, idField = idField, partitionIdCol = col("_pid"))
      val tagged = batch.map(p => inputFor(p).withColumn("_pid", lit(p))).reduce(_.unionByName(_))
      val res = new MultiStreamEngine(registry, opts, streamCol).process(tagged)

      val tag = batch.mkString("_")
      val annotatedPath = log.dataDir(tag, "annotated")
      val vioPath = log.dataDir(tag, "violations")
      val rollPath = log.dataDir(tag, "rollups")

      // 1. the single full pass, routed by (status, stream)
      phase("write_annotated") {
        res.annotated.drop("_pid")
          .write.mode("overwrite").partitionBy("status", streamCol).parquet(annotatedPath)
      }

      // 2. rollups from the WRITTEN table: (status, stream) come back as
      // partition columns, so this scan reads one narrow data column.
      val ann = spark.read.parquet(annotatedPath)
      val rollups = ann
        .groupBy(col(streamCol).as("stream"), col("partition_id"))
        .agg(
          count(when(col("status") === Status.Success, 1)).as("n_success"),
          count(when(col("status") === Status.Invalid, 1)).as("n_invalid"),
          count(when(col("status") === Status.Error, 1)).as("n_error")
        )
        .select(lit(snapshotId).as("snapshot_id"), col("stream"), col("partition_id"),
          col("n_success"), col("n_invalid"), col("n_error"))
      phase("write_rollups") {
        rollups.coalesce(1).write.mode("overwrite").parquet(rollPath)
      }
      val counts = spark.read.parquet(rollPath)
        .agg(
          coalesce(sum("n_success"), lit(0L)),
          coalesce(sum("n_invalid"), lit(0L)),
          coalesce(sum("n_error"), lit(0L))
        ).collect()(0)
      val (nS, nI, nE) = (counts.getLong(0), counts.getLong(1), counts.getLong(2))

      // 3. violations from the failing slice only, then the re-ingest gate
      val failing = ann.filter(col("status") =!= Status.Success) // partition-pruned scan
      val vioSource = MultiStreamEngine.violationRows(failing, snapshotId, idField, streamCol)
      val kept = suppressViolations.fold(vioSource)(vioSource.filter)
      val rejectedObs = Observation(s"msgate_$tag")
      val gated = violationsSchema match {
        case None => kept
        case Some(schema) =>
          val asEvents = kept.withColumnRenamed("status", "violation_status")
          val gateRes = new ValidationEngine(
            schema,
            EngineOptions(snapshotId = snapshotId, idField = "row_id", partitionIdCol = col("partition_id"))
          ).process(asEvents)
          gateRes.annotated
            .observe(rejectedObs, count(when(col("status") =!= Status.Success, 1)).as("rejected"))
            .filter(col("status") === Status.Success)
            .select(kept.columns.map(c => if (c == "status") col("violation_status").as("status") else col(c)): _*)
      }
      phase("write_violations") {
        gated.write.mode("overwrite").parquet(vioPath)
      }
      val rejected: Long =
        if (violationsSchema.isEmpty) 0L
        else rejectedObs.get.get("rejected").map(_.asInstanceOf[Long]).getOrElse(0L)

      // 4. one atomic commit for every stream's output
      val prevMetrics = current.map(_.metrics).getOrElse(Map.empty)
      val committedSoFar = current.map(log.committedPartitions).getOrElse(Set.empty) ++ batch
      current = Some(
        log.commit(
          Manifest(
            snapshotId = "",
            sequence = 0L,
            parentId = current.map(_.snapshotId),
            constraintVersion = registry.sets.map(_.version).sorted.mkString(","),
            partitionSpec = partitionSpec,
            partitionsDelta = batch,
            complete = partitions.toSet.subsetOf(committedSoFar),
            // valid rows are the status=success slice of `annotated` — read
            // through readValid (a partition-pruned filter), not a separate
            // path list: multi-root parquet reads of key=value-suffixed
            // directories confuse partition discovery, while each annotated
            // root is a self-contained (status, stream)-partitioned table.
            tables = Map(
              "annotated" -> Seq(annotatedPath),
              "violations" -> Seq(vioPath),
              "rollups" -> Seq(rollPath)
            ),
            metrics = Map(
              "n_success" -> (prevMetrics.getOrElse("n_success", 0L) + nS),
              "n_invalid" -> (prevMetrics.getOrElse("n_invalid", 0L) + nI),
              "n_error" -> (prevMetrics.getOrElse("n_error", 0L) + nE),
              "violations_rejected" -> (prevMetrics.getOrElse("violations_rejected", 0L) + rejected)
            ) ++ wallMs.map { case (k, v) =>
              s"wall_ms_$k" -> (prevMetrics.getOrElse(s"wall_ms_$k", 0L) + v)
            },
            sketches = current.map(_.sketches).getOrElse(Map.empty),
            createdAtMs = System.currentTimeMillis()
          )
        )
      )
    }
    current.getOrElse(throw new IllegalStateException("nothing to commit: no partitions"))
  }
}

object MultiStreamValidationJob {

  /** The valid table: the status=success slice of the annotated table.
    * The status filter is a partition-column predicate, so the scan prunes
    * to the success directories — identical I/O to listing them explicitly.
    */
  def readValid(spark: SparkSession, log: SnapshotLog, m: Manifest): DataFrame =
    log.readTable(spark, m, "annotated").filter(col("status") === Status.Success)
}
