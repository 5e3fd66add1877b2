package graft.table

import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.constraint.ConstraintSet
import graft.engine.{EngineOptions, PixelChecks, ValidationEngine}
import graft.sketch.{ColumnProfiler, Sketches}

/** The full validate-then-produce job over a snapshotted table, resumable
  * from the last checkpointed partition set (north_rule).
  *
  * Execution contract:
  *  - the caller provides `inputFor(partition)` — explicit partition-pruned
  *    input (with a manifest-backed source this is file-list construction,
  *    not a post-scan filter: SURVEY §4 "pruning is explicit");
  *  - each partition is processed in ONE pass (validate → triage → write
  *    valid/violations/rollups) and then committed as a snapshot increment;
  *  - a killed job re-run skips every partition already in
  *    `head.committedPartitions` — only unfinished work reprocesses;
  *  - column-statistic sketches accumulate across commits by sketch merge,
  *    so the final manifest carries whole-table statistics (drift baseline).
  *
  * This strengthens the reference's fire-and-forget error re-ingest
  * (/root/reference/lib/eventgate.js:243-270) into a durable write, while
  * keeping suppression semantics: `suppressViolations` drops violation rows
  * the way a null `mapToErrorEvent` drops error events
  * (/root/reference/lib/eventgate.js:260).
  */
final class ValidationJob(
    spark: SparkSession,
    log: SnapshotLog,
    cs: ConstraintSet,
    pixelChecks: Option[PixelChecks] = None,
    partitionSpec: String = "explicit",
    profileColumns: Boolean = true,
    /** keep-predicate over violation rows; None keeps all. */
    suppressViolations: Option[Column] = None
) {

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  private val sketchMergers: Map[String, (Array[Byte], Array[Byte]) => Array[Byte]] = Map(
    "hll_image_id" -> Sketches.hllMerge,
    "hll_phash" -> Sketches.hllMerge,
    "td_w" -> Sketches.tdMerge,
    "td_h" -> Sketches.tdMerge,
    "freq_fmt" -> Sketches.freqStringMerge,
    "freq_phash" -> Sketches.freqLongMerge
  )

  def run(inputFor: Int => DataFrame, partitions: Seq[Int]): Manifest = {
    var current = log.head
    val done = current.map(_.committedPartitions.toSet).getOrElse(Set.empty[Int])
    val todo = partitions.filterNot(done)

    for (p <- todo) {
      val opts = EngineOptions(
        snapshotId = current.map(_.snapshotId).getOrElse("snap-00000000"),
        pixelChecks = pixelChecks,
        partitionIdCol = lit(p)
      )
      val res = new ValidationEngine(cs, opts).process(inputFor(p))

      val validPath = log.dataDir(p, "valid")
      val vioPath = log.dataDir(p, "violations")
      val rollPath = log.dataDir(p, "rollups")
      res.valid.write.mode("overwrite").parquet(validPath)
      val vio = suppressViolations.fold(res.violations)(res.violations.filter)
      vio.write.mode("overwrite").parquet(vioPath)
      res.rollups.write.mode("overwrite").parquet(rollPath)

      // partition metrics from the written rollups (tiny)
      val roll = spark.read.parquet(rollPath).agg(
        coalesce(sum("n_success"), lit(0L)),
        coalesce(sum("n_invalid"), lit(0L)),
        coalesce(sum("n_error"), lit(0L))
      ).collect()(0)
      val (nS, nI, nE) = (roll.getLong(0), roll.getLong(1), roll.getLong(2))

      val newSketches: Map[String, String] =
        if (!profileColumns) Map.empty
        else {
          val prof = ColumnProfiler.profile(spark.read.parquet(validPath))
          Map(
            "hll_image_id" -> b64(prof.hllImageId),
            "hll_phash" -> b64(prof.hllPhash),
            "td_w" -> b64(prof.tdW),
            "td_h" -> b64(prof.tdH),
            "freq_fmt" -> b64(prof.freqFmt),
            "freq_phash" -> b64(prof.freqPhash)
          )
        }

      val prevMetrics = current.map(_.metrics).getOrElse(Map.empty)
      val prevSketches = current.map(_.sketches).getOrElse(Map.empty)
      val prevTables = current.map(_.tables).getOrElse(Map.empty)
      val mergedSketches = (prevSketches.keySet ++ newSketches.keySet).map { k =>
        k -> ((prevSketches.get(k), newSketches.get(k)) match {
          case (Some(a), Some(b)) => b64(sketchMergers(k)(unb64(a), unb64(b)))
          case (Some(a), None)    => a
          case (None, Some(b))    => b
          case _                  => throw new IllegalStateException("unreachable")
        })
      }.toMap

      val committed = current.map(_.committedPartitions).getOrElse(Seq.empty) :+ p
      current = Some(
        log.commit(
          Manifest(
            snapshotId = "", // assigned by commit
            sequence = 0L,
            parentId = current.map(_.snapshotId),
            constraintVersion = cs.version,
            partitionSpec = partitionSpec,
            committedPartitions = committed,
            complete = partitions.toSet.subsetOf(committed.toSet),
            tables = Map(
              "valid" -> (prevTables.getOrElse("valid", Seq.empty) :+ validPath),
              "violations" -> (prevTables.getOrElse("violations", Seq.empty) :+ vioPath),
              "rollups" -> (prevTables.getOrElse("rollups", Seq.empty) :+ rollPath)
            ),
            metrics = Map(
              "n_success" -> (prevMetrics.getOrElse("n_success", 0L) + nS),
              "n_invalid" -> (prevMetrics.getOrElse("n_invalid", 0L) + nI),
              "n_error" -> (prevMetrics.getOrElse("n_error", 0L) + nE)
            ),
            sketches = mergedSketches,
            createdAtMs = System.currentTimeMillis()
          )
        )
      )
    }
    current.getOrElse(throw new IllegalStateException("nothing to commit: no partitions"))
  }
}
