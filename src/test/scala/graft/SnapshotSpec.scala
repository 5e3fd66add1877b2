package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.ImageConstraints
import graft.gen.SyntheticImages
import graft.sketch.Sketches
import graft.table.{SnapshotLog, ValidationJob}

class SnapshotSpec extends SparkSpec {

  val N = 3000L
  val P = 4

  /** partition p = rows with index ≡ p (mod P) — deterministic pruned input. */
  private def inputFor(p: Int): DataFrame = {
    import spark.implicits._
    val (pLocal, mod) = (p.toLong, P.toLong) // locals only: lambdas must not capture the suite
    spark
      .range(0, N, 1, 2)
      .as[Long]
      .filter(i => (i % mod) == pLocal)
      .map(i => SyntheticImages.rowOf(i, drift = false, contentPool = 0))
      .toDF()
  }

  private def newLog(): SnapshotLog = {
    val dir = Files.createTempDirectory("graft_snap").toString
    new SnapshotLog(dir, spark.sparkContext.hadoopConfiguration)
  }

  test("atomic commit: sequences increase; HEAD reads back the manifest") {
    val log = newLog()
    val job = new ValidationJob(spark, log, ImageConstraints.v1)
    val m = job.run(inputFor, Seq(0, 1))
    assert(m.sequence == 2) // one commit per partition checkpoint
    assert(m.committedPartitions.sorted == Seq(0, 1))
    assert(m.complete) // complete w.r.t. THIS run's target partition set
    val h = log.head.get
    assert(h.snapshotId == m.snapshotId)
    assert(h.constraintVersion == ImageConstraints.v1.version)
    assert(h.metrics("n_success") > 0)
  }

  test("killed job resumes from the last checkpointed partition set") {
    val log = newLog()
    var calls = Vector.empty[Int]
    def countingInput(p: Int): DataFrame = { calls :+= p; inputFor(p) }
    def failingInput(p: Int): DataFrame = {
      if (p == 2) throw new RuntimeException("simulated kill")
      countingInput(p)
    }
    val job1 = new ValidationJob(spark, log, ImageConstraints.v1)
    intercept[RuntimeException](job1.run(failingInput, Seq(0, 1, 2, 3)))
    assert(log.head.get.committedPartitions.sorted == Seq(0, 1))

    // resume: only 2 and 3 are reprocessed
    calls = Vector.empty
    val m = new ValidationJob(spark, log, ImageConstraints.v1).run(countingInput, Seq(0, 1, 2, 3))
    assert(calls == Vector(2, 3), s"reprocessed $calls")
    assert(m.complete)
    assert(m.committedPartitions.sorted == Seq(0, 1, 2, 3))

    // final state identical to a clean run
    val cleanLog = newLog()
    val clean = new ValidationJob(spark, cleanLog, ImageConstraints.v1).run(inputFor, Seq(0, 1, 2, 3))
    val a = log.readTable(spark, m, "valid").select("image_id").collect().map(_.toString).sorted
    val b = cleanLog.readTable(spark, clean, "valid").select("image_id").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(m.metrics == clean.metrics)
  }

  test("uncommitted partition outputs are invisible through the manifest") {
    val log = newLog()
    val m = new ValidationJob(spark, log, ImageConstraints.v1).run(inputFor, Seq(0))
    // partition 1's data dir may not exist yet; the manifest only lists p=0
    assert(m.tables("valid").forall(_.contains("p=0")))
    val n = log.readTable(spark, m, "valid").count()
    val expect = spark.range(0, N).filter(col("id") % P === 0).count()
    assert(n <= expect) // only p=0 rows, minus invalid/error
    assert(n > expect * 8 / 10)
  }

  test("manifest sketches accumulate to whole-table statistics") {
    val log = newLog()
    val m = new ValidationJob(spark, log, ImageConstraints.v1).run(inputFor, Seq(0, 1, 2, 3))
    val hll = java.util.Base64.getDecoder.decode(m.sketches("hll_image_id"))
    val est = Sketches.hllEstimate(hll)
    val exact = log.readTable(spark, m, "valid").select("image_id").distinct().count()
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
    // lineage chain: parent ids link back
    val h = log.head.get
    assert(h.parentId.isDefined)
  }

  test("violation suppression drops rows like a null mapToErrorEvent") {
    val log = newLog()
    val job = new ValidationJob(
      spark,
      log,
      ImageConstraints.v1,
      suppressViolations = Some(col("constraint_id") =!= "whitelist(fmt)")
    )
    val m = job.run(inputFor, Seq(0, 1, 2, 3))
    val v = log.readTable(spark, m, "violations")
    assert(v.filter(col("constraint_id") === "whitelist(fmt)").count() == 0)
    assert(v.count() > 0)
  }
}
