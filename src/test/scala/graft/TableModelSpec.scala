package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{Maintenance, Manifest, SnapshotLog}

/** Model-based randomized lifecycle test: arbitrary interleavings of
  * commit / selective-or-full compact / checkpoint / rollback / expire must
  * keep every read equal to a trivial in-memory model. The model is the
  * ground truth a user holds in their head: "the table is exactly the rows
  * of the commits on HEAD's lineage" — if any maintenance op breaks that,
  * this finds the interleaving.
  */
class TableModelSpec extends SparkSpec {

  private case class Committed(seq: Long, rows: Range)

  test("random maintenance interleavings preserve the committed-row model") {
    for (trial <- 1 to 6) {
      val rnd = new scala.util.Random(7001 + trial)
      val dir = Files.createTempDirectory(s"graft_model_$trial").toString
      val log = new SnapshotLog(dir, spark.sparkContext.hadoopConfiguration)

      var model = Vector.empty[Committed] // commits on HEAD's lineage, in order
      var nextId = 0
      var checkpointed = false // at least one checkpoint since the last structural op

      def commitRows(): Unit = {
        val n = 50 + rnd.nextInt(150)
        val rows = nextId until (nextId + n)
        nextId += n
        val seq = log.head.map(_.sequence + 1).getOrElse(1L)
        val root = log.dataDir(f"$seq%08d", "docs")
        spark.range(rows.start.toLong, rows.end.toLong, 1, 1 + rnd.nextInt(4))
          .select(col("id"), (col("id") % 7).cast("int").as("k"))
          .write.parquet(root)
        val m = log.commit(Manifest("", 0L, log.head.map(_.snapshotId), "v1", "spec",
          Seq(seq.toInt), complete = false, tables = Map("docs" -> Seq(root)),
          metrics = Map.empty, sketches = Map.empty, createdAtMs = seq,
          tableSchemas = Map("docs" -> spark.range(0).select(col("id"), lit(1).cast("int").as("k")).schema.json)))
        model :+= Committed(m.sequence, rows)
      }

      def check(): Unit = {
        val expected = model.flatMap(_.rows).sorted
        val got = log.readTable(spark, log.head.get, "docs")
          .select("id").collect().map(_.getLong(0)).sorted.toVector
        assert(got == expected.map(_.toLong), s"trial $trial mismatch after ops")
      }

      // An incremental consumer rides along: after every op it polls (or
      // rebootstraps when maintenance invalidated its cursor) and its
      // accumulated view must equal the model too — this exercises the
      // lineage-walk semantics of readTableChanges under every interleaving.
      val follower = new graft.streaming.SnapshotFollower(log, "docs",
        Files.createTempDirectory(s"graft_model_cur_$trial").toString,
        spark.sparkContext.hadoopConfiguration)
      var followerView = Vector.empty[Long]
      def followerCatchUp(): Unit =
        try follower.poll(spark) { (df, _, _) =>
          followerView ++= df.select("id").collect().map(_.getLong(0))
        }
        catch {
          case _: Exception => // cursor behind retention or inside rolled-back history
            follower.rebootstrap(spark) { (df, _, _) =>
              followerView = df.select("id").collect().map(_.getLong(0)).toVector
            }
        }

      commitRows() // non-empty start
      for (_ <- 1 to 10) {
        rnd.nextInt(6) match {
          case 0 | 1 => commitRows()
          case 2 =>
            val threshold = if (rnd.nextBoolean()) None else Some(512L * 1024)
            Maintenance.compact(spark, log, "docs", rewriteThresholdBytes = threshold)
          case 3 =>
            log.checkpoint(log.head.get); checkpointed = true
          case 4 =>
            // roll back to a RETAINED snapshot (>= the latest checkpoint's
            // chain floor) so the target is still readable
            val floor = log.chain(log.head.get).map(_.sequence).min
            val candidates = model.map(_.seq).filter(_ >= floor)
            if (candidates.nonEmpty) {
              val target = candidates(rnd.nextInt(candidates.size))
              Maintenance.rollbackTo(log, target)
              model = model.takeWhile(_.seq <= target)
              // an at-least-once consumer that already processed rows the
              // rollback removed must re-sync (poll throws → rebootstrap);
              // drop them from its model view as a re-synced consumer would
              followerView = followerView.filter(model.flatMap(_.rows).map(_.toLong).toSet)
            }
          case 5 =>
            if (checkpointed) Maintenance.expire(log)
        }
        if (model.nonEmpty) check()
        else assert(log.tablePaths(log.head.get, "docs").isEmpty ||
          log.readTable(spark, log.head.get, "docs").count() == 0)
        followerCatchUp()
        assert(followerView.sorted == model.flatMap(_.rows).map(_.toLong).sorted,
          s"trial $trial: follower view diverged from the model")
      }
    }
  }
}
