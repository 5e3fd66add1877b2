package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.SnapshotLog

/** Durable incremental consumer over a [[SnapshotLog]] table — the
  * downstream half of `readTableChanges`: a training-data pipeline that
  * wants "every row the validation engine has produced since my last run"
  * without re-reading the table.
  *
  * Contract:
  *  - the cursor (last fully processed snapshot sequence) is persisted
  *    under the CONSUMER's own directory, not the producer's log — many
  *    independent consumers can follow one table at their own pace;
  *  - `poll` is at-least-once: the callback runs BEFORE the cursor
  *    advances, so a crash between the two replays the same delta on the
  *    next poll. Consumers that need exactly-once effects make the
  *    callback idempotent on `(fromSeq, toSeq]` (the range is passed in) —
  *    the same discipline Structured Streaming's foreachBatch asks for;
  *  - a cursor that falls behind the producer's [[graft.table.Maintenance
  *    .expire]] retention window, or points into history abandoned by
  *    `rollbackTo`, makes `readTableChanges` throw — call [[rebootstrap]]
  *    to process one FULL snapshot read and resume incrementally from its
  *    sequence.
  *
  * Driver-side metadata polling only — the delta itself is a normal
  * distributed read (one multi-path scan of the delta commits' files).
  */
final class SnapshotFollower(
    log: SnapshotLog,
    table: String,
    cursorDir: String,
    conf: org.apache.hadoop.conf.Configuration
) {

  private def fs = new Path(cursorDir).getFileSystem(conf)
  private def cursorPath = new Path(cursorDir, s"cursor-$table.txt")

  /** Last fully processed sequence; 0 = from the beginning. */
  def cursor: Long = {
    val f = fs
    if (!f.exists(cursorPath)) 0L
    else {
      val in = f.open(cursorPath)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeCursor(seq: Long): Unit = {
    val f = fs
    f.mkdirs(new Path(cursorDir))
    val tmp = new Path(cursorDir, s".cursor-$table.tmp")
    val out = f.create(tmp, true)
    try out.write(seq.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(cursorPath, false)
    if (!f.rename(tmp, cursorPath))
      throw new IllegalStateException(s"cursor update for $table lost a rename race")
  }

  /** Process everything committed since the cursor. Returns the number of
    * snapshots advanced (0 = already caught up; the callback is not
    * invoked). The callback receives the delta frame and the processed
    * range `(fromSeq, toSeq]`.
    */
  def poll(spark: SparkSession)(f: (DataFrame, Long, Long) => Unit): Long = {
    val head = log.head.getOrElse(return 0L)
    val from = cursor
    if (head.sequence <= from) return 0L
    val delta = log.readTableChanges(spark, from, head.sequence, table)
    f(delta, from, head.sequence)
    writeCursor(head.sequence)
    head.sequence - from
  }

  /** Recover a consumer whose cursor fell behind the retention window (or
    * into rolled-back history): process one FULL read of the table as of
    * HEAD, then resume incremental polling from there.
    */
  def rebootstrap(spark: SparkSession)(f: (DataFrame, Long, Long) => Unit): Long = {
    val head = log.head.getOrElse(return 0L)
    f(log.readTable(spark, head, table), 0L, head.sequence)
    writeCursor(head.sequence)
    head.sequence
  }
}
