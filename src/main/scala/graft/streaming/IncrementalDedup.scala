package graft.streaming

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Dedup
import graft.table.{Manifest, SnapshotLog}

/** Incremental corpus dedup riding the snapshot log — the composed
  * production loop: documents arrive as commits to a [[SnapshotLog]]
  * table; each `step` consumes the newly committed slice through a
  * durable [[SnapshotFollower]] cursor, pairs it against the STORED
  * corpus signature table ([[Dedup.minhashPairsAgainstSignatures]] —
  * cross-side band join, the corpus is never re-shingled), hands the
  * verified near-dup pairs to the caller, and atomically appends the
  * slice's signatures so every future batch dedups against them.
  *
  * The signature store is its OWN snapshot log (`sigLog`), not the
  * producer's: a consumer that committed into the log it follows would
  * re-consume its own commits as fresh backlog forever (each sig commit
  * spawning the next empty slice). Separate logs keep the producer's
  * lineage pure document history and let many consumers own independent
  * derived stores — the same reason [[SnapshotFollower]] keeps its cursor
  * outside the producer's directory.
  *
  * Per-step cost at 10^12 ingested rows: shingle the SLICE + one join
  * against the signature table — the corpus is never re-shingled and its
  * SCAN is pruned, not paid in full: the band-key join's build side (the
  * slice) is small, so Spark's runtime bloom-filter injection
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, default ON, build
  * side ≤ 10 MB / probe scan ≥ 10 GB — precisely this shape) pushes a
  * might_contain(band_key) filter into the signature-table scan, skipping
  * row groups wholesale. The further refinement at extreme scale is to
  * range-cluster the stored signature table by band key during
  * maintenance compaction so parquet min/max prunes files before the
  * bloom filter sees them. BASELINE.md §3.2d/e measure the
  * flat-at-10×/100×-corpus shape.
  *
  * Restart semantics (at-least-once pair delivery, exactly-once
  * signature storage): the cursor advances only after a fully successful
  * step. A crash inside the callback leaves no signature commit and no
  * cursor — clean replay. A crash between the signature commit and the
  * cursor write replays the slice: the slice's DETERMINISTIC dir tag
  * makes the rewrite overwrite itself, a path already present in the
  * chain is not committed twice, and the slice's own already-stored
  * signatures are anti-joined out of the corpus side — the replay
  * re-delivers exactly the original pairs.
  *
  * Intra-slice duplicates are the caller's compose-step
  * ([[Dedup.minhashPairs]] on the slice) — this loop owns the
  * cross-batch relation only.
  */
final class IncrementalDedup(
    docLog: SnapshotLog,
    sigLog: SnapshotLog,
    docTable: String,
    idCol: String,
    textCol: String,
    cursorDir: String,
    conf: Configuration,
    shingleK: Int = 5,
    numHashes: Int = 64,
    numBands: Int = 16,
    threshold: Double = 0.7,
    maxBucket: Int = Dedup.DefaultMaxBucket
) {
  require(docLog.root != sigLog.root,
    "sigLog must be a separate snapshot log: committing into the followed log would re-consume own commits forever")

  val SigTable = "dedup_sigs"
  private val follower = new SnapshotFollower(docLog, docTable, cursorDir, conf)

  /** Consume up to `maxCommits` newly committed document commits; returns
    * the sequence distance advanced (0 = caught up, callback not run).
    */
  def step(spark: SparkSession, maxCommits: Int = Int.MaxValue)(onPairs: DataFrame => Unit): Long =
    follower.poll(spark, maxCommits) { (delta, from, to) =>
      val sliceSigs = Dedup.minhashSignatures(delta, idCol, textCol, shingleK, numHashes, numBands)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // Row-less slices (the producer's checkpoint/compaction commits
        // fall inside poll ranges but add no documents) write and commit
        // NOTHING — idle polls grow neither the signature chain nor disk.
        if (sliceSigs.isEmpty)
          onPairs(Dedup.minhashPairsAgainstSignatures(sliceSigs, sliceSigs, threshold, maxBucket)
            .limit(0)) // empty pair frame, real schema — the callback contract holds
        else {
          val head = sigLog.head
          val storeSigs = head
            .filter(m => sigLog.tablePaths(m, SigTable).nonEmpty)
            .map(m => sigLog.readTable(spark, m, SigTable))
          // A replayed slice (crash between sig-commit and cursor write)
          // finds its OWN signatures already stored; excluding the slice's
          // ids from the corpus side makes the replay re-deliver EXACTLY
          // the original pairs — same-slice relations stay the caller's
          // intra-batch step on replay too, not a replay leak.
          val corpusSigs = storeSigs
            .map(_.join(sliceSigs.select("id"), Seq("id"), "left_anti"))
            .getOrElse(sliceSigs.limit(0)) // first slice: empty corpus, zero pairs
          onPairs(Dedup.minhashPairsAgainstSignatures(corpusSigs, sliceSigs, threshold, maxBucket))
          // Store only ids the chain does not already hold: a replayed
          // slice whose boundary EXTENDED past the original (new commits
          // landed before the retry) appends just the genuinely new docs —
          // the signature table never double-counts under any replay shape.
          val newSigs = storeSigs
            .map(sf => sliceSigs.join(sf.select("id"), Seq("id"), "left_anti"))
            .getOrElse(sliceSigs)
          if (!newSigs.isEmpty) {
            val dir = sigLog.dataDir(f"dedupsigs-$from%08d-$to%08d", SigTable)
            newSigs.write.mode("overwrite").parquet(dir)
            if (!head.exists(m => sigLog.tablePaths(m, SigTable).contains(dir)))
              sigLog.commit(Manifest(
                snapshotId = "", sequence = 0L, // assigned by commit
                parentId = head.map(_.snapshotId),
                constraintVersion = head.map(_.constraintVersion).getOrElse("dedup-sigs/1"),
                partitionSpec = head.map(_.partitionSpec).getOrElse("incremental"),
                partitionsDelta = Seq.empty,
                complete = false,
                tables = Map(SigTable -> Seq(dir)),
                metrics = head.map(_.metrics).getOrElse(Map.empty), // cumulative maps carry forward
                sketches = head.map(_.sketches).getOrElse(Map.empty),
                createdAtMs = System.currentTimeMillis(),
                tableSchemas = Map(SigTable -> newSigs.schema.json)
              ))
          }
        }
      } finally sliceSigs.unpersist()
      ()
    }
}
