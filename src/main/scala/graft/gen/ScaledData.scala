package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10×-style scale-up of the driver's sf tables, used ONLY for
  * benchmark scaling evidence (there is no sf1 testdata in this sandbox and
  * no external data may be used — BASELINE.json input_hint).
  *
  * Fact tables are replicated with key offsets that PRESERVE join structure
  * (lineitem.l_orderkey moves with orders.o_orderkey); dimension tables stay
  * 1× as real star-schema scale-ups do. Two tables need more than offsets,
  * because replication would otherwise create exact clones whose pair-query
  * output grows quadratically in replicas instead of linearly in rows:
  *
  *  - documents: replica r>0 texts are word-resampled by a per-(doc,replica)
  *    LCG — same length and vocabulary (so per-row costs are unchanged) but
  *    no shingle overlap with the source, so near-dup queries see 10× rows,
  *    not 55× pair mass;
  *  - embeddings: replica r>0 vectors get deterministic hash noise then are
  *    re-normalized — cosine to the source ≈0.8, below near-dup thresholds.
  */
object ScaledData {

  private val Dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Materialize `replicas`× scaled copies of the sf tables under `outDir`.
    * Idempotent: skips when the marker file exists.
    */
  def materialize(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALED")
    if (marker.exists()) return
    new java.io.File(outDir).mkdirs()

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    Dims.foreach(d => write(src(d), d))

    def replicate(df: DataFrame, keyCols: Seq[String], offset: Long): DataFrame =
      (0 until replicas)
        .map { r =>
          keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * offset)))
        }
        .reduce(_ unionByName _)

    val orderOff = src("orders").agg(max("o_orderkey")).collect()(0).getLong(0) + 1
    write(replicate(src("orders"), Seq("o_orderkey"), orderOff), "orders")
    write(replicate(src("lineitem"), Seq("l_orderkey"), orderOff), "lineitem")

    val eventOff = src("events").agg(max("event_id")).collect()(0).getLong(0) + 1
    write(replicate(src("events"), Seq("event_id"), eventOff), "events")

    // documents: replica 0 verbatim; r>0 word-resampled per (doc_id, r)
    write(scaledDocuments(spark, srcDir, replicas), "documents")

    // embeddings: replica 0 verbatim; r>0 perturbed + re-normalized
    val embs = src("embeddings")
    val vecOff = embs.agg(max("vec_id")).collect()(0).getLong(0) + 1
    def perturbed(r: Int): DataFrame = {
      if (r == 0) embs
      else {
        val noisy = transform(
          col("embedding"),
          (x, i) =>
            x + lit(0.15f) * ((pmod(xxhash64(col("vec_id"), lit(r), i), lit(1000)).cast("float") / 500f) - 1f)
        )
        val nrm = sqrt(aggregate(noisy, lit(0.0), (a, v) => a + v * v))
        embs.withColumn(
          "embedding",
          transform(noisy, x => (x / when(nrm === 0, 1.0).otherwise(nrm)).cast("float"))
        )
      }
    }
    write(
      (0 until replicas)
        .map(r => perturbed(r).withColumn("vec_id", col("vec_id") + lit(r * vecOff)))
        .reduce(_ unionByName _),
      "embeddings"
    )

    marker.createNewFile()
    ()
  }

  /** The documents scale-up shared by [[materialize]] and
    * [[materializeDocuments]]: replica 0 verbatim; r>0 word-resampled by a
    * per-(doc,replica) LCG so pair mass grows linearly in replicas.
    */
  private def scaledDocuments(spark: SparkSession, srcDir: String, replicas: Int): DataFrame = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docOff = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    val resample = udf { (text: String, docId: Long, r: Int) =>
      if (r == 0 || text == null) text
      else {
        val words = text.split("\\s+").filter(_.nonEmpty)
        if (words.isEmpty) text
        else {
          var s = docId * 6364136223846793005L + r * 1442695040888963407L
          val out = new Array[String](words.length)
          var i = 0
          while (i < words.length) {
            s = s * 6364136223846793005L + 1442695040888963407L
            out(i) = words(((s >>> 33) % words.length).toInt)
            i += 1
          }
          out.mkString(" ")
        }
      }
    }
    (0 until replicas)
      .map(r =>
        docs
          .withColumn("text", resample(col("text"), col("doc_id"), lit(r)))
          .withColumn("doc_id", col("doc_id") + lit(r * docOff))
      )
      .reduce(_ unionByName _)
  }

  /** Documents-ONLY scale-up for the 100×-pair-mass LSH stress sweep: the
    * LSH family (q20/q21/q22/q35/q36/q45) reads nothing else, and 100× of
    * the fact tables would waste sandbox disk for no measurement.
    */
  def materializeDocuments(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALED_DOCS")
    if (marker.exists()) return
    new java.io.File(outDir).mkdirs()
    scaledDocuments(spark, srcDir, replicas)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    marker.createNewFile()
    ()
  }

  /** Events-ONLY scale-up — the as-of family's 100× stress input. Replica
    * r shifts event_id by the id range and jitters ts by r seconds, so
    * per-user timelines genuinely grow 100× in DISTINCT instants (verbatim
    * replication would collapse under q42's per-(user, ts) pre-aggregation
    * and understate the sort).
    */
  def materializeEvents(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALED_EVENTS")
    if (marker.exists()) return
    new java.io.File(outDir).mkdirs()
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val off = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
    (0 until replicas)
      .map(r => ev
        .withColumn("event_id", col("event_id") + lit(r * off))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $r SECONDS")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    marker.createNewFile()
    ()
  }

  /** Embeddings-ONLY scale-up (same perturb+renormalize scheme as
    * [[materialize]]) — the embedding half of the 100× stress (q44).
    */
  def materializeEmbeddings(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALED_EMBS")
    if (marker.exists()) return
    new java.io.File(outDir).mkdirs()
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val vecOff = embs.agg(max("vec_id")).collect()(0).getLong(0) + 1
    def perturbed(r: Int): DataFrame =
      if (r == 0) embs
      else {
        val noisy = transform(
          col("embedding"),
          (x, i) =>
            x + lit(0.15f) * ((pmod(xxhash64(col("vec_id"), lit(r), i), lit(1000)).cast("float") / 500f) - 1f)
        )
        val nrm = sqrt(aggregate(noisy, lit(0.0), (a, v) => a + v * v))
        embs.withColumn(
          "embedding",
          transform(noisy, x => (x / when(nrm === 0, 1.0).otherwise(nrm)).cast("float"))
        )
      }
    (0 until replicas)
      .map(r => perturbed(r).withColumn("vec_id", col("vec_id") + lit(r * vecOff)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    marker.createNewFile()
    ()
  }
}
