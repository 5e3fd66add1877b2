package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (optimization-round tooling, NOT part of the bench
  * contract): writes `explain("formatted")` for every SparkEntry query to
  * `<outDir>/<query>_<tag>.txt` so plan-shape claims (Exchange count, join
  * strategy, PushedFilters) are committable artifacts.
  *
  * Usage: `sbt "runMain graft.PlanDump <tag> [outDir] [queryFilter...]"`
  * with the same SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env as Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val outDir = if (args.length >= 2) args(1) else "/root/repo/plans/r07"
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val plan =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        println(s"[plandump] wrote $name ($tag)")
      }
    }
    spark.stop()
  }
}
