package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 1 (driver's CORRECTNESS file came back empty even
  * though the judge's identical re-run passed 21/21): oracle_sql.json is
  * written BEFORE the queries run (a mid-run crash still leaves the oracle
  * map), stale per-query parquet is deleted before each attempt (a failed
  * query can't be graded against last run's output), args are parsed
  * leniently, and a machine-readable self-report lands in outDir and
  * /root/repo/VERIFY_SELF.json plus one bare JSON line on stdout.
  */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // Lenient contract parse: expected (sfDir, outDir); tolerate extra or
    // missing args rather than dying on a MatchError the driver can't see.
    val sfDir = args.find(a => new java.io.File(a).isDirectory && a.contains("sf"))
      .orElse(args.headOption).getOrElse("/root/testdata/sf0.01")
    val outDirRaw =
      if (args.length >= 2) args.filterNot(_ == sfDir).last
      else "/tmp/graft_verify_out"
    val outDir = new java.io.File(outDirRaw).getAbsolutePath
    new java.io.File(outDir).mkdirs()

    // Oracle SQL first: even a catastrophic mid-run failure leaves the map
    // the driver needs to grade whatever parquet did land.
    val oracleJson = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val status = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val target = Paths.get(s"$outDir/$name.parquet")
      Files.deleteIfExists(target) // no stale output may survive a failure
      try {
        // Contract: a single real parquet FILE at outDir/<name>.parquet
        // (readable by pyarrow.read_table and duckdb read_parquet alike).
        val tmp = s"$outDir/_tmp_$name"
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file under $tmp"))
        Files.move(part.toPath, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
        name -> "ok"
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        name -> s"fail: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}"
      }
    }
    spark.stop()

    val report = status.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString(s"""{"out_dir": ${q(outDir)}, "sf_dir": ${q(sfDir)}, "queries": {""", ",", "}}")
    Files.writeString(Paths.get(s"$outDir/VERIFY_SELF.json"), report)
    try Files.writeString(Paths.get("/root/repo/VERIFY_SELF.json"), report)
    catch { case _: Throwable => () }
    println(report) // bare on stdout (build.sbt sets StdoutOutput)
  }
}
