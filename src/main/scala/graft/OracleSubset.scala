package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Subset oracle dumper (round-7 verdict stretch task: grade the
  * corpus-layout family against DuckDB at 10× scale). Dumps the NAMED
  * queries' results + a subset oracle_sql.json in the exact layout
  * `tools/correctness_check.py` consumes, against any data dir (e.g. the
  * ScaledData 10× materialization). `Verify` itself stays frozen — this is
  * a separate main so the driver contract is untouched.
  *
  * Usage: `sbt "runMain graft.OracleSubset <dataDir> <outDir> <query>..."`
  * then `python3 tools/correctness_check.py <outDir> <dataDir> <report>`.
  */
object OracleSubset {
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
    require(args.length >= 3, "usage: OracleSubset <dataDir> <outDir> <query>...")
    val dataDir = args(0)
    val outDir = new java.io.File(args(1)).getAbsolutePath
    val names = args.drop(2).toSeq
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(SparkEntry.oracleSql.contains)
    require(unknown.isEmpty, s"no oracle for: $unknown")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      names.map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}").mkString("{", ",", "}"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val tmp = s"$outDir/_tmp_$name"
      SparkEntry.queries(name)(spark, dataDir).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      Files.move(part.toPath, Paths.get(s"$outDir/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      println(s"[oraclesubset] dumped $name")
    }
    spark.stop()
  }
}
