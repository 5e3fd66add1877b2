package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[Queries]]; each oracle-backed entry has a
  * DuckDB-parity SQL in [[oracleSql]], rows-only entries (sketches, LSH,
  * ANN, synthesized-image engine paths) are checked by the driver as
  * rows>0 and by `sbt test` differential oracles.
  */
object SparkEntry {

  /** Flagship: the full validate-then-produce pipeline (decode checks ON)
    * over the deterministic synthetic image+caption table — per-partition
    * triage rollups. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = Queries.imgRollup(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
