package graft

/** Driver-contract invariants over the query registry. Value-level parity
  * for oracle-backed queries is enforced externally (Verify + DuckDB); this
  * spec guards the structural contract those checks depend on.
  */
class QueriesSpec extends SparkSpec {
  val sfDir = "/root/testdata/sf0.001"

  test("every oracleSql key has a queries entry (driver contract)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query impl: $orphans")
  }

  test("every registered query runs at sf0.001 and returns rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n > 0) None else Some(name)
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("oracle-backed results have stable, aliased column names") {
    // the driver sorts columns by name before hashing — auto-generated names
    // like sum(x) or round(x, 2) would desync Spark vs DuckDB
    val bad = Queries.oracleBacked.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      cols.filter(c => c.contains("(") || c.contains(" ")).map(c => s"$name.$c")
    }
    assert(bad.isEmpty, s"unaliased columns: $bad")
  }
}
