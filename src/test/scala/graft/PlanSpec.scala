package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations the 100-TB design depends on
  * must actually appear in the executed plan, not just be hoped for.
  */
class PlanSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan; unused columns pruned") {
    val p = plan(Queries.q01PricingRollup(spark, sfDir))
    val scan = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(scan.contains("l_shipdate"), s"no pushdown:\n$scan")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"), s"pruning failed:\n$read")
  }

  test("q02: isin + range predicates pushed down") {
    val p = plan(Queries.q02FilterProjection(spark, sfDir))
    val scan = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(scan.contains("event_type") && scan.contains("value"), s"no pushdown:\n$scan")
  }

  test("q04: referential anti-join broadcasts the dimension side") {
    val p = plan(Queries.q04RefOrphans(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), s"expected broadcast anti join:\n${p.take(2000)}")
  }

  test("q01 runs inside whole-stage codegen") {
    val df = Queries.q01PricingRollup(spark, sfDir)
    df.collect() // AQE: final plan (with codegen spans) exists only post-run
    val p = plan(df)
    // AQE final plans print codegen spans in compact `*(n)` form
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"no codegen spans:\n${p.take(1200)}")
  }

  test("engine violations array is one projection, no extra shuffle before rollup") {
    import spark.implicits._
    val imgs = graft.gen.SyntheticImages.images(spark, 200, 2).toDF()
    val res = new graft.engine.ValidationEngine(graft.engine.ImageConstraints.v1).process(imgs)
    val p = plan(res.rollups)
    // exactly one exchange: the (partition_id) hash agg boundary
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n${p.take(3000)}")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), "no partial aggregation")
  }

  test("brute-force ANN broadcasts the query side (no shuffle of the data side)") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = embs.filter(col("vec_id") < 3)
    val p = plan(graft.ops.Similarity.bruteForceTopK(embs, q, "vec_id", "vec_id", "embedding", 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), s"query side not broadcast:\n${p.take(1500)}")
  }
}
