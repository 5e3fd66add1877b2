package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k per group for FEW, HUGE groups — the two-phase salted
  * tournament. A bare `row_number().over(partitionBy(group))` sorts each
  * whole group on one task: top-3 orders per priority over 10^12 rows is
  * five tasks. Unlike [[Sampling.sampleKPerStratum]] (whose uniform-hash
  * order admits an analytic pre-prune), a general order column has no
  * concentration bound — so phase 1 takes the top k within each of
  * `fanout` deterministic salt cells per group (any global top-k row is
  * top-k in its cell, so survivors are a superset), and phase 2 ranks the
  * ≤ fanout·k survivors per group exactly. Both windows are O(k·fanout)
  * per partition regardless of group size; the result is bit-identical to
  * the single-window plan (q07's oracle covers the composite).
  *
  * `order` must be a unique total order within each group (the usual
  * tie-break-on-id contract) — the salt is derived from the order columns,
  * so it is a pure function of row values: rerun/retry/repartition-stable.
  */
object TopK {

  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[(Column, Boolean)],
      k: Int,
      rankCol: String = "rank",
      fanout: Int = 64
  ): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(order.nonEmpty, "order must be non-empty")
    require(k > 0 && fanout > 0, s"k and fanout must be positive: $k/$fanout")
    val salt = "_topk_salt"
    require(!df.columns.contains(salt) && !df.columns.contains(rankCol),
      s"TopK reserves columns $salt/$rankCol")
    val ord = order.map { case (c, asc) => if (asc) c.asc else c.desc }
    val cell = pmod(xxhash64(order.map(_._1): _*), lit(fanout))
    val survivors = df
      .withColumn(salt, cell)
      .withColumn(rankCol, row_number().over(
        Window.partitionBy((groupCols :+ salt).map(col): _*).orderBy(ord: _*)))
      .filter(col(rankCol) <= k)
      .drop(salt, rankCol)
    survivors
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(ord: _*)))
      .filter(col(rankCol) <= k)
  }
}
