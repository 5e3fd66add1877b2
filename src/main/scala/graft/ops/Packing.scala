package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training — the "concatenate the tokenized
  * corpus in a fixed document order and chop every `contextLen` tokens"
  * layout (the GPT-2/GPT-3 pretraining batch construction; also RedPajama/
  * Pile packing). The engine-side artifact is each document's GLOBAL token
  * offset plus the context bins it lands in; a writer can then route each
  * document (or its slices) to its bin files without ever materializing the
  * concatenated corpus.
  *
  * The global offset is a prefix sum over a total document order — computed
  * with [[PrefixScan.runningTotal]] (bucketed two-level scan), NOT a
  * single-partition window, so the layout of a 10^12-token corpus is one
  * bucketed pass. Offsets are exact integers: rerun-stable and
  * oracle-verifiable bit-for-bit (q64).
  */
object Packing {

  /** Per-source token-budget curation: keep each group's documents, in
    * caller-chosen priority order, until `budgetTokens` is reached — the
    * "cap every source/language at N tokens" mixing step of corpus
    * assembly. A document is kept iff the tokens admitted BEFORE it are
    * still under budget (greedy fill: the straddling document is kept, so
    * a nonzero budget always admits at least one document per group).
    *
    * The in-group running total comes from [[PrefixScan.groupedRunningTotal]]
    * — a handful of huge sources would give `Window.partitionBy(source)`
    * one task per source; here parallelism stays `buckets`-wide. Priority
    * `orderCols` + the group must form a unique total order (tie-break on
    * the id). `n_tokens` is a RESERVED output name, always recomputed here
    * as the whitespace token count (asserted below — a caller's own
    * `n_tokens` would otherwise be silently shadowed in both the priority
    * order and the budget math); callers with external tokenizer counts
    * should budget via [[PrefixScan.groupedRunningTotal]] directly.
    *
    * Output: (idCol, groupCol, n_tokens, tok_before) for kept documents.
    */
  def tokenBudgetKeep(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgetTokens: Long,
      orderCols: Seq[(String, Boolean)],
      buckets: Int = 64
  ): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0: $budgetTokens")
    require(!docs.columns.contains("n_tokens"),
      "tokenBudgetKeep reserves (and recomputes) n_tokens — rename the input column, " +
        "or use PrefixScan.groupedRunningTotal directly to budget on your own counts")
    val sized = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol) +: col(groupCol) +:
        orderCols.collect { case (c, _) if c != idCol && c != groupCol && c != "n_tokens" => col(c) } :+
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"): _*)
    PrefixScan.groupedRunningTotal(sized, Seq(groupCol), orderCols, "n_tokens",
      resultCol = "_incl", buckets = buckets)
      .withColumn("tok_before", col("_incl") - col("n_tokens"))
      .filter(col("tok_before") < budgetTokens)
      .select(col(idCol), col(groupCol), col("n_tokens"), col("tok_before"))
  }

  /** For each non-empty document: its whitespace token count, exclusive
    * global token offset in `idCol` order (`tok_offset` — "offset" itself
    * is an ANSI reserved word), and the first/last context bin of width
    * `contextLen` it overlaps (a document spanning a bin boundary appears
    * in every bin it crosses — callers deciding to pad-not-split can
    * filter on `bin_first === bin_last`).
    *
    * Output: (idCol, n_tokens, tok_offset, bin_first, bin_last) — all
    * counts long for oracle parity. Bin assignment uses INTEGER division
    * (`div`): a `/` on longs is a double divide, whose rounding would
    * misplace bins once offsets pass 2^53 — the exact regime this op's
    * 10^12-token framing targets.
    */
  def packOffsets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      contextLen: Int,
      buckets: Int = 64
  ): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val sized = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    PrefixScan.runningTotal(sized, Seq(idCol -> true), "n_tokens", resultCol = "_incl", buckets = buckets)
      .withColumn("tok_offset", col("_incl") - col("n_tokens"))
      .withColumn("bin_first", expr(s"tok_offset div ${contextLen.toLong}"))
      .withColumn("bin_last", expr(s"(tok_offset + n_tokens - 1) div ${contextLen.toLong}"))
      .drop("_incl")
  }
}
