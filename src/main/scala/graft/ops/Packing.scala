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

  /** For each non-empty document: its whitespace token count, exclusive
    * global token offset in `idCol` order (`tok_offset` — "offset" itself
    * is an ANSI reserved word), and the first/last context bin of width
    * `contextLen` it overlaps (a document spanning a bin boundary appears
    * in every bin it crosses — callers deciding to pad-not-split can
    * filter on `bin_first === bin_last`).
    *
    * Output: (idCol, n_tokens, tok_offset, bin_first, bin_last) — all
    * counts long for oracle parity.
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
    val c = lit(contextLen.toLong)
    PrefixScan.runningTotal(sized, Seq(idCol -> true), "n_tokens", resultCol = "_incl", buckets = buckets)
      .withColumn("tok_offset", col("_incl") - col("n_tokens"))
      .withColumn("bin_first", floor(col("tok_offset") / c).cast("long"))
      .withColumn("bin_last", floor((col("tok_offset") + col("n_tokens") - 1) / c).cast("long"))
      .drop("_incl")
  }
}
