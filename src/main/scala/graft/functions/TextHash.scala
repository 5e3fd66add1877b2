package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hashed character k-shingles, SORTED and DISTINCT.
  *
  * The `functions._` form —
  * `array_sort(array_distinct(transform(sequence(0, len−k), i ->
  * xxhash64(substr(i+1, k)))))` — allocates one UTF8String per shingle
  * (hundreds per document) plus the intermediate arrays of three
  * higher-order passes. This expression walks the UTF8 char boundaries
  * once, hashes each k-char byte window IN PLACE off the parent buffer
  * (zero copies), then sorts + dedupes one primitive long array.
  *
  * Bit-parity with the Column form: `xxhash64(s)` is
  * `XXH64.hashUnsafeBytes(bytes(s), 42)`, and a char-substring's bytes are
  * a contiguous window of the parent's bytes — so hashes, and therefore
  * every downstream jaccard/minhash result, are identical (property-tested
  * in OpsSpec).
  */
object TextHashUtil {

  private final val Seed = 42L

  def hashedShinglesSorted(s: UTF8String, k: Int): ArrayData = {
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    // char index -> starting byte offset (UTF-8 boundary walk)
    val starts = new Array[Int](nChars + 1)
    var i = 0
    var off = 0
    while (i < nChars) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(s.getByte(off))
      i += 1
    }
    starts(nChars) = s.numBytes()
    val n = nChars - k + 1
    val out = new Array[Long](n)
    val base = s.getBaseObject
    val baseOff = s.getBaseOffset
    var j = 0
    while (j < n) {
      out(j) = XXH64.hashUnsafeBytes(base, baseOff + starts(j), starts(j + k) - starts(j), Seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < n) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == n) out else java.util.Arrays.copyOf(out, w))
  }
}

/** text → sorted distinct xxhash64'd k-shingles (array<bigint>). */
final case class HashedShinglesSorted(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles_sorted"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.hashedShinglesSorted(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.hashedShinglesSorted($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): HashedShinglesSorted =
    copy(child = newChild)
}

object TextHash {
  def hashedShinglesSorted(c: Column, k: Int): Column =
    column(HashedShinglesSorted(expression(c), k))
}
