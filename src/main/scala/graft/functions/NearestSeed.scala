package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-seed assignment for the recursive Voronoi quantizer
  * ([[graft.ops.Dedup.adaptiveBuckets]]): given a vector and an array of
  * candidate seeds `array<struct<hk: long, sv: array<float|double>>>`,
  * return the `hk` of the seed with the highest cosine similarity to the
  * vector — the per-row argmax that turns a broadcast/bucket-joined seed
  * list into a cluster assignment without exploding rows × seeds through a
  * shuffle.
  *
  * One codegen'd expression for the same reason as [[CosineSimExpr]]: the
  * seeds-loop × dims-loop is the quantizer's entire fit cost, and the
  * higher-order-function form (`aggregate` over the seed array) evaluates
  * interpreted per element.
  *
  * Determinism: seeds arrive sorted by `hk` (the caller sort_array's them),
  * the scan keeps the FIRST maximum under strict `>` comparison, and the
  * dim loop accumulates in ascending index order — identical vectors always
  * resolve to the identical seed, which is what guarantees exact duplicates
  * co-bucket (the SemDeDup recall contract).
  *
  * Null/edge semantics: null when the seed array is empty or no seed is
  * usable; seeds with a null/length-mismatched/null-element vector are
  * skipped (never silently scored); |seed| = 0 scores -MaxValue so a zero
  * seed is only chosen if nothing else is usable; the argmax needs no |v|
  * factor (constant across seeds) so a zero input vector scores 0.0 against
  * every seed and deterministically takes the first.
  */
final case class NearestSeedExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_seed"

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val seedsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) => f0.dataType == LongType && vecOk(f1.dataType)
      case _                                       => false
    }
    if (vecOk(left.dataType) && seedsOk) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<struct<long, array<float|double>>>), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient private lazy val vFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  @transient private lazy val sFloat = right.dataType match {
    case ArrayType(StructType(Array(_, f1)), _) =>
      f1.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      }
    case _ => false
  }

  /** Boxed Long hk of the argmax-cosine seed, or null if none usable. */
  def compute(v: ArrayData, seeds: ArrayData): java.lang.Long = {
    val nSeeds = seeds.numElements()
    val d = v.numElements()
    var bestHk = 0L
    var bestScore = 0.0
    var found = false
    var b = 0
    while (b < nSeeds) {
      if (!seeds.isNullAt(b)) {
        val row = seeds.getStruct(b, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val sv = row.getArray(1)
          if (sv.numElements() == d) {
            var dot = 0.0
            var nrm = 0.0
            var ok = true
            var i = 0
            while (ok && i < d) {
              if (v.isNullAt(i) || sv.isNullAt(i)) ok = false
              else {
                val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
                val y = if (sFloat) sv.getFloat(i).toDouble else sv.getDouble(i)
                dot += x * y
                nrm += y * y
                i += 1
              }
            }
            if (ok) {
              val score = if (nrm == 0.0) -java.lang.Double.MAX_VALUE else dot / math.sqrt(nrm)
              if (!found || score > bestScore) { found = true; bestScore = score; bestHk = row.getLong(0) }
            }
          }
        }
      }
      b += 1
    }
    if (found) java.lang.Long.valueOf(bestHk) else null
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestSeed", this, classOf[NearestSeedExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("seedHk")
      s"""
         |java.lang.Long $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestSeedExpr =
    copy(left = newLeft, right = newRight)
}

object NearestSeedExpr {
  /** Column face: `NearestSeedExpr(vec, seedsArray)`. */
  def apply(v: Column, seeds: Column): Column = column(NearestSeedExpr(expression(v), expression(seeds)))
}
