package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two numeric arrays as ONE codegen'd expression —
  * the pair-verification kernel of every embedding near-dup / ANN operator.
  *
  * Why an expression: the Column form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` three times — dot, |a|², |b|²)
  * builds interpreted higher-order lambdas per row; on candidate-pair joins
  * (hundreds of thousands of pairs × 64 dims) that interpretation dominates
  * the operator — the same shape already replaced for minhash
  * (MinHashBandKeys) and RP signatures (RpSignatureExpr).
  *
  * Bit-parity with the Column form it replaces (`Similarity.cosineColumns`,
  * property-tested): float inputs multiply IN FLOAT then widen into a
  * double left-fold in ascending index order — exactly `zip_with`'s
  * elementwise product feeding `aggregate`'s fold; `0.0` when both norms'
  * product is zero; null when lengths differ or any element is null
  * (zip_with pads/propagates null through the fold).
  */
final case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  @transient private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // Boxed Double or null — null mirrors the Column form's propagation.
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dotAB = 0.0
    var dotAA = 0.0
    var dotBB = 0.0
    var i = 0
    val bothFloat = leftFloat && rightFloat
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (bothFloat) {
        val x = a.getFloat(i)
        val y = b.getFloat(i)
        dotAB += (x * y).toDouble // float multiply, then widen: zip_with parity
        dotAA += (x * x).toDouble
        dotBB += (y * y).toDouble
      } else {
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dotAB += x * y
        dotAA += x * x
        dotBB += y * y
      }
      i += 1
    }
    val d = math.sqrt(dotAA) * math.sqrt(dotBB)
    if (d == 0.0) 0.0 else dotAB / d
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSimExpr].getName)
    val eval = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = $ref.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })
    eval
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column face. */
  def apply(a: Column, b: Column): Column = column(CosineSimExpr(expression(a), expression(b)))
}
