package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Fast-path string predicates for constraint evaluation.
  *
  * The general `pattern` keyword compiles to `rlike` (java.util.regex) —
  * correct but measured at ~40% of the whole validate pipeline's CPU for
  * the uuid pattern on image_id (8M rows: 4.67 s with, 2.81 s without).
  * For the fixed 8-4-4-4-12 lowercase-hex uuid layout, a byte-level loop
  * over the UTF8String needs no regex machinery and no allocation.
  * Exactly equivalent to
  * `^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$`
  * (the layout is ASCII-only, so byte positions == char positions in UTF-8;
  * any multi-byte input fails the per-byte class checks).
  */
object StringPredUtil {
  def isUuidLower(s: UTF8String): Boolean = {
    if (s.numBytes != 36) return false
    var i = 0
    while (i < 36) {
      val c = s.getByte(i)
      val ok =
        if (i == 8 || i == 13 || i == 18 || i == 23) c == '-'
        else (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
      if (!ok) return false
      i += 1
    }
    true
  }
}

/** TRUE ⇔ the string is a lowercase-hex uuid (codegen'd byte loop). */
final case class UuidLike(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "uuid_like"
  override protected def nullSafeEval(input: Any): Any =
    StringPredUtil.isUuidLower(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringPredUtil.isUuidLower($c)")
  override protected def withNewChildInternal(newChild: Expression): UuidLike =
    copy(child = newChild)
}

object StringPreds {
  def uuidLike(c: Column): Column = column(UuidLike(expression(c)))
}
