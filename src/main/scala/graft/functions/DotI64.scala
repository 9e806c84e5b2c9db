// Lives under org.apache.spark.sql so it can use the private[sql]
// Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
// packaging for third-party native Catalyst expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** `dot_i64(a, b)`: integer dot product of two equal-length
  * `array<long>` columns — a native codegen'd Catalyst expression.
  *
  * Exists because Spark's higher-order functions (`zip_with` +
  * `aggregate`) stay INTERPRETED inside whole-stage codegen: in the d05
  * all-pairs cosine query they executed per candidate pair inside a join
  * condition and dominated the runtime by >10x. This expression compiles
  * to a tight primitive loop over the two UnsafeArrayData buffers — no
  * allocation, no boxing, fully inside WholeStageCodegen.
  *
  * Inputs are the engine's exact scaled-integer embedding encoding
  * (`round(x * 1e6) as long`), so sums are exact and cross-engine
  * deterministic (see queries.Dedup d05 notes).
  */
case class DotI64(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for graft's native expressions. */
object functions {
  def dot_i64(a: Column, b: Column): Column =
    ExpressionUtils.column(DotI64(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
