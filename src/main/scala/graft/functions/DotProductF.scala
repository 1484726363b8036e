package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays in double precision, as a native
  * codegen Expression.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0, (acc, v) -> acc + v)` — higher-order-function lambdas run
  * interpreted, so every cosine similarity paid two allocated arrays
  * and ~3n interpreted calls per row. Bit-compatible with that form:
  * each element is cast to double, products accumulate sequentially
  * left-to-right (IEEE ops in the same order), and a length mismatch
  * yields NULL (zip_with pads with null, which poisons the HOF sum).
  * Caveat: NULL *elements* inside an array are read as 0 here where
  * the HOF form would null the whole sum — embedding columns carry no
  * null elements (and the differential spec covers the real data).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotf"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else DotProductF.compute(x, isFloat(left), y, isFloat(right))
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProductF.compute(
         |    $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  /** Static so generated code calls one tight JIT-friendly loop. The
    * float flags are compile-time constants at each call site, so the
    * branch hoists out of the loop. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
