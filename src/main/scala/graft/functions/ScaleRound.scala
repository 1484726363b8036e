package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `scale_round(arr, factor)` — per element of a float/double array,
  * `cast(round(cast(v as double) * factor, 0) as bigint)`, as ONE
  * native codegen pass. Bit-identical to the interpreted
  * `transform(arr, v -> cast(round(cast(v as double) * F, 0) as
  * bigint))` it replaces (ScaleRoundSpec differential): Spark's
  * Round(double, 0) HALF_UP decision at integer scale is exactly
  * `new java.math.BigDecimal(x).setScale(0, HALF_UP)` (graft.ops.Det
  * .halfUpLong — the driver-side replication the oracle chain has
  * certified since round 3; at scale 0 the shortest-repr vs
  * exact-expansion BigDecimal constructions cannot disagree because
  * every x.5 boundary value is exactly representable).
  *
  * The replaced HOF ran interpreted per ELEMENT (64 rounds per
  * embedding row, a BigDecimal allocation each) on every µu/SQ-code
  * integerization of the embedding family — the standing
  * interpreted-lambda rule (pack8 precedent), embeddings edition.
  * Null elements pass through as null (transform semantics).
  */
case class ScaleRound(child: Expression, factor: Long)
    extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _               => true
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = elemNullable)
  override def prettyName: String = "scale_round"

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got " +
        child.dataType.simpleString)
  }

  override def nullSafeEval(input: Any): Any =
    ScaleRound.scale(input.asInstanceOf[ArrayData], factor,
      elemType == FloatType, elemNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ScaleRound.scale(
         |  $c, ${factor}L, ${elemType == FloatType}, $elemNullable);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScaleRound {

  /** Static so generated code calls one tight loop. */
  def scale(a: ArrayData, factor: Long, isFloat: Boolean,
      elemNullable: Boolean): ArrayData = {
    val n = a.numElements()
    if (elemNullable) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          out(i) = halfUp(v * factor)
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = halfUp(v * factor)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** graft.ops.Det.halfUpLong with the ANSI overflow contract: the
    * replaced form's `cast(round(...) as bigint)` THROWS on a value
    * outside long range, so this throws too (ArithmeticException via
    * longValueExact) instead of silently truncating. */
  def halfUp(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}
