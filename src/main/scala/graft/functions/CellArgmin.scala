package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact-integer argmin of a µu vector over a FIXED centroid set, as
  * one native codegen expression returning `struct<d2: bigint,
  * cell: bigint>` — min by (Σᵢ(x[i]−c[i])², cell id), the
  * deterministic-IVF assignment rule (graft.ops.Ivf).
  *
  * Replaces BOTH prior assignment forms with bit-identical results
  * (CellArgminSpec differentials):
  *  - the k-way `least(struct(d2_literal, id), …)` expression — whose
  *    k×64-literal tree cost an analyzer walk AND a Janino compile per
  *    action (the round-7 q150 lesson; ~2k nodes at k=8, OOMs codegen
  *    near k≈10²), where this is a 3-node tree with the centroid
  *    matrix riding one array literal / codegen reference object;
  *  - the broadcast-join argmin (crossJoin(centDf) + min_by), which
  *    streamed N×k rows each carrying BOTH 64-long arrays through a
  *    per-vector aggregate — here nothing N×k ever exists.
  *
  * The centroid matrix and id children must be FOLDABLE (array
  * literals): they are evaluated once at plan time, not per row. The
  * inner loop carries the partial-distance early exit (strict `>`
  * compare, so ties are decided by the full sum + id order exactly as
  * the struct-min did). A length mismatch between x and any centroid
  * yields NULL (the L2MuSq convention: routing bugs surface as null
  * cells, never wrong ones).
  */
case class CellArgmin(x: Expression, cents: Expression, ids: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = cents
  override def third: Expression = ids

  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cell", LongType, nullable = false)))
  override def prettyName: String = "cell_argmin"
  override def nullable: Boolean = true

  private def longArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!longArray(x.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> x, got ${x.dataType.simpleString}")
    else if (!(cents.dataType match {
      case ArrayType(inner, _) => longArray(inner)
      case _                   => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<array<bigint>> centroids, " +
          s"got ${cents.dataType.simpleString}")
    else if (!longArray(ids.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> ids, got ${ids.dataType.simpleString}")
    else if (!cents.foldable || !ids.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName centroid matrix and ids must be literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val centMatrix: Array[Array[Long]] = {
    val a = cents.eval().asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i =>
      a.getArray(i).toLongArray())
  }

  @transient private lazy val idArray: Array[Long] = {
    val a = ids.eval().asInstanceOf[ArrayData]
    require(a.numElements() == centMatrix.length,
      s"$prettyName: ${centMatrix.length} centroids but " +
        s"${a.numElements()} ids")
    a.toLongArray()
  }

  override def nullSafeEval(xv: Any, cv: Any, iv: Any): Any =
    CellArgmin.compute(xv.asInstanceOf[ArrayData], centMatrix, idArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMatrix", centMatrix, "long[][]")
    val idsRef = ctx.addReferenceObj("cellIds", idArray, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"""
         |${ev.value} = graft.functions.CellArgmin.compute($a, $matRef, $idsRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(x = newFirst, cents = newSecond, ids = newThird)
}

object CellArgmin {
  /** Static so generated code calls one tight JIT-friendly loop.
    * Returns null when the matrix is empty or any centroid's length
    * differs from x's. */
  def compute(x: ArrayData, cents: Array[Array[Long]],
      ids: Array[Long]): InternalRow = {
    val k = cents.length
    if (k == 0) return null
    val n = x.numElements()
    val xv = x.toLongArray()
    var bestD = Long.MaxValue
    var bestId = Long.MaxValue
    var found = false
    var j = 0
    while (j < k) {
      val c = cents(j)
      if (c.length != n) return null
      var acc = 0L
      var i = 0
      // partial-distance early exit: once acc exceeds the best d2
      // strictly, this centroid can neither win nor tie
      while (i < n && acc <= bestD) {
        val d = xv(i) - c(i)
        acc += d * d
        i += 1
      }
      if (i == n && (acc < bestD || (acc == bestD && ids(j) < bestId))) {
        bestD = acc
        bestId = ids(j)
        found = true
      }
      j += 1
    }
    if (!found) {
      // every centroid was pruned mid-sum only if bestD was beaten
      // earlier, so found can only be false for k == 0 — handled above
      return null
    }
    new GenericInternalRow(Array[Any](bestD, bestId))
  }
}
