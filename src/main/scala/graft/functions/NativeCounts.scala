package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small native counting kernels replacing interpreted HOF-lambda
  * pipelines on per-candidate hot paths (the r16 census):
  *
  *  - [[EqCount]]   — `size(filter(zip_with(a, b, (x,y) -> x = y),
  *    v -> v))`: the MinHash matching-position count (q41's estimate
  *    prune over every LSH candidate pair, q192's accuracy audit).
  *  - [[HammingCount]] — `aggregate(zip_with(a, b, (x,y) ->
  *    bit_count(x ^ y)), 0, (acc,v) -> acc + v)`: the banded-dHash
  *    Hamming distance (q203/q204's verify over every pHash candidate
  *    pair).
  *
  * Null semantics mirror the replaced forms exactly (NativeCountsSpec
  * differentials): zip_with extends the shorter array with nulls, a
  * null comparison is dropped by `filter(v -> v)` (EqCount skips it)
  * while a null term nulls the running `acc + v` fold (HammingCount
  * returns NULL on length mismatch or a null element).
  */
case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "eq_count"

  private def longArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (longArray(left.dataType) && longArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeCounts.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeCounts.eqCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class HammingCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_count"

  private def intOrLongArray(t: DataType): Option[Boolean] = t match {
    case ArrayType(LongType, _)    => Some(false)
    case ArrayType(IntegerType, _) => Some(true)
    case _                         => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (intOrLongArray(left.dataType), intOrLongArray(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> or two array<bigint> " +
          s"inputs, got ${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString}")
    }

  private def isInt: Boolean =
    intOrLongArray(left.dataType).contains(true)

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeCounts.hamming(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], isInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Long r = graft.functions.NativeCounts.hamming($a, $b, $isInt);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin)
    r
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `token_in_set_count(text, set)` — how many of the text's
  * single-space tokens are members of a small literal string set:
  * `size(filter(split(text, ' '), tk -> tk IN (...)))` without the
  * per-token interpreted lambda (the q35 quality-score stopword count,
  * shared by every quality-gated query). The set child must be a
  * foldable array literal. */
case class TokenInSetCount(child: Expression, set: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = set
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_in_set_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (!(set.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }) || !set.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<string> set")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val setBytes: Array[Array[Byte]] = {
    val a = set.eval().asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes)
      .filter(_ != null)
  }

  override def nullSafeEval(t: Any, s: Any): Any =
    NativeCounts.tokenInSet(t.asInstanceOf[UTF8String], setBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setBytes", setBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.NativeCounts.tokenInSet($t, $ref);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(child = newLeft, set = newRight)
}

object NativeCounts {

  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def hamming(a: ArrayData, b: ArrayData, isInt: Boolean): java.lang.Long = {
    val na = a.numElements()
    if (na != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // int path: Spark's bit_count PROMOTES the int xor to bigint
      // (sign-extending a negative xor to 64 bits) — replicate, don't
      // "fix": the oracle-checked q203/q204 values are defined by it
      s += (if (isInt)
          java.lang.Long.bitCount((a.getInt(i) ^ b.getInt(i)).toLong)
        else java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)))
      i += 1
    }
    s
  }

  def tokenInSet(u: UTF8String, set: Array[Array[Byte]]): Int = {
    val bytes = u.getBytes
    val len = bytes.length
    var c = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        // token = bytes[start, i)
        var m = 0
        var hit = false
        while (!hit && m < set.length) {
          val t = set(m)
          if (t.length == i - start) {
            var j = 0
            var eq = true
            while (eq && j < t.length) {
              if (t(j) != bytes(start + j)) eq = false
              j += 1
            }
            hit = eq
          }
          m += 1
        }
        if (hit) c += 1
        start = i + 1
      }
      i += 1
    }
    c
  }
}
