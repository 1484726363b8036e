package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-code-point stride-`stride` shingles of a string, each packed
  * big-endian into one long — `(acc << 8) + codePoint` per position,
  * past-end positions contributing 0 — as ONE native codegen pass.
  *
  * Bit-identical to the two interpreted forms it replaces (pinned by
  * PackedShinglesSpec):
  *  - `transform(sequence(1, greatest(length(text)-k+1, 1), stride),
  *     i -> substring(text, i, k))` + the per-gram
  *     `shiftleft(acc,8) + ascii(substring(gram,i,1))` fold
  *     (the q126 packedGrams pipeline), including the left-justified
  *     zero-pad of a short (< k chars) text and, with `distinct`,
  *     `array_distinct`'s first-occurrence order;
  *  - the gram STRINGS themselves wherever only type identity matters
  *     (q127's spectrum): the pack is injective for NUL-free Latin-1
  *     text (8 × 8 bits), so counts over packed longs equal counts
  *     over gram strings exactly.
  *
  * The replaced form allocated one substring per position and ran the
  * lambda interpreted (HOFs never reach codegen — the standing rule);
  * this walks the UTF-8 bytes once (ASCII fast path; code-point array
  * otherwise, matching Spark's code-point `substring`/`length`
  * semantics for any input).
  */
case class PackedShingles(child: Expression, k: Int, stride: Int = 1,
    distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_shingles"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PackedShingles.shingles(
      input.asInstanceOf[UTF8String], k, stride, distinct))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PackedShingles.shingles($c, $k, $stride, $distinct));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedShingles {

  /** Static so generated code calls one tight JIT-friendly loop. */
  def shingles(u: UTF8String, k: Int, stride: Int,
      distinct: Boolean): Array[Long] = {
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) packBytes(bytes, k, stride, distinct)
    else packCps(u.toString.codePoints().toArray, k, stride, distinct)
  }

  private def packBytes(b: Array[Byte], k: Int, stride: Int,
      distinct: Boolean): Array[Long] = {
    val len = b.length
    val wins = math.max((len - k) / stride + 1, 1)
    val out = new Array[Long](wins)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](wins * 2)
      else null
    var m = 0
    var w = 0
    while (w < wins) {
      val p = w * stride
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc << 8) + (if (p + j < len) (b(p + j) & 0xffL) else 0L)
        j += 1
      }
      if (seen == null || seen.add(acc)) { out(m) = acc; m += 1 }
      w += 1
    }
    if (m == wins) out else java.util.Arrays.copyOf(out, m)
  }

  private def packCps(cps: Array[Int], k: Int, stride: Int,
      distinct: Boolean): Array[Long] = {
    val len = cps.length
    val wins = math.max((len - k) / stride + 1, 1)
    val out = new Array[Long](wins)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](wins * 2)
      else null
    var m = 0
    var w = 0
    while (w < wins) {
      val p = w * stride
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc << 8) + (if (p + j < len) cps(p + j).toLong else 0L)
        j += 1
      }
      if (seen == null || seen.add(acc)) { out(m) = acc; m += 1 }
      w += 1
    }
    if (m == wins) out else java.util.Arrays.copyOf(out, m)
  }
}
