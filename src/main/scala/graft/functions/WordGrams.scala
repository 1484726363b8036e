package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(text, n, minOne)` — the space-joined word n-grams of a
  * text, as ONE native codegen pass over the UTF-8 bytes.
  *
  * Bit-identical (WordGramsSpec differentials) to the interpreted
  * forms it replaces, because every space-joined n-gram of tokens
  * split on a SINGLE-space delimiter is literally a SUBSTRING of the
  * original text (the tokens are the maximal runs between 0x20 bytes,
  * empties included, and the join separator equals the split
  * delimiter) — so the kernel just records token boundaries and emits
  * zero-copy byte slices:
  *  - `transform(sequence(0, size(sp) - 3), i -> concat_ws(' ',
  *    sp[i+1], sp[i+2], sp[i+3]))` (Ranking.trigramFrame, n = 3,
  *    minOne = false; empty array under n tokens);
  *  - `transform(sequence(1, size(sp) - (n-1)), i -> concat_ws(' ',
  *    slice(sp, i, n)))` (Decontaminate.gramPosFrame);
  *  - `transform(sequence(0, greatest(size(toks) - w, 0)), i ->
  *    array_join(slice(toks, i + 1, w), ' '))` (Dedup.tokenWindows,
  *    minOne = true: a doc under w tokens contributes ONE window —
  *    the whole text, since slice caps at the token count).
  *
  * The replaced HOFs ran interpreted per POSITION on the hottest text
  * scans of the trigram-LM / decontamination / window-novelty
  * families, allocating per-gram concat buffers; this emits slices of
  * one byte array per row. 0x20 never occurs inside a multi-byte
  * UTF-8 sequence, so byte scanning is code-point-safe.
  */
case class WordGrams(child: Expression, n: Int, minOne: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordGrams.grams(input.asInstanceOf[UTF8String], n, minOne)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.WordGrams.grams($c, $n, $minOne);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_grams_arr(tokens, n, minOne)` — [[WordGrams]] over an
  * already-split token array. For a consumer that ALSO needs a
  * per-doc column derived from the tokens (Dedup.tokenWindows'
  * n_tokens), the text-input form is a trap: the optimizer inlines
  * the sibling `size(split(text))` ABOVE the Generate, re-running the
  * split once per exploded window and carrying `text` through the
  * generator (the round-13 CollapseProject-through-Generate class —
  * measured 2× on q119/q120). With the token ARRAY as the generator
  * input, the array is referenced twice below the Generate (size +
  * generator), so the split projection stays put — the exact plan
  * shape of the interpreted form it replaces. Gram strings are
  * identical to `concat_ws(' ', slice(tokens, i, n))` /
  * `array_join(slice(tokens, i+1, n), ' ')` (null elements skipped
  * with their separator, like both; unreachable from split). */
case class WordGramsArr(child: Expression, n: Int, minOne: Boolean)
    extends UnaryExpression {

  private def stringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams_arr"

  override def checkInputDataTypes(): TypeCheckResult =
    if (stringArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordGrams.gramsFromTokens(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n, minOne)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.WordGrams.gramsFromTokens($c, $n, $minOne);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {

  /** Static so generated code calls one tight loop. */
  def grams(u: UTF8String, n: Int, minOne: Boolean): GenericArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // space positions; k tokens = spaces + 1
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val k = spaces + 1
    val count = k - n + 1
    if (count < 1) {
      if (minOne) new GenericArrayData(Array[Any](u))
      else new GenericArrayData(Array.empty[Any])
    } else {
      val sp = new Array[Int](spaces)
      var s = 0
      i = 0
      while (i < len) {
        if (bytes(i) == 0x20) { sp(s) = i; s += 1 }
        i += 1
      }
      // token t spans [start(t), end(t)): start(0) = 0, start(t) =
      // sp(t-1)+1; end(t) = sp(t) for t < k-1, else len. gram g spans
      // [start(g), end(g + n - 1)).
      val out = new Array[Any](count)
      var g = 0
      while (g < count) {
        val from = if (g == 0) 0 else sp(g - 1) + 1
        val until = if (g + n - 1 == k - 1) len else sp(g + n - 1)
        out(g) = UTF8String.fromBytes(bytes, from, until - from)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  /** [[WordGramsArr]] kernel: grams by concatenation over a token
    * array, single-space separators, nulls skipped with their
    * separator (concat_ws/array_join semantics — unreachable from
    * split output). */
  def gramsFromTokens(a: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, minOne: Boolean): GenericArrayData = {
    val k = a.numElements()
    val count = k - n + 1
    if (count < 1) {
      if (minOne) new GenericArrayData(Array[Any](joinRange(a, 0, k)))
      else new GenericArrayData(Array.empty[Any])
    } else {
      val out = new Array[Any](count)
      var g = 0
      while (g < count) {
        out(g) = joinRange(a, g, g + n)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  private def joinRange(a: org.apache.spark.sql.catalyst.util.ArrayData,
      from: Int, until: Int): UTF8String = {
    var bytes = 0
    var m = 0
    var i = from
    while (i < until) {
      if (!a.isNullAt(i)) { bytes += a.getUTF8String(i).numBytes(); m += 1 }
      i += 1
    }
    val out = new Array[Byte](bytes + math.max(m - 1, 0))
    var p = 0
    var first = true
    i = from
    while (i < until) {
      if (!a.isNullAt(i)) {
        if (!first) { out(p) = 0x20; p += 1 }
        val t = a.getUTF8String(i)
        t.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + p)
        p += t.numBytes()
        first = false
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
