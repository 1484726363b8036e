package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of 64-bit shingle hashes, as a
  * native codegen Expression.
  *
  * The composable form — one `array_min(transform(...))` per hash
  * function — evaluates 64 interpreted lambda passes per row (Spark
  * does not codegen higher-order-function lambda bodies), which
  * measured ~15s for 5k docs at sf0.1. This expression computes the
  * whole signature in a single JIT-compiled nested loop: one splitmix64
  * avalanche per (shingle, hash-function) pair, `numHashes` running
  * minima, no intermediate arrays. Same asymptotics, ~50× less
  * constant factor — the difference between a dedup pass being
  * scan-bound vs CPU-bound at 100 TB.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val seeds: Array[Long] = MinHashSignature.seeds(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val z = MinHashSignature.mix(x ^ seeds(j))
        if (z < sig(j)) sig(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val z = ctx.freshName("z")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $z = $x ^ $seedsRef[$j];
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $sig[$j]) $sig[$j] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** splitmix64 finalizer — full avalanche, 5 ALU ops. */
  def mix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic per-hash-function seeds. */
  def seeds(n: Int): Array[Long] =
    Array.tabulate(n)(j => mix(0x9e3779b97f4a7c15L * (j + 1)))

  /** Plain-Scala reference for differential tests. */
  def reference(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val s = seeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    for (x <- shingles; j <- 0 until numHashes) {
      val z = mix(x ^ s(j))
      if (z < sig(j)) sig(j) = z
    }
    sig
  }
}
