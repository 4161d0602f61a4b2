package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: `minhash_signature(tokens)` builds the
  * word `shingleSize`-gram shingles AND the `numHashes` per-seed minima in
  * one fused, codegen'd loop (reference:
  * internal/util/function/minhash_function.go:29-72 — text → k-shingles →
  * per-seed min-hash signature).
  *
  * Bit-identical to the declarative formula
  * `transform(sequence(0, numHashes-1), seed =>
  *    array_min(transform(shingles(tokens, n), s => xxhash64(seed, s))))`
  * — per-seed hash = XXH64(shingleBytes, seed = XXH64.hashInt(seed, 42))
  * exactly as Spark's `xxhash64(seed, shingle)` folds its children — but
  * without materializing the shingle array, the 64 per-seed long arrays,
  * or leaving whole-stage codegen (higher-order functions are interpreted
  * and defeat common-subexpression elimination; this was 28% of the
  * sf0.1 bench). Seed hashes are precomputed once per query.
  *
  * Precondition: token array elements are non-null (the analyzer's
  * `tokenize` guarantees this); null ELEMENTS are skipped by concatWs
  * like `array_join` would.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  require(numHashes > 0 && shingleSize > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.sql}")
  }

  /** XXH64.hashInt(seed, 42) for seed = 0..numHashes-1 — the per-seed
    * initial state, identical to xxhash64(lit(seed), shingle)'s fold.
    */
  @transient private lazy val seedHashes: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val w = if (n < shingleSize) n else shingleSize
    val nShingles = if (n < shingleSize) 1 else n - shingleSize + 1
    val parts = new Array[UTF8String](w)
    var si = 0
    while (si < nShingles) {
      var j = 0
      while (j < w) {
        parts(j) = if (tokens.isNullAt(si + j)) null else tokens.getUTF8String(si + j)
        j += 1
      }
      val sh = UTF8String.concatWs(MinHashSignature.Space, parts: _*)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUnsafeBytes(
          sh.getBaseObject, sh.getBaseOffset, sh.numBytes, seedHashes(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      si += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seeds = ctx.addReferenceObj("seedHashes", seedHashes, "long[]")
    val space = ctx.addReferenceObj("space", MinHashSignature.Space,
      classOf[UTF8String].getName)
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, tokens => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val nsh = ctx.freshName("nsh")
      val mins = ctx.freshName("mins")
      val parts = ctx.freshName("parts")
      val sh = ctx.freshName("sh")
      val h = ctx.freshName("h")
      val si = ctx.freshName("si")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |int $n = $tokens.numElements();
         |int $w = $n < $shingleSize ? $n : $shingleSize;
         |int $nsh = $n < $shingleSize ? 1 : $n - $shingleSize + 1;
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |UTF8String[] $parts = new UTF8String[$w];
         |for (int $si = 0; $si < $nsh; $si++) {
         |  for (int $j = 0; $j < $w; $j++) {
         |    $parts[$j] = $tokens.isNullAt($si + $j) ? null : $tokens.getUTF8String($si + $j);
         |  }
         |  UTF8String $sh = UTF8String.concatWs($space, $parts);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $h = $xxh.hashUnsafeBytes(
         |      $sh.getBaseObject(), $sh.getBaseOffset(), $sh.numBytes(), $seeds[$k]);
         |    if ($h < $mins[$k]) $mins[$k] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  private[functions] val Space: UTF8String = UTF8String.fromString(" ")
}
