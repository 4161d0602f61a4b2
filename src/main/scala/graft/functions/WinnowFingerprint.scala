package graft.functions

import java.util.TreeSet

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the rolling-hash fingerprint MOSS uses): polynomial `k`-gram hashes
  * over the (pre-normalized, ASCII) char stream via a true O(1)-per-step
  * rolling update, then the minimum hash of each sliding window of `w`
  * consecutive k-gram hashes, distinct + sorted ascending. Any shared
  * substring of length ≥ k+w-1 between two documents yields a shared
  * fingerprint, so fingerprint overlap is a position-free containment
  * signal (reference analogue: internal/util/function/minhash_function.go
  * applies the same sketch idea at token granularity).
  *
  * The hash is plain modular arithmetic (base 257 mod 2³¹−1, value =
  * Σ code·257^(k-1-j) mod P) rather than an engine hash precisely so
  * external systems can recompute it — the DuckDB oracle evaluates the
  * identical formula per k-gram.
  *
  * A fused expression, not HOFs: the declarative formulation needs each
  * intermediate array materialized per stage, and Catalyst's project
  * collapsing re-inlines them into downstream lambdas — `element_at` over
  * an inlined `transform` re-evaluates the WHOLE upstream array (regex
  * included) per element, O(len²·k) per row. One codegen'd pass is O(len).
  *
  * Precondition: input is already normalized to `[a-z0-9]*` (ASCII) —
  * callers strip other chars first; bytes are hashed as-is.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, txt =>
      s"${ev.value} = graft.functions.WinnowFingerprint.compute($txt, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFingerprint {
  private val P = 2147483647L // 2^31 - 1 (prime)
  private val B = 257L

  /** Shared by interpreted eval and generated code (the generated call
    * keeps the surrounding projection inside whole-stage codegen).
    */
  def compute(txt: UTF8String, k: Int, w: Int): ArrayData = {
    val n = txt.numBytes()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // pow = B^(k-1) mod P (the outgoing char's weight); rolling update:
    // h' = ((h − code_out·pow) mod P + P)·B + code_in mod P
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * B % P; i += 1 }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + (txt.getByte(i) & 0xffL)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      val out = txt.getByte(i - 1) & 0xffL
      val in = txt.getByte(i + k - 1) & 0xffL
      h = (((h - out * pow % P + P) % P) * B + in) % P
      hashes(i) = h
      i += 1
    }
    // min per window of w hashes, distinct + sorted (TreeSet does both);
    // docs shorter than one full window contribute their single min
    val fps = new TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      fps.add(mn)
    } else {
      i = 0
      while (i + w <= m) {
        var mn = Long.MaxValue
        var j = i
        while (j < i + w) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
        fps.add(mn)
        i += 1
      }
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
