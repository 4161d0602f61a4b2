package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable 60-bit SimHash over DISTINCT tokens, fused into one codegen'd
  * pass: per-token 60-bit hash = first 15 hex chars of md5 (exactly
  * `conv(substring(md5(t),1,15),16,10)`), bit j of the signature = sign
  * of the ±1 vote sum across distinct tokens.
  *
  * Bit-identical to the declarative formula in [[graft.operators.Dedup]]
  * (and to the DuckDB oracle's SQL recomputation) but without the
  * per-token 60-element array zip_with the interpreted HOF chain paid —
  * votes accumulate in a primitive long[60]. md5 still dominates; that
  * cost is shared with any engine computing the portable signature.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tokens =>
      s"${ev.value} = graft.functions.SimHash60$$.MODULE$$.compute($tokens);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash60 {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Corpus vocabulary is tiny relative to token instances ("the"
    * recurs in every doc), so memoize token→hash per thread. Keys are
    * COPIED — the incoming UTF8String may alias a reused row buffer.
    * Cleared when it outgrows a bound so adversarial vocabularies can't
    * grow it without limit.
    */
  private val memo = new ThreadLocal[java.util.HashMap[UTF8String, java.lang.Long]] {
    override def initialValue() = new java.util.HashMap[UTF8String, java.lang.Long](1 << 14)
  }
  private val MemoCap = 1 << 16

  /** First 60 bits of md5(token) — the value of the first 15 hex chars
    * of the digest parsed base-16 (= first 8 bytes big-endian >>> 4).
    */
  def hash60(token: UTF8String): Long = {
    val m = memo.get()
    val hit = m.get(token)
    if (hit != null) return hit.longValue()
    val md = digest.get()
    md.reset()
    val d = md.digest(token.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>>= 4
    if (m.size() >= MemoCap) m.clear()
    m.put(token.copy(), v)
    v
  }

  /** The packed 60-bit signature over the DISTINCT non-null tokens. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (seen.add(t)) {
          val h = hash60(t)
          var j = 0
          while (j < 60) {
            votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
