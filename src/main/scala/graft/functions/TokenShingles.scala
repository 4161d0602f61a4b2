package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-shingle builder: one pass from a token array to the
  * (optionally distinct) `n`-token shingle strings — semantically
  * identical to `array_distinct(transform(sequence(0, size-n), i =>
  * array_join(slice(tokens, i+1, n), " ")))` plus the size<n
  * whole-document fallback, but without the interpreted higher-order
  * chain (HOFs don't codegen; the shingle pass dominates the dedup /
  * decontamination pipelines the same way the signature pass did before
  * [[MinHashSignature]] fused it).
  */
case class TokenShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, tokens =>
      s"${ev.value} = $cls.compute($tokens, $n, $distinct);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenShingles {
  private val Space: UTF8String = UTF8String.fromString(" ")

  /** Shared by eval and generated code (a single static call keeps the
    * expression inside whole-stage codegen with no per-element lambda).
    */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val size = tokens.numElements()
    val w = if (size < n) size else n
    val nShingles = if (size < n) 1 else size - n + 1
    val parts = new Array[UTF8String](w)
    val out = new Array[AnyRef](nShingles)
    val seen = if (distinct) new java.util.HashSet[UTF8String](nShingles * 2) else null
    var m = 0
    var si = 0
    while (si < nShingles) {
      var j = 0
      while (j < w) {
        parts(j) = if (tokens.isNullAt(si + j)) null else tokens.getUTF8String(si + j)
        j += 1
      }
      val sh = UTF8String.concatWs(Space, parts: _*)
      if (!distinct || seen.add(sh)) { out(m) = sh; m += 1 }
      si += 1
    }
    if (m == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
