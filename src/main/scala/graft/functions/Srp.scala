package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Signed-random-projection (SRP) LSH band keys for a dense vector.
  *
  * Output element `b` is the `rowsPerBand`-bit key formed by the sign
  * bits of the vector's dot products with hyperplanes
  * `planes[b*rowsPerBand ... (b+1)*rowsPerBand-1]` — two vectors share a
  * band key iff all of that band's sign bits agree. P[sign bit agrees] =
  * 1 − θ/π for angle θ (the classic SRP property), so banding turns
  * cosine near-duplicate search into an equi-join on (band, key), the
  * same shape as MinHash-LSH (reference analogue: the minhash LSH index,
  * internal/core/src/minhash/; SRP is its cosine-metric counterpart).
  *
  * A native Catalyst expression with codegen: the bands·dim multiply-add
  * loop is the per-row hot path of embedding dedup, and HOF formulations
  * (`transform`/`aggregate`) stay interpreted — measured ~40× slower at
  * a few thousand rows × 384 planes.
  */
case class SrpBands(
    child: Expression,
    planes: Array[Array[Double]],
    rowsPerBand: Int)
    extends UnaryExpression {

  private def numBands: Int = planes.length / rowsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (elementType != FloatType && elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${child.dataType.sql}")
    else if (rowsPerBand <= 0 || rowsPerBand > 63)
      TypeCheckResult.TypeCheckFailure(s"rowsPerBand must be in [1,63], got $rowsPerBand")
    else if (planes.isEmpty || planes.length % rowsPerBand != 0)
      TypeCheckResult.TypeCheckFailure(
        s"planes (${planes.length}) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val isFloat = elementType == FloatType
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val plane = planes(b * rowsPerBand + j)
        require(plane.length == dim,
          s"$prettyName: vector dim $dim != plane dim ${plane.length}")
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += plane(i) * (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
          i += 1
        }
        key = (key << 1) | (if (dot > 0) 1L else 0L)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get =
      if (elementType == FloatType) (a: String, i: String) => s"(double)$a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      s"""
         |int $dim = $v.numElements();
         |long[] $keys = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    double[] $plane = $planesRef[$b * $rowsPerBand + $j];
         |    if ($plane.length != $dim) {
         |      throw new IllegalArgumentException(
         |        "srp_bands: vector dim " + $dim + " != plane dim " + $plane.length);
         |    }
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $plane[$i] * ${get(v, i)};
         |    }
         |    $key = ($key << 1) | ($dot > 0 ? 1L : 0L);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  // Array fields compare by REFERENCE under case-class equality, which
  // breaks plan canonicalization: two submissions of the identical query
  // build distinct plane arrays, sameResult() returns false, and the
  // CacheManager registers a fresh cache entry per run instead of
  // reusing the existing one — recomputing this expression's pass over
  // the (AQE-coalesced, low-parallelism) cached child each time. Deep
  // content equality restores cross-submission plan identity.
  override def equals(o: Any): Boolean = o match {
    case t: SrpBands => t.rowsPerBand == rowsPerBand && t.child == child &&
      java.util.Arrays.deepEquals(
        t.planes.asInstanceOf[Array[AnyRef]], planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(rowsPerBand),
      Integer.valueOf(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpFunctions {

  /** Deterministic Gaussian hyperplanes: `count` planes of `dim` dims. */
  def gaussianPlanes(count: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(count)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Column API: array of `planes.length / rowsPerBand` SRP band keys. */
  def srpBands(vec: Column, planes: Array[Array[Double]], rowsPerBand: Int): Column =
    ExpressionUtils.column(
      SrpBands(ExpressionUtils.expression(vec), planes, rowsPerBand))
}
