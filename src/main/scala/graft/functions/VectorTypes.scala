package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Narrow vector element types — fp16 / bf16 / int8 — as packed binary
  * columns plus widening decode to float for search (reference:
  * VECTOR_FLOAT16 / VECTOR_BFLOAT16 / VECTOR_INT8 in
  * internal/core/src/common/Types.h:95-105; the wire layout is the
  * IEEE-754 binary16 / brain-float16 / int8 little-endian byte stream).
  *
  * Spark has no 16-bit float type, so the storage representation is a
  * `binary` column (2 bytes or 1 byte per element) — halving / quartering
  * scan bytes vs float32 at 100 TB — and search decodes to float inside
  * the scan via codegen'd expressions (map-only; the packed bytes never
  * shuffle). Conversions use round-to-nearest-even, matching hardware
  * float→half/bf16 casts.
  */
object VectorTypes {

  // --- scalar conversions (exact, RNE) -------------------------------

  /** IEEE-754 binary32 → binary16 bits, round-to-nearest-even. */
  def floatToHalf(f: Float): Short = {
    val x = java.lang.Float.floatToIntBits(f)
    val sign = (x >>> 16) & 0x8000
    val mag = x & 0x7fffffff
    if (mag > 0x7f800000) (sign | 0x7e00).toShort       // NaN → quiet NaN
    else if (mag >= 0x47800000) (sign | 0x7c00).toShort // ≥ 2^16 (incl inf) → inf
    else if (mag < 0x33000000) sign.toShort             // < 2^-25 → ±0 (tie at 2^-25 → even 0)
    else if (mag >= 0x38800000) {                       // normal half
      val h = sign | (((mag >>> 23) - 112) << 10) | ((mag >>> 13) & 0x3ff)
      val rem = mag & 0x1fff
      // rounding carry can overflow mantissa/exponent — that IS the
      // correct result (e.g. 65520 → inf)
      (if (rem > 0x1000 || (rem == 0x1000 && (h & 1) == 1)) h + 1 else h).toShort
    } else {                                            // subnormal half
      val mant = (mag & 0x7fffff) | 0x800000
      val sh = 126 - (mag >>> 23) // in [14, 24]
      val shifted = mant >>> sh
      val rem = mant & ((1 << sh) - 1)
      val half = 1 << (sh - 1)
      val r = if (rem > half || (rem == half && (shifted & 1) == 1)) shifted + 1 else shifted
      (sign | r).toShort
    }
  }

  /** binary16 bits → float (exact; half ⊂ float). */
  def halfToFloat(h: Short): Float = {
    val hi = h & 0xffff
    val sign = if ((hi & 0x8000) != 0) -1f else 1f
    val exp = (hi >>> 10) & 0x1f
    val mant = hi & 0x3ff
    if (exp == 0x1f) { if (mant == 0) sign * Float.PositiveInfinity else Float.NaN }
    else if (exp == 0) sign * mant * 5.9604645e-8f            // 2^-24, exact
    else sign * (0x400 + mant) * math.pow(2.0, exp - 25).toFloat
  }

  /** binary32 → bfloat16 bits (top 16 bits, RNE). */
  def floatToBf16(f: Float): Short = {
    val x = java.lang.Float.floatToIntBits(f)
    if ((x & 0x7fffffff) > 0x7f800000) ((x >>> 16) | 0x40).toShort // quiet NaN
    else {
      val rem = x & 0xffff
      val base = x >>> 16
      (if (rem > 0x8000 || (rem == 0x8000 && (base & 1) == 1)) base + 1 else base).toShort
    }
  }

  /** bfloat16 bits → float (exact). */
  def bf16ToFloat(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  // --- packed array codecs (little-endian, reference wire layout) ----

  def encodeFp16(arr: ArrayData): Array[Byte] = encode16(arr, floatToHalf)
  def decodeFp16(bytes: Array[Byte]): ArrayData = decode16(bytes, halfToFloat)
  def encodeBf16(arr: ArrayData): Array[Byte] = encode16(arr, floatToBf16)
  def decodeBf16(bytes: Array[Byte]): ArrayData = decode16(bytes, bf16ToFloat)

  private def encode16(arr: ArrayData, conv: Float => Short): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = conv(arr.getFloat(i))
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def decode16(bytes: Array[Byte], conv: Short => Float): ArrayData = {
    val n = bytes.length / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = conv((((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** int values clamped to [-128, 127] and packed one byte each. */
  def encodeInt8(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.max(-128, math.min(127, arr.getInt(i))).toByte
      i += 1
    }
    out
  }

  /** int8 bytes widened to float for distance compute. */
  def decodeInt8(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  // --- Column API ----------------------------------------------------

  def fp16(vec: Column): Column = wrap(vec, NarrowVectorCodec.Fp16Enc)
  def fromFp16(bin: Column): Column = wrap(bin, NarrowVectorCodec.Fp16Dec)
  def bf16(vec: Column): Column = wrap(vec, NarrowVectorCodec.Bf16Enc)
  def fromBf16(bin: Column): Column = wrap(bin, NarrowVectorCodec.Bf16Dec)
  def int8(vec: Column): Column = wrap(vec, NarrowVectorCodec.Int8Enc)
  def fromInt8(bin: Column): Column = wrap(bin, NarrowVectorCodec.Int8Dec)

  private def wrap(c: Column, mode: NarrowVectorCodec.Mode): Column =
    ColumnBridge.column(NarrowVectorCodec(ColumnBridge.expression(c), mode))
}

/** Codegen'd encode/decode between float/int arrays and packed binary.
  * One expression class, mode-dispatched at plan time (static call in
  * generated code — no virtual dispatch per row).
  */
case class NarrowVectorCodec(child: Expression, mode: NarrowVectorCodec.Mode)
    extends UnaryExpression {
  import NarrowVectorCodec._

  override def dataType: DataType = mode match {
    case Fp16Enc | Bf16Enc | Int8Enc => BinaryType
    case _ => ArrayType(FloatType, containsNull = false)
  }

  override def prettyName: String = mode.name

  override def checkInputDataTypes(): TypeCheckResult = (mode, child.dataType) match {
    case (Fp16Enc | Bf16Enc, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (Int8Enc, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (Fp16Dec | Bf16Dec | Int8Dec, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (m, other) => TypeCheckResult.TypeCheckFailure(
      s"${m.name} cannot accept ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = mode match {
    case Fp16Enc => VectorTypes.encodeFp16(input.asInstanceOf[ArrayData])
    case Bf16Enc => VectorTypes.encodeBf16(input.asInstanceOf[ArrayData])
    case Int8Enc => VectorTypes.encodeInt8(input.asInstanceOf[ArrayData])
    case Fp16Dec => VectorTypes.decodeFp16(input.asInstanceOf[Array[Byte]])
    case Bf16Dec => VectorTypes.decodeBf16(input.asInstanceOf[Array[Byte]])
    case Int8Dec => VectorTypes.decodeInt8(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = mode match {
      case Fp16Enc => "encodeFp16"
      case Bf16Enc => "encodeBf16"
      case Int8Enc => "encodeInt8"
      case Fp16Dec => "decodeFp16"
      case Bf16Dec => "decodeBf16"
      case Int8Dec => "decodeInt8"
    }
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.VectorTypes$$.MODULE$$.$fn($in);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NarrowVectorCodec {
  sealed abstract class Mode(val name: String)
  case object Fp16Enc extends Mode("fp16_encode")
  case object Fp16Dec extends Mode("fp16_decode")
  case object Bf16Enc extends Mode("bf16_encode")
  case object Bf16Dec extends Mode("bf16_decode")
  case object Int8Enc extends Mode("int8_encode")
  case object Int8Dec extends Mode("int8_decode")
}
