package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary-vector support (reference: VECTOR_BINARY type internal/core/
  * src/common/Types.h, BIN_FLAT / BIN_IVF_FLAT index names, HAMMING and
  * JACCARD metrics pkg/util/metric/metric_type.go:15-55).
  *
  * Vectors are sign-binarized float arrays packed into `array<long>`
  * words (64 bits per element) — 64× smaller than the float input, which
  * is the point of binary vectors at 100 TB. All math is codegen'd
  * built-ins (`bit_count`, `zip_with`, `aggregate`); distances scan the
  * packed words, not the bits.
  */
object BinaryVector {

  /** Sign bits of a float/double vector: 1 where x > 0 else 0. */
  def signBits(vec: Column): Column =
    transform(vec, x => when(x > 0, 1L).otherwise(0L))

  /** masks(i) = 1L << i (shift builtins need literal amounts). */
  private val BitMasks = typedlit(Seq.tabulate(64)(1L << _))

  /** Pack a 0/1 bit array into 64-bit words (little-endian bit order).
    * Empty input packs to an empty word array — without the guard,
    * `sequence(0, nWords-1)` with nWords=0 evaluates as the DESCENDING
    * sequence [0,-1] and emits two garbage words.
    */
  def pack(bits: Column): Column = {
    val nWords = floor((size(bits) + lit(63)) / lit(64)).cast("int")
    when(size(bits) === 0, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), nWords - 1), w =>
        aggregate(
          zip_with(
            slice(bits, w * 64 + 1, lit(64)),
            BitMasks,
            (b, m) => when(b === 1L, m).otherwise(0L)),
          lit(0L),
          (acc, x) => acc.bitwiseOR(coalesce(x, lit(0L))))))
  }

  /** Binarize + pack in one step. */
  def binarize(vec: Column): Column = pack(signBits(vec))

  /** Hamming distance between two packed binary vectors (lower = closer). */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L),
      (acc, c) => acc + c)

  /** Binary Jaccard similarity: |a ∧ b| / |a ∨ b| (higher = closer). */
  def jaccardBinary(a: Column, b: Column): Column = {
    val inter = aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
      lit(0L), (acc, c) => acc + c).cast("double")
    val union = aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseOR(y)).cast("long")),
      lit(0L), (acc, c) => acc + c).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }
}
