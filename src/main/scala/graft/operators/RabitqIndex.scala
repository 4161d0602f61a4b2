package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF_RABITQ (reference client/index/ivf.go:140-178 — nlist +
  * `rbq_bits` ∈ [1, 9] + optional exact refine; the index itself lives
  * in the reference's external index library, so the ALGORITHM here is
  * from the public RaBitQ paper, Gao & Long, SIGMOD 2024): per-cluster
  * residuals are rotated by a seeded random orthonormal matrix and
  * quantized to `bits` per dimension (1 bit = the paper's sign
  * quantization), with two per-row correction scalars — the residual
  * norm and <x̄, r̂> — making the inner-product estimator
  * <r̂, q̂> ≈ <x̄_unit, ŷ_q> / <x̄_unit, r̂> unbiased enough to rank a
  * shortlist that an exact-distance refine then re-ranks.
  *
  * Spark-first scale shape: build is map-only (centroid assign + rotate
  * + quantize ride the task binary — the corpus never shuffles);
  * queries rotate DRIVER-side (nq·nprobe·dim² flops, request-sized) and
  * broadcast as (qid, cluster, rotated-residual) rows; the estimator is
  * a codegen'd bit-dot over the packed codes; the refine joins a
  * shortlist against the corpus exactly like [[PqIndex]]/[[Sq8Index]].
  * shortlist ≥ corpus and nprobe = nlist ⇒ exact top-k (the oracle
  * configuration).
  */
object RabitqIndex {

  final case class Model(centroids: Array[Array[Float]],
      rotation: Array[Array[Float]], bits: Int) {
    def dim: Int = rotation.length
    def nlist: Int = centroids.length
  }

  /** rbq_bits takes the client range [1, 9] as an ERROR (the out-of-
    * range value is rejected rather than silently defaulted —
    * ivf.go:140-143).
    */
  def validateBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 9,
      s"rbq_bits [$bits] is invalid, it should be in range [1, 9]")

  /** Seeded random orthonormal rotation (Gaussian + Gram-Schmidt). */
  private[operators] def randomRotation(dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) { // subtract projections on previous rows
        var dot = 0.0; var k = 0
        while (k < dim) { dot += m(i)(k) * m(j)(k); k += 1 }
        k = 0
        while (k < dim) { m(i)(k) -= dot * m(j)(k); k += 1 }
        j += 1
      }
      var nrm = 0.0; var k = 0
      while (k < dim) { nrm += m(i)(k) * m(i)(k); k += 1 }
      val inv = 1.0 / math.sqrt(math.max(nrm, 1e-30))
      k = 0
      while (k < dim) { m(i)(k) *= inv; k += 1 }
      i += 1
    }
    m.map(_.map(_.toFloat))
  }

  def train(corpus: DataFrame, vecCol: String, nlist: Int, bits: Int = 1,
      seed: Long = 42L, trainSample: Int = 10000): Model = {
    validateBits(bits)
    val ivf = IvfIndex.trainLocal(corpus, vecCol, nlist, trainSample)
    val dim = ivf.centroids(0).length
    Model(ivf.centroids, randomRotation(dim, seed), bits)
  }

  /** Map-only encode: one pass adds (cluster id, packed codes, residual
    * norm, correction) — the original vectors stay for the refine.
    */
  def layout(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    val withCl = corpus.withColumn("_cl",
      IvfIndex.assign(IvfIndex.Model(model.centroids, model.nlist), col(vecCol)))
    withCl.withColumn("_rq",
      ColumnBridge.column(RabitqEncode(
        ColumnBridge.expression(col(vecCol)),
        ColumnBridge.expression(col("_cl")), model)))
      .select(col("*"), col("_rq.codes").as("_codes"),
        col("_rq.rnorm").as("_rnorm"), col("_rq.corr").as("_corr"))
      .drop("_rq")
  }

  /** Estimator-ranked shortlist + exact refine. `nprobe` clusters per
    * query by centroid distance; shortlist ≥ corpus and nprobe = nlist
    * make the result exactly brute-force top-k.
    */
  def search(encoded: DataFrame, idCol: String, vecCol: String, model: Model,
      queries: Seq[(Long, Array[Float])], k: Int, nprobe: Int,
      shortlist: Int, roundTo: Option[Int] = None): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val dim = model.dim
    // driver-side per-(query, probed-cluster) rotated residuals —
    // nq·nprobe rows, request-sized, broadcast
    val qRows = queries.flatMap { case (qid, q) =>
      val byDist = model.centroids.zipWithIndex.map { case (c, ci) =>
        var acc = 0.0; var i = 0
        while (i < dim) { val d = q(i) - c(i); acc += d * d; i += 1 }
        (ci, acc)
      }.sortBy(_._2).take(math.max(1, nprobe))
      byDist.map { case (ci, _) =>
        val c = model.centroids(ci)
        val qr = new Array[Double](dim)
        var i = 0; var n2 = 0.0
        while (i < dim) { qr(i) = q(i) - c(i); n2 += qr(i) * qr(i); i += 1 }
        val qnorm = math.sqrt(n2)
        val yq = new Array[Float](dim)
        if (qnorm > 0) {
          var r = 0
          while (r < dim) {
            var acc = 0.0; var j = 0
            while (j < dim) { acc += model.rotation(r)(j) * qr(j) / qnorm; j += 1 }
            yq(r) = acc.toFloat; r += 1
          }
        }
        (qid, ci, yq.toSeq, qnorm)
      }
    }
    val qDf = broadcast(qRows.toDF("qid", "_cl", "_yq", "_qnorm"))
    val bitdot = ColumnBridge.column(RabitqBitDot(
      ColumnBridge.expression(col("_codes")),
      ColumnBridge.expression(col("_yq")), model.bits, dim))
    // est ||v − q||² = rnorm² + qnorm² − 2·rnorm·qnorm·(<x̄,ŷq>/<x̄,r̂>)
    val est = col("_rnorm") * col("_rnorm") + col("_qnorm") * col("_qnorm") -
      lit(2.0) * col("_rnorm") * col("_qnorm") * (bitdot / col("_corr"))
    val approx = encoded.join(qDf, "_cl").withColumn("_score", est)
    val candidates0 = VectorSearch
      .reduceTopK(approx, idCol, "qid", graft.functions.Metric.L2, shortlist, Seq(idCol))
      .select(col("qid"), col(idCol))
    val candidates =
      if (queries.size.toLong * shortlist <= 1000000L) broadcast(candidates0)
      else candidates0
    val exactQ = broadcast(
      queries.map { case (qid, v) => (qid, v.toSeq) }.toDF("qid", "_qvec"))
    val raw = graft.functions.VectorFunctions.l2(col(vecCol), col("_qvec"))
    val exact = candidates
      .join(encoded.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(exactQ, "qid")
      .withColumn("_score", roundTo.map(d => round(raw, d)).getOrElse(raw))
    VectorSearch.reduceTopK(exact, idCol, "qid", graft.functions.Metric.L2, k, Seq(idCol))
  }
}

/** Build-time encode: (vec, cluster) → struct<codes, rnorm, corr>.
  * One pass at build; the tight loops are plain JVM arrays, so the
  * CodegenFallback only costs the struct boxing (the same tradeoff as
  * NearestCentroids' probe path).
  */
case class RabitqEncode(vec: Expression, cluster: Expression,
    model: RabitqIndex.Model)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = cluster
  override def prettyName: String = "rabitq_encode"

  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false),
    StructField("corr", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, cluster.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rabitq_encode needs (array<float>, int), got $other")
  }

  override def nullSafeEval(v: Any, c: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cl = c.asInstanceOf[Int]
    val dim = model.dim
    val centroid = model.centroids(cl)
    // residual + norm
    val r = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      r(i) = arr.getFloat(i).toDouble - centroid(i); n2 += r(i) * r(i); i += 1
    }
    val rnorm = math.sqrt(n2)
    if (rnorm == 0.0) {
      // zero residual: estimator contributes qnorm² exactly
      val nBytes = RabitqCodes.byteLen(model.bits, dim)
      return InternalRow(new Array[Byte](nBytes), 0.0, 1.0)
    }
    // rotated normalized residual
    val y = new Array[Double](dim)
    var row = 0
    while (row < dim) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += model.rotation(row)(j) * r(j) / rnorm; j += 1 }
      y(row) = acc; row += 1
    }
    val (codes, corr) = RabitqCodes.encode(y, model.bits)
    InternalRow(codes, rnorm, corr)
  }

  // content equality — Model holds nested Array fields, which compare
  // by reference under case-class equality (see Sq8Codec/SrpBands):
  // without this, sameResult/CacheManager reuse breaks
  override def equals(o: Any): Boolean = o match {
    case t: RabitqEncode => t.vec == vec && t.cluster == cluster &&
      t.model.bits == model.bits &&
      java.util.Arrays.deepEquals(
        t.model.centroids.asInstanceOf[Array[AnyRef]],
        model.centroids.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.deepEquals(
        t.model.rotation.asInstanceOf[Array[AnyRef]],
        model.rotation.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, cluster, Integer.valueOf(model.bits),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        model.centroids.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        model.rotation.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cluster = r)
}

/** Search-time estimator numerator <x̄_unit, ŷ_q> over the packed
  * codes — the per-(row × probe) hot path, codegen'd.
  */
case class RabitqBitDot(codes: Expression, yq: Expression, bits: Int, dim: Int)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = yq
  override def prettyName: String = "rabitq_bitdot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, yq.dataType) match {
    case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rabitq_bitdot needs (binary, array<float>), got $other")
  }

  override def nullSafeEval(c: Any, q: Any): Any =
    RabitqCodes.bitDot(c.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData], bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.operators.RabitqCodes$$.MODULE$$.bitDot($c, $q, $bits, $dim);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, yq = r)
}

/** Packed-code codecs shared by eval and generated code.
  *
  * Layout: bits == 1 → dim sign bits, MSB-first ( x̄_unit_i = ±1/√dim ).
  * bits > 1 → 12-byte header (mn, mx, invnorm as floats) then dim codes
  * of `bits` bits each: x̄_i = mn + code_i·(mx−mn)/(2^bits−1),
  * x̄_unit = x̄·invnorm.
  */
object RabitqCodes {

  def byteLen(bits: Int, dim: Int): Int =
    (if (bits == 1) 0 else 12) + (dim * bits + 7) / 8

  /** Quantize the rotated UNIT residual; returns (packed, <x̄_unit, y>). */
  def encode(y: Array[Double], bits: Int): (Array[Byte], Double) = {
    val dim = y.length
    val out = new Array[Byte](byteLen(bits, dim))
    if (bits == 1) {
      val inv = 1.0 / math.sqrt(dim.toDouble)
      var corr = 0.0
      var i = 0
      while (i < dim) {
        if (y(i) >= 0) {
          out(i >> 3) = (out(i >> 3) | (1 << (7 - (i & 7)))).toByte
          corr += y(i) * inv
        } else corr -= y(i) * inv
        i += 1
      }
      (out, math.max(corr, 1e-12))
    } else {
      var mn = Double.MaxValue; var mx = Double.MinValue
      var i = 0
      while (i < dim) { if (y(i) < mn) mn = y(i); if (y(i) > mx) mx = y(i); i += 1 }
      val levels = (1 << bits) - 1
      val span = math.max(mx - mn, 1e-30)
      val codes = new Array[Int](dim)
      var norm2 = 0.0
      i = 0
      while (i < dim) {
        val code = math.max(0, math.min(levels,
          math.round((y(i) - mn) / span * levels).toInt))
        codes(i) = code
        val xb = mn + code.toDouble / levels * span
        norm2 += xb * xb
        i += 1
      }
      val invnorm = 1.0 / math.sqrt(math.max(norm2, 1e-30))
      var corr = 0.0
      i = 0
      while (i < dim) {
        val xb = mn + codes(i).toDouble / levels * span
        corr += xb * invnorm * y(i)
        i += 1
      }
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putFloat(mn.toFloat); bb.putFloat(mx.toFloat); bb.putFloat(invnorm.toFloat)
      // pack codes MSB-first
      var bitPos = 96 // 12 header bytes
      i = 0
      while (i < dim) {
        var b = bits - 1
        while (b >= 0) {
          if (((codes(i) >> b) & 1) == 1)
            out(bitPos >> 3) = (out(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
          bitPos += 1; b -= 1
        }
        i += 1
      }
      (out, math.max(corr, 1e-12))
    }
  }

  /** <x̄_unit, yq> from the packed form. */
  def bitDot(packed: Array[Byte], yq: ArrayData, bits: Int, dim: Int): Double = {
    if (bits == 1) {
      val inv = 1.0 / math.sqrt(dim.toDouble)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val q = yq.getFloat(i).toDouble
        if ((packed(i >> 3) & (1 << (7 - (i & 7)))) != 0) acc += q * inv
        else acc -= q * inv
        i += 1
      }
      acc
    } else {
      val bb = java.nio.ByteBuffer.wrap(packed)
      val mn = bb.getFloat(0).toDouble
      val mx = bb.getFloat(4).toDouble
      val invnorm = bb.getFloat(8).toDouble
      val levels = (1 << bits) - 1
      val span = math.max(mx - mn, 1e-30)
      var acc = 0.0
      var bitPos = 96
      var i = 0
      while (i < dim) {
        var code = 0
        var b = 0
        while (b < bits) {
          code = (code << 1) |
            (if ((packed(bitPos >> 3) & (1 << (7 - (bitPos & 7)))) != 0) 1 else 0)
          bitPos += 1; b += 1
        }
        acc += (mn + code.toDouble / levels * span) * invnorm * yq.getFloat(i)
        i += 1
      }
      acc
    }
  }
}
