package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.graft.ColumnBridge

/** SCANN-style anisotropic product quantization (reference: the SCANN
  * index type — tests/integration/util_index.go:32-46 `IndexScaNN`,
  * internal/util/vecindexmgr/vector_index_mgr.go:111; algorithm: Guo et
  * al., "Accelerating Large-Scale Inference with Anisotropic Vector
  * Quantization", ICML 2020).
  *
  * The reference's SCANN build is an accelerator-tuned knowhere binding;
  * what defines SCANN *algorithmically* is the anisotropic quantization
  * loss: for residual r = x − x̃ split into components parallel/orthogonal
  * to x, the loss η·‖r_par‖² + ‖r_orth‖² with η > 1 — parallel error
  * perturbs inner-product scores of high-scoring pairs the most, so
  * spending codebook precision there preserves MIPS ranking. This module
  * implements that loss as a PQ variant on [[PqIndex]]'s scaffolding:
  *
  *  - train: per-subspace seeded k-means init ([[PqIndex.lloyd]]), then
  *    anisotropic Lloyd rounds — assignment by the anisotropic loss and
  *    the paper's weighted least-squares centroid update
  *    (Σ(I + (η−1)·x̂x̂ᵀ)(x − c) = 0, a dsub×dsub solve per centroid).
  *    Driver-local on a bounded sample, like every codebook train here.
  *  - encode: map-only [[AnisotropicAssign]] expression per subspace —
  *    the per-subspace decoupling of the paper's joint loss (parallel
  *    component taken against the subvector; the joint coordinate-descent
  *    coupling is a documented divergence, not expressible as a per-row
  *    column without iterative state).
  *  - search: inner-product ADC — per-query LUT of ⟨q_i, c⟩ broadcast as
  *    a literal, approximate score = Σ_i lut[i][code_i], shortlist by
  *    approx IP, exact-IP refine — [[PqIndex.searchRefined]]'s shape in
  *    the MIPS domain. shortlist = corpus ⇒ exact (the oracle mode,
  *    q_scann_exhaustive); practical-shortlist recall in ScannIndexSpec.
  *
  * Scale shape: identical to PQ — train is one bounded collect, encode
  * and search are map-only over codes (the corpus vector column is only
  * touched by the refine join on the nq·shortlist candidate rows).
  */
object ScannIndex {

  /** codebooks(i)(c) = centroid c of subspace i; η is the anisotropic
    * weight used at train AND encode time.
    */
  case class Model(codebooks: Array[Array[Array[Float]]], dim: Int, eta: Double) {
    def m: Int = codebooks.length
    def dsub: Int = dim / m
  }

  /** Anisotropic loss of quantizing subvector x to centroid c:
    * ‖r‖² + (η−1)·(x̂·r)², r = x − c (equals ‖r_orth‖² + η‖r_par‖²).
    */
  private def anisoLoss(x: Array[Double], c: Array[Float], eta: Double): Double = {
    var rr = 0.0; var rx = 0.0; var xx = 0.0
    var j = 0
    while (j < x.length) {
      val r = x(j) - c(j)
      rr += r * r; rx += r * x(j); xx += x(j) * x(j)
      j += 1
    }
    if (xx == 0.0) rr else rr + (eta - 1.0) * rx * rx / xx
  }

  /** Train: k-means init per subspace, then `anisoIters` rounds of
    * anisotropic assignment + weighted least-squares centroid update.
    */
  def trainLocal(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int,
      eta: Double = 3.0, maxTrainRows: Int = 65536, seed: Long = 42L,
      maxIter: Int = 10, anisoIters: Int = 5): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(eta >= 1.0, s"eta must be >= 1 (got $eta)")
    val dsub = dim / m
    val rows = corpus.select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .limit(maxTrainRows).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty training set")
    val codebooks = Array.tabulate(m) { i =>
      val sub = rows.map(v => java.util.Arrays.copyOfRange(v, i * dsub, (i + 1) * dsub))
      var centers = PqIndex.lloyd(sub, k, seed + i, maxIter).map(_.map(_.toFloat))
      var it = 0
      while (it < anisoIters) {
        centers = anisoRound(sub, centers, eta)
        it += 1
      }
      centers
    }
    Model(codebooks, dim, eta)
  }

  /** One anisotropic Lloyd round: anisotropic-loss assignment, then per
    * centroid solve Σ_p (I + (η−1)·x̂_p x̂_pᵀ) c = Σ_p (I + (η−1)·x̂_p x̂_pᵀ) x_p
    * (the stationarity condition of the summed anisotropic loss).
    */
  private def anisoRound(points: Array[Array[Double]],
      centers: Array[Array[Float]], eta: Double): Array[Array[Float]] = {
    val k = centers.length
    val d = points.head.length
    val assign = points.map { p =>
      var best = 0; var bestL = Double.MaxValue; var c = 0
      while (c < k) {
        val l = anisoLoss(p, centers(c), eta)
        if (l < bestL) { bestL = l; best = c }
        c += 1
      }
      best
    }
    Array.tabulate(k) { c =>
      val mine = points.indices.filter(assign(_) == c)
      if (mine.isEmpty) centers(c)
      else {
        // accumulate A = Σ (I + (η-1) x̂x̂ᵀ), b = Σ (I + (η-1) x̂x̂ᵀ) x
        val a = Array.fill(d)(new Array[Double](d))
        val b = new Array[Double](d)
        mine.foreach { pi =>
          val x = points(pi)
          var xx = 0.0
          var j = 0
          while (j < d) { xx += x(j) * x(j); j += 1 }
          val w = if (xx == 0.0) 0.0 else (eta - 1.0) / xx
          var r = 0
          while (r < d) {
            a(r)(r) += 1.0
            b(r) += x(r)
            var cc = 0
            while (cc < d) {
              val t = w * x(r) * x(cc)
              a(r)(cc) += t
              b(r) += t * x(cc)
              cc += 1
            }
            r += 1
          }
        }
        solve(a, b).map(_.toFloat)
      }
    }
  }

  /** Gaussian elimination with partial pivoting (dsub×dsub, tiny). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone)
    val y = b.clone
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val ty = y(col); y(col) = y(piv); y(piv) = ty
      val p = m(col)(col)
      if (math.abs(p) > 1e-12) {
        r = col + 1
        while (r < n) {
          val f = m(r)(col) / p
          if (f != 0.0) {
            var cc = col
            while (cc < n) { m(r)(cc) -= f * m(col)(cc); cc += 1 }
            y(r) -= f * y(col)
          }
          r += 1
        }
      }
      col += 1
    }
    val x = new Array[Double](n)
    var r2 = n - 1
    while (r2 >= 0) {
      var s = y(r2)
      var cc = r2 + 1
      while (cc < n) { s -= m(r2)(cc) * x(cc); cc += 1 }
      x(r2) = if (math.abs(m(r2)(r2)) > 1e-12) s / m(r2)(r2) else 0.0
      r2 -= 1
    }
    x
  }

  /** Encode a vector into `m` codes by anisotropic-loss argmin, map-only. */
  def encode(model: Model, vec: Column): Column = {
    val dsub = model.dsub
    array((0 until model.m).map { i =>
      ColumnBridge.column(AnisotropicAssign(
        ColumnBridge.expression(slice(vec, i * dsub + 1, dsub)),
        model.codebooks(i), model.eta))
    }: _*)
  }

  /** Inner-product lookup table: lut(i)(c) = ⟨q_i, codebook_i(c)⟩. */
  def lookupTable(model: Model, query: Array[Float]): Array[Array[Double]] =
    Array.tabulate(model.m) { i =>
      val offset = i * model.dsub
      model.codebooks(i).map { ctr =>
        var acc = 0.0; var j = 0
        while (j < model.dsub) { acc += query(offset + j).toDouble * ctr(j); j += 1 }
        acc
      }
    }

  /** Approximate IP of an encoded row to a query's LUT: Σ_i lut(i)(code_i). */
  def adcScore(codes: Column, lut: Array[Array[Double]]): Column =
    aggregate(
      zip_with(codes, typedlit(lut.map(_.toSeq).toSeq), (c, row) =>
        element_at(row, c + 1)),
      lit(0.0),
      (acc, d) => acc + d)

  /** ADC shortlist by approximate IP, exact-IP refine — MIPS top-k.
    * shortlist = corpus ⇒ exact brute-force inner-product ranking.
    */
  def searchRefined(encoded: DataFrame, idCol: String, codesCol: String,
      vecCol: String, model: Model, queries: Seq[(Long, Array[Float])],
      k: Int, shortlist: Int, roundTo: Option[Int] = None): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val perQuery = queries.map { case (qid, qvec) =>
      val scored = encoded.withColumn("_score",
        adcScore(col(codesCol), lookupTable(model, qvec)))
        .withColumn("qid", lit(qid))
      VectorSearch.reduceTopK(scored, idCol, "qid", graft.functions.Metric.IP,
        shortlist, Seq(idCol))
    }
    val candidates0 = perQuery.reduce(_ unionByName _)
      .select(col("qid"), col(idCol))
    val candidates =
      if (queries.size.toLong * shortlist <= 1000000L) broadcast(candidates0)
      else candidates0
    val qDf = queries.map { case (qid, v) => (qid, v.toSeq) }.toDF("qid", "_qvec")
    val raw = graft.functions.VectorFunctions.ip(col(vecCol), col("_qvec"))
    val exact = candidates
      .join(encoded.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qDf), "qid")
      .withColumn("_score", roundTo.map(d => round(raw, d)).getOrElse(raw))
    VectorSearch.reduceTopK(exact, idCol, "qid", graft.functions.Metric.IP,
      k, Seq(idCol))
  }
}

/** argmin_c of the anisotropic loss ‖x−c‖² + (η−1)·(x̂·(x−c))² over a
  * literal codebook — the SCANN assignment kernel as a scalar expression
  * (the anisotropic sibling of [[NearestCentroids]]).
  */
case class AnisotropicAssign(child: Expression, centroids: Array[Array[Float]],
    eta: Double) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "scann_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"scann_assign needs a float array, got $other")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), centroids(0).length)
    var xx = 0.0
    var j = 0
    while (j < dim) {
      val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      xx += x * x
      j += 1
    }
    var best = 0
    var bestL = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var rr = 0.0; var rx = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val r = x - ctr(i)
        rr += r * r; rx += r * x
        i += 1
      }
      val l = if (xx == 0.0) rr else rr + (eta - 1.0) * rx * rx / xx
      if (l < bestL) { bestL = l; best = c }
      c += 1
    }
    best
  }

  /** Codegen: the encode path runs on every corpus row. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val get =
      if (isFloat) (a: String, i: String) => s"(double)$a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val xx = ctx.freshName("xx")
      val best = ctx.freshName("best")
      val bestL = ctx.freshName("bestL")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val rr = ctx.freshName("rr")
      val rx = ctx.freshName("rx")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      val l = ctx.freshName("l")
      s"""
         |int $dim = java.lang.Math.min($v.numElements(), $cRef[0].length);
         |double $xx = 0.0;
         |for (int $j = 0; $j < $dim; $j++) {
         |  double $x = ${get(v, j)};
         |  $xx += $x * $x;
         |}
         |int $best = 0;
         |double $bestL = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double $rr = 0.0;
         |  double $rx = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = ${get(v, i)};
         |    double $r = $x - $cRef[$c][$i];
         |    $rr += $r * $r;
         |    $rx += $r * $x;
         |  }
         |  double $l = ($xx == 0.0) ? $rr : $rr + ($eta - 1.0) * $rx * $rx / $xx;
         |  if ($l < $bestL) { $bestL = $l; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  // content equality over the centroid arrays (see SrpBands)
  override def equals(o: Any): Boolean = o match {
    case t: AnisotropicAssign => t.eta == eta && t.child == child &&
      java.util.Arrays.deepEquals(
        t.centroids.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Double.valueOf(eta),
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
