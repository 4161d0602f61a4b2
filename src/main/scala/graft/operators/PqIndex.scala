package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.graft.ColumnBridge

/** Product quantization (reference: IVF_PQ index type — knowhere; names
  * in tests/integration/util_index.go:32-46): vectors are split into `m`
  * subspaces, each quantized against its own KMeans codebook of `k`
  * centroids; a vector compresses to `m` small codes (32× for
  * dim=64, m=8, k≤256 vs float32).
  *
  * Spark-first shape:
  *  - train: `m` seeded KMeans fits on vector slices (driver loop over
  *    subspaces; each fit is a distributed job on a sample).
  *  - encode: map-only — per-subspace nearest-centroid ids via the same
  *    [[NearestCentroids]] expression IVF uses, over `slice()`d vectors.
  *    The codebook rides in the task binary; nothing shuffles.
  *  - search (ADC): the query side is nq rows — the per-query lookup
  *    table (m × k distances) is computed driver-side and broadcast as a
  *    literal column; approximate distance is then a pure column fold
  *    `Σ_i lut[i][code_i]`, no vector math on the corpus at query time.
  */
object PqIndex {

  /** codebooks(i)(c) = centroid c of subspace i (length dsub each). */
  case class Model(codebooks: Array[Array[Array[Float]]], dim: Int) {
    def m: Int = codebooks.length
    def dsub: Int = dim / m
  }

  /** Train per-subspace codebooks with seeded MLlib KMeans. */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L, maxIter: Int = 10): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val sampled = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val cached = sampled.select(col(vecCol).cast(ArrayType(DoubleType)).as("v")).cache()
    try {
      val codebooks = (0 until m).map { i =>
        val sub = cached.select(
          array_to_vector(slice(col("v"), i * dsub + 1, dsub)).as("features"))
        new KMeans().setK(k).setSeed(seed + i).setMaxIter(maxIter).fit(sub)
          .clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
      Model(codebooks, dim)
    } finally { cached.unpersist() }
  }

  /** Train codebooks driver-locally on a bounded sample — the standard
    * PQ shape at any corpus size (FAISS/knowhere train on ~10⁵ sampled
    * vectors regardless of scale): one narrow `limit(maxTrainRows)`
    * collect, then seeded Lloyd's per subspace in memory. Avoids the
    * m×(init+iters) Spark-job fan-out of distributed KMeans, which is
    * pure scheduler overhead at codebook scale; encode/search remain
    * fully distributed.
    */
  def trainLocal(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int,
      maxTrainRows: Int = 65536, seed: Long = 42L, maxIter: Int = 10): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val rows = corpus.select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .limit(maxTrainRows).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty training set")
    val codebooks = Array.tabulate(m) { i =>
      val sub = rows.map(v => java.util.Arrays.copyOfRange(v, i * dsub, (i + 1) * dsub))
      lloyd(sub, k, seed + i, maxIter).map(_.map(_.toFloat))
    }
    Model(codebooks, dim)
  }

  /** Seeded Lloyd's iterations; k-distinct-points init. Shared with
    * [[IvfIndex.trainLocal]].
    */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    val dsub = points.head.length
    val rnd = new scala.util.Random(seed)
    // init: first k distinct points in shuffled order (k-means++ quality
    // doesn't matter when the consumer refines exactly; determinism does)
    val distinct = rnd.shuffle(points.toSeq).distinct
    val kEff = math.min(k, distinct.size)
    val centers = distinct.take(kEff).map(_.clone).toArray
    val assign = new Array[Int](points.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < kEff) {
          var d = 0.0; var j = 0
          while (j < dsub) { val x = points(p)(j) - centers(c)(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best || iter == 0) { assign(p) = best; moved = true }
        p += 1
      }
      val sums = Array.fill(kEff)(new Array[Double](dsub))
      val counts = new Array[Int](kEff)
      var p2 = 0
      while (p2 < points.length) {
        val c = assign(p2); counts(c) += 1
        var j = 0
        while (j < dsub) { sums(c)(j) += points(p2)(j); j += 1 }
        p2 += 1
      }
      var c2 = 0
      while (c2 < kEff) {
        if (counts(c2) > 0) {
          var j = 0
          while (j < dsub) { centers(c2)(j) = sums(c2)(j) / counts(c2); j += 1 }
        }
        c2 += 1
      }
      iter += 1
    }
    centers
  }

  /** Encode a vector into `m` centroid ids (array<int>), map-only. */
  def encode(model: Model, vec: Column): Column = {
    val dsub = model.dsub
    array((0 until model.m).map { i =>
      ColumnBridge.column(NearestCentroids(
        ColumnBridge.expression(slice(vec, i * dsub + 1, dsub)),
        model.codebooks(i), 1))
    }: _*)
  }

  /** Squared-L2 lookup table for one query vector: lut(i)(c) =
    * ||q_i − codebook_i(c)||². Driver-side, O(m·k·dsub).
    */
  def lookupTable(model: Model, query: Array[Float]): Array[Array[Double]] =
    Array.tabulate(model.m) { i =>
      val offset = i * model.dsub
      model.codebooks(i).map { ctr =>
        var acc = 0.0; var j = 0
        while (j < model.dsub) {
          val d = query(offset + j).toDouble - ctr(j); acc += d * d; j += 1
        }
        acc
      }
    }

  /** ADC distance of an encoded corpus row to a fixed query's LUT:
    * Σ_i lut(i)(code_i) — a codegen-friendly fold over the code array.
    */
  def adcDistance(codes: Column, lut: Array[Array[Double]]): Column =
    aggregate(
      zip_with(codes, typedlit(lut.map(_.toSeq).toSeq), (c, row) =>
        element_at(row, c + 1)),
      lit(0.0),
      (acc, d) => acc + d)

  /** Approximate top-k by ADC over pre-encoded codes for a single query.
    * `queries` rows are collected (they are request parameters, nq·dim
    * floats — never corpus data).
    */
  def search(encoded: DataFrame, idCol: String, codesCol: String, model: Model,
      queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    val perQuery = queries.map { case (qid, qvec) =>
      val scored = encoded.withColumn("_score",
        adcDistance(col(codesCol), lookupTable(model, qvec)))
        .withColumn("qid", lit(qid))
      VectorSearch.reduceTopK(scored, idCol, "qid", graft.functions.Metric.L2,
        k, Seq(idCol))
    }
    perQuery.reduce(_ unionByName _)
  }

  /** ADC shortlist + exact refine: quantized distances select `shortlist`
    * candidates (cheap, code-array scan only), then true distances re-rank
    * the shortlist — the standard recall fix for PQ, and the shape the
    * reference's IVF_PQ serving takes. The shortlist is nq·k' rows, so
    * the refine join broadcasts it against the corpus vectors.
    */
  def searchRefined(encoded: DataFrame, idCol: String, codesCol: String,
      vecCol: String, model: Model, queries: Seq[(Long, Array[Float])],
      k: Int, shortlist: Int, roundTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val spark = encoded.sparkSession
    import spark.implicits._
    val candidates0 = search(encoded, idCol, codesCol, model, queries, shortlist)
      .select(col("qid"), col(idCol))
    // broadcast is right when the shortlist is the usual nq·k' rows;
    // an exhaustive configuration (shortlist ≈ corpus, the oracle-check
    // mode) must NOT force a corpus-sized broadcast — let AQE decide.
    val candidates =
      if (queries.size.toLong * shortlist <= 1000000L) broadcast(candidates0)
      else candidates0
    val qDf = queries.map { case (qid, v) => (qid, v.toSeq) }.toDF("qid", "_qvec")
    val raw = graft.functions.VectorFunctions.l2(col(vecCol), col("_qvec"))
    val exact = candidates
      .join(encoded.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qDf), "qid")
      .withColumn("_score", roundTo.map(d => round(raw, d)).getOrElse(raw))
    VectorSearch.reduceTopK(exact, idCol, "qid", graft.functions.Metric.L2, k, Seq(idCol))
  }
}
