package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{Metric, TopKFunctions}

/** `ivf_assign(vec)` — nearest / top-`nprobe` nearest centroid ids by L2.
  * Map-only: the codebook rides inside the expression (serialized with
  * the task binary, like a broadcast), so centroid assignment never
  * shuffles the corpus — the scale-critical property for building an IVF
  * layout over 100 TB.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (nprobe == 1) IntegerType else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ivf_assign needs a float array, got $other")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), centroids(0).length)
    val dists = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val d = x - ctr(i)
        acc += d * d
        i += 1
      }
      dists(c) = acc
      c += 1
    }
    if (nprobe == 1) {
      var best = 0; var i = 1
      while (i < dists.length) { if (dists(i) < dists(best)) best = i; i += 1 }
      best
    } else {
      val idx = dists.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2)
      new GenericArrayData(idx)
    }
  }

  /** Codegen for the hot nprobe=1 ENCODE path (every corpus row passes
    * through it when building an IVF layout); the nprobe>1 probe path is
    * query-side (nq rows) and keeps the interpreted fallback.
    */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    if (nprobe != 1) return super.doGenCode(ctx, ev)
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val get =
      if (isFloat) (a: String, i: String) => s"(double)$a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $dim = java.lang.Math.min($v.numElements(), $cRef[0].length);
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $d = ${get(v, i)} - $cRef[$c][$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  // content equality over the centroid arrays — reference equality would
  // break sameResult/cache reuse across identical query submissions
  // (see SrpBands for the failure mode)
  override def equals(o: Any): Boolean = o match {
    case t: NearestCentroids => t.nprobe == nprobe && t.child == child &&
      java.util.Arrays.deepEquals(
        t.centroids.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nprobe),
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF (inverted-file) vector index: KMeans codebook + cluster-id data
  * layout + probe-pruned search.
  *
  * Reference semantics: IVF_FLAT (knowhere; names in tests/integration/
  * util_index.go:32-46, interim index IVFFLAT_CC nlist≈√chunkRows,
  * internal/core/src/segcore/IndexConfigGenerator.cpp:37). Spark-first
  * re-expression (SURVEY.md §2.6): the "index" IS the data layout —
  * `repartitionByRange(cluster_id)`-style clustering means Parquet
  * row-group min/max stats on cluster_id prune unprobed clusters at scan
  * time, the same coarse-quantizer pruning IVF does in-memory.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Float]], nlist: Int)

  /** Train the codebook with MLlib KMeans (seeded, on an optional sample). */
  def train(corpus: DataFrame, vecCol: String, nlist: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L, maxIter: Int = 20): Model = {
    val sampled = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val train = sampled.select(array_to_vector(
      col(vecCol).cast(ArrayType(DoubleType))).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(train)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)), nlist)
  }

  /** Train driver-locally on a bounded sample — the standard coarse-
    * quantizer shape at any corpus size (FAISS/knowhere train IVF
    * codebooks on ~10⁵ sampled vectors regardless of scale): one narrow
    * `limit(maxTrainRows)` collect + seeded Lloyd's in memory. Avoids
    * distributed KMeans' per-iteration job fan-out (pure scheduler
    * overhead at codebook scale); layout/search remain distributed.
    */
  def trainLocal(corpus: DataFrame, vecCol: String, nlist: Int,
      maxTrainRows: Int = 65536, seed: Long = 42L, maxIter: Int = 10): Model = {
    val rows = corpus.select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .limit(maxTrainRows).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty training set")
    val centers = PqIndex.lloyd(rows, nlist, seed, maxIter).map(_.map(_.toFloat))
    Model(centers, centers.length)
  }

  def assign(model: Model, vec: Column): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec), model.centroids, 1))

  def probes(model: Model, vec: Column, nprobe: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec), model.centroids, nprobe))

  /** Materialize the clustered layout: adds `_cluster` and repartitions
    * by it so each output file covers few clusters (zone-map-prunable).
    */
  def layout(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    corpus
      .withColumn("_cluster", assign(model, col(vecCol)))
      .repartitionByRange(col("_cluster"))
      .sortWithinPartitions(col("_cluster"))

  /** IVF search: probe the `nprobe` nearest clusters per query, then
    * exact distances within probed clusters only. With nprobe = nlist
    * this is exhaustive (== brute force).
    *
    * The probed (qid, cluster) pairs are nq·nprobe rows → broadcast; the
    * corpus side is filtered by the semi-joinable `_cluster` column
    * before any distance math.
    */
  def search(clustered: DataFrame, idCol: String, vecCol: String, model: Model,
      queries: DataFrame, qidCol: String, qvecCol: String,
      metric: Metric.Value, k: Int, nprobe: Int,
      outputCols: Seq[String] = Nil, roundTo: Option[Int] = None): DataFrame = {
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val probeCol = if (nprobe == 1) assign(model, col(qvecCol))
                   else explode(probes(model, col(qvecCol), nprobe))
    val probed = queries.select(col(qidCol), col(qvecCol), probeCol.as("_cluster"))
    val scored = clustered
      .join(broadcast(probed), "_cluster")
      .withColumn("_score", {
        val raw = graft.functions.VectorFunctions.distance(col(vecCol), col(qvecCol), metric)
        roundTo.map(d => round(raw, d)).getOrElse(raw)
      })
    VectorSearch.reduceTopK(scored, idCol, qidCol, metric, k, out)
  }
}
