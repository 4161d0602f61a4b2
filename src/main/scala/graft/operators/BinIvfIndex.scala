package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{BinaryVector, Metric}

/** BIN_IVF_FLAT — IVF coarse quantization over packed binary vectors
  * with HAMMING distance (reference: knowhere BIN_IVF_FLAT in the index
  * list, tests/integration/util_index.go:32-46; binary k-means uses
  * per-bit majority-vote centroids).
  *
  * Same scale shape as [[IvfIndex]]: the codebook trains driver-locally
  * on a bounded sample (binary k-majority), rides inside a map-only
  * assignment expression, the layout clusters by centroid id for
  * zone-map pruning, and search probes `nprobe` centroids — with
  * nprobe = nlist it is exhaustive and equals BIN_FLAT exactly.
  */
object BinIvfIndex {

  /** Binary centroids as packed 64-bit words. */
  case class Model(centroids: Array[Array[Long]], nlist: Int)

  private def hammingWords(a: ArrayData, b: Array[Long]): Int = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b(i)); i += 1 }
    acc
  }

  /** Driver-local binary k-means on a bounded sample: assignment by
    * Hamming, centroid update by per-bit majority vote over members.
    */
  def train(corpus: DataFrame, packedCol: String, nlist: Int, nbits: Int,
      maxTrainRows: Int = 65536, seed: Long = 42L, maxIter: Int = 10): Model = {
    val rows = corpus.select(col(packedCol)).limit(maxTrainRows).collect()
      .map(_.getSeq[Long](0).toArray)
    require(rows.nonEmpty, "empty training set")
    val words = rows.head.length
    // nbits is declared width; fail fast if the packed data disagrees
    // rather than silently training on a different width
    require(nbits == words * 64,
      s"nbits=$nbits but packed vectors carry ${words * 64} bits ($words words)")
    val rnd = new scala.util.Random(seed)
    val distinct = rnd.shuffle(rows.toSeq).map(_.toSeq).distinct.map(_.toArray)
    val k = math.min(nlist, distinct.size)
    val centers = distinct.take(k).map(_.clone).toArray
    val assign = new Array[Int](rows.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var p = 0
      while (p < rows.length) {
        var best = 0; var bestD = Int.MaxValue; var c = 0
        while (c < k) {
          var d = 0; var w = 0
          while (w < words) {
            d += java.lang.Long.bitCount(rows(p)(w) ^ centers(c)(w)); w += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best || iter == 0) { assign(p) = best; moved = true }
        p += 1
      }
      // per-bit majority vote per cluster
      val votes = Array.fill(k, words * 64)(0)
      val counts = new Array[Int](k)
      var p2 = 0
      while (p2 < rows.length) {
        val c = assign(p2); counts(c) += 1
        var w = 0
        while (w < words) {
          val word = rows(p2)(w)
          var b = 0
          while (b < 64) {
            if (((word >>> b) & 1L) == 1L) votes(c)(w * 64 + b) += 1
            b += 1
          }
          w += 1
        }
        p2 += 1
      }
      var c2 = 0
      while (c2 < k) {
        if (counts(c2) > 0) {
          var w = 0
          while (w < words) {
            var word = 0L
            var b = 0
            while (b < 64) {
              if (2 * votes(c2)(w * 64 + b) > counts(c2)) word |= (1L << b)
              b += 1
            }
            centers(c2)(w) = word
            w += 1
          }
        }
        c2 += 1
      }
      iter += 1
    }
    Model(centers, k)
  }

  def assign(model: Model, packed: Column): Column =
    ColumnBridge.column(NearestBinaryCentroids(
      ColumnBridge.expression(packed), model.centroids, 1))

  def probes(model: Model, packed: Column, nprobe: Int): Column =
    ColumnBridge.column(NearestBinaryCentroids(
      ColumnBridge.expression(packed), model.centroids, nprobe))

  /** Clustered layout, zone-map prunable by `_cluster`. */
  def layout(corpus: DataFrame, packedCol: String, model: Model): DataFrame =
    corpus.withColumn("_cluster", assign(model, col(packedCol)))
      .repartitionByRange(col("_cluster"))
      .sortWithinPartitions(col("_cluster"))

  /** Probe-pruned Hamming search; nprobe = nlist ⇒ exhaustive/exact. */
  def search(clustered: DataFrame, idCol: String, packedCol: String, model: Model,
      queries: DataFrame, qidCol: String, qpackedCol: String,
      k: Int, nprobe: Int, outputCols: Seq[String] = Nil): DataFrame = {
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val probeCol = if (nprobe == 1) assign(model, col(qpackedCol))
                   else explode(probes(model, col(qpackedCol), nprobe))
    val probed = queries.select(col(qidCol), col(qpackedCol), probeCol.as("_cluster"))
    val scored = clustered
      .join(broadcast(probed), "_cluster")
      .withColumn("_score",
        BinaryVector.hamming(col(packedCol), col(qpackedCol)).cast("double"))
    // HAMMING is lower-is-better — reuse the L2 ordering in the reduce
    VectorSearch.reduceTopK(scored, idCol, qidCol, Metric.L2, k, out)
  }
}

/** Nearest / top-`nprobe` binary centroids by Hamming distance —
  * map-only, codebook rides in the task binary.
  */
case class NearestBinaryCentroids(child: Expression, centroids: Array[Array[Long]],
    nprobe: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (nprobe == 1) IntegerType else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bin_ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs packed array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dists = new Array[Int](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      // a width mismatch (re-trained codebook, differently-packed probe)
      // must fail, not assign clusters from a prefix Hamming distance —
      // same contract as VectorDistance's dim check
      if (arr.numElements() != ctr.length) throw new IllegalArgumentException(
        s"$prettyName: vector has ${arr.numElements()} words, centroid has ${ctr.length}")
      val n = ctr.length
      var acc = 0; var i = 0
      while (i < n) { acc += java.lang.Long.bitCount(arr.getLong(i) ^ ctr(i)); i += 1 }
      dists(c) = acc
      c += 1
    }
    if (nprobe == 1) {
      var best = 0; var i = 1
      while (i < dists.length) { if (dists(i) < dists(best)) best = i; i += 1 }
      best
    } else {
      new GenericArrayData(dists.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2))
    }
  }

  /** Codegen for the hot nprobe=1 encode path (corpus-wide layout
    * assignment); the nq-sized probe path keeps the fallback.
    */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    if (nprobe != 1) return super.doGenCode(ctx, ev)
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ctr = ctx.freshName("ctr")
      s"""
         |int $best = 0;
         |int $bestD = Integer.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  long[] $ctr = $cRef[$c];
         |  if ($v.numElements() != $ctr.length) {
         |    throw new IllegalArgumentException(
         |      "bin_ivf_assign: vector has " + $v.numElements() +
         |      " words, centroid has " + $ctr.length);
         |  }
         |  int $acc = 0;
         |  for (int $i = 0; $i < $ctr.length; $i++) {
         |    $acc += java.lang.Long.bitCount($v.getLong($i) ^ $ctr[$i]);
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  // content equality over the centroid arrays (see SrpBands)
  override def equals(o: Any): Boolean = o match {
    case t: NearestBinaryCentroids => t.nprobe == nprobe && t.child == child &&
      java.util.Arrays.deepEquals(
        t.centroids.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nprobe),
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
