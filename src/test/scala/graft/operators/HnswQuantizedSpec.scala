package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HNSW over quantized storage (HNSW_SQ / HNSW_PQ / HNSW_PRQ,
  * client/index/common.go:50-52): reconstruction fidelity, quantized-
  * graph recall with exact refine, and PRQ's residual-stage property.
  */
class HnswQuantizedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    (0L until 300L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("id", "vec")
  }

  private def bruteTop(qs: Seq[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] = {
    val rows = corpus.as[(Long, Seq[Float])].collect()
    qs.map { case (qid, q) =>
      qid -> rows.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy(_._2).take(k).map(_._1).toSet
    }.toMap
  }

  private def queriesOf(n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(23)
    (0 until n).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
  }

  private def recallOf(variant: HnswQuantized.Variant, refineMult: Int): Double = {
    val qs = queriesOf(6)
    val brute = bruteTop(qs, 10)
    val index = HnswQuantized.build(corpus, "id", "vec", variant,
      numParts = 4, m = 8, efConstruction = 32)
    val got = HnswQuantized.searchRefined(index, corpus, "id", "vec", qs,
      k = 10, ef = 300, refineMult = refineMult)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qs.map { case (qid, _) =>
      (got(qid) intersect brute(qid)).size.toDouble / 10.0
    }.sum / qs.size
  }

  test("SQ8-graph candidates + exact refine recover brute-force top-k") {
    assert(recallOf(HnswQuantized.trainSq(corpus, "vec"), refineMult = 30) == 1.0)
  }

  test("PQ-graph recall is high with a modest refine shortlist") {
    val v = HnswQuantized.trainPq(corpus, "vec", m = 4, k = 16, dim = 16)
    assert(recallOf(v, refineMult = 5) >= 0.85)
  }

  test("PRQ's second stage cuts reconstruction error vs single-stage PQ") {
    val pq = HnswQuantized.trainPq(corpus, "vec", m = 4, k = 16, dim = 16)
    val prq = HnswQuantized.trainPrq(corpus, "vec", m = 4, k = 16, dim = 16)
    def mse(v: HnswQuantized.Variant): Double =
      corpus.withColumn("_r", HnswQuantized.reconstruct(v, col("vec")))
        .select(aggregate(zip_with(col("vec"), col("_r"),
          (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x)
          .as("e"))
        .agg(avg("e")).head().getDouble(0)
    val ePq = mse(pq)
    val ePrq = mse(prq)
    assert(ePrq < ePq * 0.7, s"PRQ mse $ePrq vs PQ mse $ePq")
    // and the better codes translate to at-least-as-good recall
    assert(recallOf(prq, refineMult = 5) >= 0.85)
  }
}
