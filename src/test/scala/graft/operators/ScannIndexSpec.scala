package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class ScannIndexSpec extends SparkSpec {

  private lazy val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
  private lazy val n = emb.count().toInt

  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def bruteTopK(k: Int): Map[(Long, Long), Int] = {
    val qdf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    VectorSearch.topK(emb, "vec_id", "embedding", qdf, "qid", "qvec",
        Metric.IP, k)
      .select(col("qid"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
  }

  private lazy val model =
    ScannIndex.trainLocal(emb, "embedding", m = 8, k = 32, dim = 64)
  private lazy val encoded = emb
    .withColumn("_codes", ScannIndex.encode(model, col("embedding"))).cache()

  test("exhaustive shortlist equals brute-force inner-product top-k") {
    val got = ScannIndex.searchRefined(encoded, "vec_id", "_codes",
        "embedding", model, queries, k = 10, shortlist = n)
      .select(col("qid"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    assert(got == bruteTopK(10))
  }

  test("recall@10 at practical shortlist stays high") {
    val got = ScannIndex.searchRefined(encoded, "vec_id", "_codes",
        "embedding", model, queries, k = 10, shortlist = 100)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10).keySet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall@10 at shortlist=100 = $recall")
  }

  test("anisotropic assignment minimizes the anisotropic loss vs L2 assignment") {
    // per-point argmin property: for EVERY row, the anisotropic code's
    // loss is <= the loss of the plain-L2 nearest centroid under the
    // same codebook (equality when they agree)
    val dsub = model.dsub
    val rows = emb.select(col("embedding")).limit(200).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def loss(x: Array[Double], c: Array[Float]): Double = {
      var rr = 0.0; var rx = 0.0; var xx = 0.0
      x.indices.foreach { j =>
        val r = x(j) - c(j); rr += r * r; rx += r * x(j); xx += x(j) * x(j)
      }
      if (xx == 0) rr else rr + (model.eta - 1.0) * rx * rx / xx
    }
    var diverged = 0
    rows.foreach { v =>
      (0 until model.m).foreach { i =>
        val sub = java.util.Arrays.copyOfRange(v, i * dsub, (i + 1) * dsub)
        val cb = model.codebooks(i)
        val l2Pick = cb.indices.minBy { c =>
          sub.indices.map(j => { val d = sub(j) - cb(c)(j); d * d }).sum
        }
        val anisoPick = cb.indices.minBy(c => loss(sub, cb(c)))
        assert(loss(sub, cb(anisoPick)) <= loss(sub, cb(l2Pick)) + 1e-9)
        if (anisoPick != l2Pick) diverged += 1
      }
    }
    // eta = 3 must actually bend some assignments, else it's plain PQ
    assert(diverged > 0, "anisotropic assignment never diverged from L2")
  }

  test("ADC shortlist contains the true MIPS top-k (score-aware contract)") {
    // the anisotropic loss optimizes approximation of HIGH-scoring pairs
    // — the ones that decide top-k (Guo et al. §3). The operational form
    // of that contract: an ADC top-50 shortlist must hold (nearly) all
    // of the exact top-10, per query.
    val want = bruteTopK(10)
    var hitsTotal = 0
    queries.foreach { case (qid, q) =>
      val lut = ScannIndex.lookupTable(model, q)
      val adcTop = encoded
        .withColumn("_adc", ScannIndex.adcScore(col("_codes"), lut))
        .orderBy(col("_adc").desc).limit(100)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      hitsTotal += want.keySet.count { case (wq, id) => wq == qid && adcTop(id) }
    }
    val containment = hitsTotal.toDouble / want.size
    assert(containment >= 0.9, s"ADC top-100 containment of exact top-10 = $containment")
  }
}
