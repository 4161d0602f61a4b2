package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

/** IVF_HNSW composite (client/index/common.go:53): coarse-quantized
  * cells each carrying an HNSW graph — exactness at full probes /
  * exhaustive beam, pruning recall on clusterable data, and the param
  * contracts of both halves.
  */
class IvfHnswIndexSpec extends SparkSpec {

  private lazy val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
  private lazy val n = emb.count().toInt

  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def bruteTopK(k: Int): Set[(Long, Long)] = {
    val qdf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    VectorSearch.topK(emb, "vec_id", "embedding", qdf, "qid", "qvec",
        Metric.L2, k)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val model =
    IvfHnswIndex.train(emb, "embedding", nlist = 8, m = 8, efConstruction = 32)
  private lazy val index =
    IvfHnswIndex.build(emb, "vec_id", "embedding", model).cache()

  test("full probes + exhaustive beam equals brute force exactly") {
    val got = IvfHnswIndex.search(index, model, queries, k = 10, ef = n,
        nprobe = 8)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteTopK(10))
  }

  test("pruned probes on clusterable data keep high recall") {
    import spark.implicits._
    // 8 well-separated blobs — the shape centroid pruning is built for
    val rnd = new scala.util.Random(7L)
    val dim = 16
    val corpus = (0 until 400).map { i =>
      val blob = i % 8
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d == blob * 2) 10f else 0f) + rnd.nextFloat()))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val m = IvfHnswIndex.train(df, "embedding", nlist = 8, m = 8,
      efConstruction = 32)
    val idx = IvfHnswIndex.build(df, "vec_id", "embedding", m).cache()
    val qs = corpus.take(6)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val want = qs.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) => (qid, id, l2(qv, v)) }
        .sortBy(t => (t._3, t._2)).take(10).map(t => (qid, t._2))
    }.toSet
    val got = IvfHnswIndex.search(idx, m, qs, k = 10, ef = 64, nprobe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"nprobe=2/8 recall@10 = $recall")
    idx.unpersist()
  }

  test("param contracts: graph M range, nlist range, ef >= k, nprobe bounds") {
    val eM = intercept[IllegalArgumentException](
      IvfHnswIndex.train(emb, "embedding", nlist = 4, m = 1))
    assert(eM.getMessage.contains("should be in range [2,"))
    val eN = intercept[IllegalArgumentException](
      IvfHnswIndex.train(emb, "embedding", nlist = 0))
    assert(eN.getMessage.contains("out of range"))
    val eEf = intercept[IllegalArgumentException](
      IvfHnswIndex.search(index, model, queries, k = 10, ef = 1, nprobe = 8))
    assert(eEf.getMessage == "requirement failed: ef(1) should be larger than k(10)")
    val eP = intercept[IllegalArgumentException](
      IvfHnswIndex.search(index, model, queries, k = 10, ef = 64, nprobe = 9))
    assert(eP.getMessage.contains("nprobe 9 out of range"))
    // and the CreateIndex-path validation accepts the kind with the
    // graph rules applied (no longer accept-only: build/search above)
    IndexParamCheck.check("IVF_HNSW", IndexParamCheck.FloatVector,
      Map("metric_type" -> "L2", "nlist" -> "8", "M" -> "8",
        "efConstruction" -> "32"))
    val eCheck = intercept[IllegalArgumentException](
      IndexParamCheck.check("IVF_HNSW", IndexParamCheck.FloatVector,
        Map("metric_type" -> "L2", "M" -> "1")))
    assert(eCheck.getMessage.contains("out of range"))
  }
}
