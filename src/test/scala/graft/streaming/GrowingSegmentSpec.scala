package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric
import graft.operators.{IvfIndex, VectorSearch}

/** Growing-segment interim index (reference: IVFFLAT_CC / SCANN_DVR in
  * segcore/IndexConfigGenerator.cpp:37 — growing segments get a cheap
  * interim index while sealed segments use the full one). Spark
  * re-expression: sealed data carries the IVF clustered layout and is
  * probe-pruned; the (small) growing tail is scanned brute-force; the
  * two hit lists reduce together — results must equal one brute-force
  * search over the union.
  */
class GrowingSegmentSpec extends SparkSpec {
  import spark.implicits._

  test("sealed IVF probes + growing brute force == brute force over the union") {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
    // sealed = most of the corpus; growing = a recent tail (ids >= cut)
    val cut = 180L
    val sealedSeg = emb.filter($"vec_id" < cut)
    val growing = emb.filter($"vec_id" >= cut)

    val q = emb.filter($"vec_id" === 11)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))

    val model = IvfIndex.train(sealedSeg, "embedding", nlist = 8)
    val clustered = IvfIndex.layout(sealedSeg, "embedding", model)
    // exhaustive probes on sealed so the union result is exactly
    // comparable (pruned-probe recall is covered in Bm25IvfSpec)
    val sealedHits = IvfIndex.search(clustered, "vec_id", "embedding", model,
      q, "qid", "qvec", Metric.COSINE, k = 10, nprobe = 8)
    val growingScored = growing.crossJoin(broadcast(q))
      .withColumn("_score",
        graft.functions.VectorFunctions.cosine($"embedding", $"qvec"))
    val growingHits = VectorSearch.reduceTopK(
      growingScored, "vec_id", "qid", Metric.COSINE, 10, Seq("vec_id"))

    // merge the per-segment topk lists: global re-reduce on the union
    val merged = sealedHits.select($"qid", $"_score", $"vec_id")
      .unionByName(growingHits.select($"qid", $"_score", $"vec_id"))
    val finalHits = VectorSearch.reduceTopK(
        merged, "vec_id", "qid", Metric.COSINE, 10, Seq("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq

    val exact = VectorSearch.topK(emb, "vec_id", "embedding",
        q, "qid", "qvec", Metric.COSINE, k = 10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(finalHits == exact)
  }
}
