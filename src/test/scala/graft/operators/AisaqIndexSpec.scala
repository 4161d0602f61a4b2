package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

/** AISAQ composition (client/index/disk_ann.go:74-158): Vamana over
  * PQ reconstructions + exact refine — exactness at exhaustive beam,
  * recall at practical beam, the DiskANN search_list contract, and the
  * 8-key build-param validation.
  */
class AisaqIndexSpec extends SparkSpec {

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

  // PQ at 16×32 (4-dim subspaces) — the reconstruction fidelity an
  // inline-PQ graph needs for its beam ranking to be useful on
  // unclustered data; coarser codebooks push the work onto the refine
  private lazy val model = AisaqIndex.train(emb, "embedding", m = 16, k = 32,
    dim = 64, numParts = 4, r = 16, l = 32)
  private lazy val index =
    AisaqIndex.build(emb, "vec_id", "embedding", model).cache()

  test("exhaustive beam + corpus-wide refine equals brute force exactly") {
    val got = AisaqIndex.searchRefined(index, emb, "vec_id", "embedding",
        queries, k = 10, searchList = n, refineMult = n / 10 + 1)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteTopK(10))
  }

  test("practical beam keeps high recall (PQ beam + exact refine)") {
    val got = AisaqIndex.searchRefined(index, emb, "vec_id", "embedding",
        queries, k = 10, searchList = 96, refineMult = 6)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10)
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.8, s"beam-96 recall@10 = $recall")
  }

  test("search_list below k is DiskANN's named rejection") {
    val e = intercept[IllegalArgumentException](
      AisaqIndex.searchRefined(index, emb, "vec_id", "embedding",
        queries, k = 10, searchList = 5))
    assert(e.getMessage.contains("search_list_size(5) should be larger than k(10)"))
  }

  test("the 8-key AISAQ build-param contract validates present keys only") {
    import IndexParamCheck.{check, FloatVector}
    // unset params stay absent and validate nothing (disk_ann.go:100-105)
    check("AISAQ", FloatVector, Map("metric_type" -> "L2"))
    // every key accepted at a legal value
    check("AISAQ", FloatVector, Map("metric_type" -> "L2",
      "inline_pq" -> "16", "pq_cache_size" -> "1048576",
      "rearrange" -> "true", "pq_read_io_engine" -> "uring",
      "num_entry_points" -> "4", "pq_read_page_cache_size" -> "65536",
      "beamwidth" -> "8", "vectors_beamwidth" -> "4"))
    def bad(k: String, v: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException](
        check("AISAQ", FloatVector, Map("metric_type" -> "L2", k -> v)))
      assert(e.getMessage.contains(msg), s"$k=$v → ${e.getMessage}")
    }
    bad("inline_pq", "2049", "out of range")
    bad("inline_pq", "-1", "out of range")
    bad("pq_cache_size", "-5", "non-negative")
    bad("pq_read_page_cache_size", "-1", "non-negative")
    bad("num_entry_points", "0", "positive")
    bad("beamwidth", "0", "positive")
    bad("vectors_beamwidth", "-2", "positive")
    bad("rearrange", "yes", "boolean")
    bad("pq_read_io_engine", "sync", "aio or uring")
    bad("inline_pq", "x", "must be an integer")
    // the metric gate still applies to the AISAQ branch
    val eM = intercept[IllegalArgumentException](
      check("AISAQ", FloatVector, Map("metric_type" -> "HAMMING")))
    assert(eM.getMessage.contains("not found or not supported"))
  }
}
