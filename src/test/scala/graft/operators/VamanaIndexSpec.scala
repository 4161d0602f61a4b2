package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class VamanaIndexSpec extends SparkSpec {

  private lazy val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
  private lazy val n = emb.count().toInt

  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def bruteTopK(k: Int): Map[(Long, Long), Int] = {
    val qdf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    VectorSearch.topK(emb, "vec_id", "embedding", qdf, "qid", "qvec",
        Metric.L2, k)
      .select(col("qid"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
  }

  private lazy val index =
    VamanaIndex.build(emb, "vec_id", "embedding", numParts = 4, r = 16,
      l = 32).cache()

  test("exhaustive beam equals brute force exactly (connectivity guarantee)") {
    val got = VamanaIndex.search(index, queries, k = 10, l = n)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    val want = bruteTopK(10)
    assert(got == want)
  }

  test("recall@10 at practical beam width stays high") {
    val got = VamanaIndex.search(index, queries, k = 10, l = 64)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10).keySet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("graph invariants: chain edges survive pruning, degree near-bounded") {
    import spark.implicits._
    val nodes = index.as[VamanaIndex.Node].collect()
    nodes.groupBy(_.part).foreach { case (_, group) =>
      val ids = group.map(_.id).sorted
      val byId = group.map(g => g.id -> g).toMap
      // bidirectional chain in id order — the connectivity device
      ids.sliding(2).foreach {
        case Array(a, b) =>
          assert(byId(a).nbrs.contains(b), s"$a missing chain edge to $b")
          assert(byId(b).nbrs.contains(a), s"$b missing chain edge to $a")
        case _ =>
      }
      // robust-prune cap R plus at most the 2 protected chain edges
      group.foreach(g => assert(g.nbrs.length <= 16 + 2,
        s"degree ${g.nbrs.length} exceeds R+2"))
    }
  }

  test("randomized corpus: exhaustive beam equals brute force (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val dim = 8
    val corpus = (0 until 300).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat()))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val idx = VamanaIndex.build(df, "vec_id", "embedding", numParts = 3,
      r = 8, l = 16)
    val qs = corpus.take(4).map { case (id, v) => (id, v) }
    val got = VamanaIndex.search(idx, qs, k = 5, l = 300)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force oracle in plain Scala
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val want = qs.flatMap { case (qid, q) =>
      corpus.sortBy { case (id, v) => (d2(q, v), id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    assert(got == want)
  }

  test("clustered build + pruned probe: exact at full probes, high recall pruned") {
    val model = IvfIndex.trainLocal(emb, "embedding", nlist = 8,
      maxTrainRows = 5000)
    val idx = VamanaIndex.buildClustered(emb, "vec_id", "embedding", model,
      r = 16, l = 32).cache()
    // nprobe = nlist and beam >= corpus: exact — equals brute force
    val exact = VamanaIndex.searchPruned(idx, model, queries, k = 10, l = n,
        nprobe = 8)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    assert(exact == bruteTopK(10))
    // pruned probes: recall follows the IVF curve but must stay useful
    val pruned = VamanaIndex.searchPruned(idx, model, queries, k = 10, l = 64,
        nprobe = 4)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10).keySet
    val recall = pruned.intersect(want).size.toDouble / want.size
    assert(recall >= 0.7, s"recall@10 at nprobe=4/8 = $recall")
    idx.unpersist()
  }

  test("alpha > 1 produces long-range edges (hop count shrinks)") {
    // sanity on the RNG property: with alpha 1.2 the medoid-to-anywhere
    // path should be short; assert search at tiny beam already finds
    // most of top-10 (would fail on a chain-only graph, where a small
    // beam crawls linearly)
    val got = VamanaIndex.search(index, queries, k = 10, l = 24)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10).keySet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.6, s"recall@10 at l=24 = $recall")
  }

  test("search_list_size contract: must cover k and be positive (idx_diskann.py)") {
    val e1 = intercept[IllegalArgumentException](
      VamanaIndex.search(index, queries, k = 10, l = 1))
    assert(e1.getMessage.contains("search_list_size(1) should be larger than k(10)"))
    val e2 = intercept[IllegalArgumentException](
      VamanaIndex.search(index, queries, k = 10, l = -1))
    assert(e2.getMessage.contains("should be in range [1, "))
  }
}
