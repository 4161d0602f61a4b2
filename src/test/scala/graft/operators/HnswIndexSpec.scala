package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class HnswIndexSpec extends SparkSpec {

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
    HnswIndex.build(emb, "vec_id", "embedding", numParts = 4, m = 8,
      efConstruction = 32).cache()

  test("exhaustive ef equals brute force exactly (connectivity guarantee)") {
    val got = HnswIndex.search(index, queries, k = 10, ef = n)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    val want = bruteTopK(10)
    assert(got == want)
  }

  test("recall@10 at practical ef stays high") {
    val got = HnswIndex.search(index, queries, k = 10, ef = 64)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(10).keySet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("graph invariants: chain edges present, degrees bounded") {
    import spark.implicits._
    val nodes = index.as[HnswIndex.Node].collect()
    nodes.groupBy(_.part).foreach { case (_, group) =>
      val ids = group.map(_.id).sorted
      val byId = group.map(g => g.id -> g).toMap
      // bidirectional insertion chain at layer 0
      ids.sliding(2).foreach {
        case Array(a, b) =>
          assert(byId(a).nbrs(0).contains(b), s"$a missing chain edge to $b")
          assert(byId(b).nbrs(0).contains(a), s"$b missing chain edge to $a")
        case _ =>
      }
      // degree caps: 2M at layer 0 (+2 chain), M above
      group.foreach { g =>
        assert(g.nbrs(0).length <= 2 * 8 + 2)
        g.nbrs.drop(1).foreach(l => assert(l.length <= 8 + 2))
      }
    }
  }

  test("randomized corpus: exhaustive ef equals brute force (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val dim = 8
    val corpus = (0 until 300).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat()))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val idx = HnswIndex.build(df, "vec_id", "embedding", numParts = 3, m = 4,
      efConstruction = 16)
    val qs = corpus.take(7).map { case (id, v) => (id, v) }
    val got = HnswIndex.search(idx, qs, k = 15, ef = 300)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val want = qs.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) => (qid, id, l2(qv, v)) }
        .sortBy(t => (t._3, t._2)).take(15).zipWithIndex
        .map { case ((_, id, _), i) => (qid, id) -> (i + 1).toLong }
    }.toMap
    assert(got == want)
  }

  test("clustered build + probe-pruned search: near-full recall on clustered data at nprobe=2/8") {
    import spark.implicits._
    // 8 well-separated Gaussian blobs — the data shape centroid pruning
    // is designed for (on uniform data pruning degrades toward the
    // probed-fraction, as with any IVF)
    val rnd = new scala.util.Random(7L)
    val dim = 16
    val corpus = (0 until 400).map { i =>
      val blob = i % 8
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d == blob * 2) 10f else 0f) + rnd.nextFloat()))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val model = IvfIndex.trainLocal(df, "embedding", nlist = 8)
    val clustered = HnswIndex.buildClustered(df, "vec_id", "embedding", model,
      m = 8, efConstruction = 32).cache()
    val qs = corpus.take(6)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val want = qs.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) => (qid, id, l2(qv, v)) }
        .sortBy(t => (t._3, t._2)).take(10).map(t => (qid, t._2))
    }.toSet
    val pruned = HnswIndex.searchPruned(clustered, model, qs, k = 10,
        ef = 64, nprobe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pruned.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"pruned recall@10 = $recall")
  }

  test("clustered build at full probes + exhaustive ef equals brute force") {
    val model = IvfIndex.trainLocal(emb, "embedding", nlist = 8)
    val clustered = HnswIndex.buildClustered(emb, "vec_id", "embedding", model,
      m = 8, efConstruction = 32)
    val full = HnswIndex.searchPruned(clustered, model, queries, k = 10,
        ef = n, nprobe = 8)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bruteTopK(10).keySet)
  }

  test("index roundtrips through parquet") {
    val path = java.nio.file.Files.createTempDirectory("hnsw").toString
    index.write.mode("overwrite").parquet(path)
    val reloaded = spark.read.parquet(path)
    val got = HnswIndex.search(reloaded, queries, k = 5, ef = n)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTopK(5).keySet
    assert(got == want)
  }

  test("ef narrower than k is the named knowhere rejection") {
    val e = intercept[IllegalArgumentException](
      HnswIndex.search(index, queries, k = 10, ef = 1))
    assert(e.getMessage.contains("ef(1) should be larger than k(10)"))
  }
}
