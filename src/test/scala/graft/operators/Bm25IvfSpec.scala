package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class Bm25IvfSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches hand-computed scores") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry date elderberry fig grape")
    ).toDF("doc_id", "text")
    val m = Bm25.build(docs, "doc_id", "text")
    val got = Bm25.search(m, "apple cherry", k = 3)
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap

    // manual: N=3, avgdl=(3+2+5)/3; idf(t)=ln(1+(N-df+.5)/(df+.5))
    val avgdl = 10.0 / 3.0
    def idf(df: Double) = math.log(1 + (3 - df + 0.5) / (df + 0.5))
    def tfc(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    val d1 = idf(1) * tfc(2, 3) // apple(df=1,tf=2) in doc1(dl=3)
    val d2 = idf(2) * tfc(1, 2) // cherry(df=2,tf=1) in doc2(dl=2)
    val d3 = idf(2) * tfc(1, 5) // cherry in doc3(dl=5)
    assert(math.abs(got(1L) - d1) < 1e-9)
    assert(math.abs(got(2L) - d2) < 1e-9)
    assert(math.abs(got(3L) - d3) < 1e-9)
    // ranking: doc1 (rare term, high tf) first
    val ranks = Bm25.search(m, "apple cherry", k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(ranks.head == 1L)
  }

  test("bm25 empty query returns no rows") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val m = Bm25.build(docs, "doc_id", "text")
    assert(Bm25.search(m, "!!!", 5).count() == 0)
  }

  // well-separated synthetic clusters: IVF with few probes must be exact
  private def clusteredData = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 10.0f // 4 well-separated centers
      (i.toLong, c, base.map(v => v + rnd.nextFloat() * 0.5f))
    }.toDF("id", "true_cluster", "vec")
  }

  test("ivf assignment groups well-separated clusters together") {
    val df = clusteredData
    val model = IvfIndex.train(df, "vec", nlist = 4, seed = 42)
    val purity = df.withColumn("_cluster", IvfIndex.assign(model, $"vec"))
      .groupBy("true_cluster")
      .agg(countDistinct("_cluster").as("n"))
      .agg(max("n")).as[Long].head()
    assert(purity == 1L, "each true cluster must map to exactly one IVF cell")
  }

  test("ivf nprobe=1 search on separated clusters equals brute force") {
    val df = clusteredData
    val model = IvfIndex.train(df, "vec", nlist = 4, seed = 42)
    val clustered = IvfIndex.layout(df, "vec", model)
    val queries = df.filter($"id" < 3).select($"id".as("qid"), $"vec".as("qvec"))

    val ivf = IvfIndex.search(clustered, "id", "vec", model, queries, "qid", "qvec",
        Metric.L2, k = 5, nprobe = 1)
      .select("qid", "rank", "id").as[(Long, Long, Long)].collect().toSet
    val brute = VectorSearch.topK(df, "id", "vec", queries, "qid", "qvec",
        Metric.L2, k = 5)
      .select("qid", "rank", "id").as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("ivf partial probe recall on real embeddings") {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
    val model = IvfIndex.train(emb, "embedding", nlist = 16)
    val clustered = IvfIndex.layout(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val ivf = IvfIndex.search(clustered, "vec_id", "embedding", model, queries,
        "qid", "qvec", Metric.COSINE, k = 10, nprobe = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val brute = VectorSearch.topK(emb, "vec_id", "embedding", queries, "qid", "qvec",
        Metric.COSINE, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 with nprobe=8/16 was $recall")
  }
}
