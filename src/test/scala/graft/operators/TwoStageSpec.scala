package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class TwoStageSpec extends SparkSpec {
  import spark.implicits._

  private def vecSeq(seed: Long): Seq[Float] =
    (0 until 4).map(d => ((seed * (d + 3)) % 97).toFloat / 97f)

  // 200 corpus vectors in 4-d, deterministic; label = id % 10
  private lazy val corpus = spark.range(200)
    .select(col("id"),
      array((0 until 4).map(d => (pmod(col("id") * (d + 3), lit(97)) / lit(97.0))
        .cast("float")): _*).as("vec"),
      pmod(col("id"), lit(10)).as("label"))
    .cache()

  private lazy val queries = corpus.filter($"id" < 3)
    .select($"id".as("qid"), $"vec".as("qvec"))

  private def brute(filter: org.apache.spark.sql.Column, k: Int) =
    VectorSearch.topK(corpus, "id", "vec", queries, "qid", "qvec",
        Metric.L2, k, filter = Some(filter), outputCols = Seq("id", "label"))
      .select($"qid", $"rank", $"id").collect().toSet

  test("selective filter routes to retrieve-then-score and stays exact") {
    val f = $"label" === 7 // 10% ≤ default 20% cutoff
    val (path, res) = VectorSearch.twoStageSearch(corpus, "id", "vec",
      queries, "qid", "qvec", Metric.L2, 5, f, outputCols = Seq("id", "label"))
    assert(path == "retrieve-then-score")
    assert(res.select($"qid", $"rank", $"id").collect().toSet == brute(f, 5))
  }

  test("permissive filter routes to ANN + iterative post-filter, exact") {
    val f = $"label" =!= 7 // 90% survives
    val (path, res) = VectorSearch.twoStageSearch(corpus, "id", "vec",
      queries, "qid", "qvec", Metric.L2, 5, f, outputCols = Seq("id", "label"))
    assert(path == "ann-post-filter")
    assert(res.select($"qid", $"rank", $"id").collect().toSet == brute(f, 5))
  }

  test("iterative post-filter grows k' until exact, even when top hits die") {
    // filter kills 70% — above cutoff, and most near neighbors vanish, so
    // the first k'=3k round is typically short and must regrow
    val f = $"label".isin(0, 1, 2)
    val res = VectorSearch.iterativePostFilter(corpus, "id", "vec",
      queries, "qid", "qvec", Metric.L2, 8, f, outputCols = Seq("id", "label"))
    assert(res.select($"qid", $"rank", $"id").collect().toSet == brute(f, 8))
  }

  test("element-level struct-array search and collapse-to-row mode") {
    // 3 parents × 3 chunks; chunk vec = vecSeq(parent*10 + idx)
    val packed = (0L until 3L).map { p =>
      (p, (0 until 3).map(i => (i.toLong, vecSeq(p * 10 + i))))
    }.toDF("doc", "raw")
      .select($"doc", transform($"raw",
        c => struct(c.getField("_1").as("cid"), c.getField("_2").as("v"))).as("chunks"))
    val qs = Seq((0L, vecSeq(21))).toDF("qid", "qvec") // == doc 2, chunk 1
    val hits = VectorSearch.elementSearch(packed, "doc", "chunks", "v",
      qs, "qid", "qvec", Metric.L2, k = 9)
    val top = hits.filter($"rank" === 1)
      .select($"doc", $"element_index").as[(Long, Long)].head()
    assert(top == ((2L, 1L))) // the exact element is located, not just the row
    // collapse mode: one candidate per doc, best element's score kept
    val rows = VectorSearch.collapseElements(hits, "doc", "qid", Metric.L2, k = 3)
    assert(rows.count() == 3)
    assert(rows.filter($"rank" === 1).select($"doc").as[Long].head() == 2L)
    assert(rows.groupBy($"doc").count().collect().forall(_.getLong(1) == 1))
  }

  test("indexed post-filter: k' growth at exhaustive probes stays exact") {
    val model = IvfIndex.trainLocal(corpus, "vec", nlist = 8, maxTrainRows = 200)
    val clustered = IvfIndex.layout(corpus, "vec", model).cache()
    // selective filter + nprobe0 = nlist: every round is exhaustive, so
    // the k' growth loop (first rounds fall short of k survivors) must
    // land on exactly the brute-force filtered top-k
    val f = $"label" === 7
    val res = VectorSearch.iterativePostFilterIndexed(clustered, "id", "vec",
      model, queries, "qid", "qvec", Metric.L2, 8, f,
      outputCols = Seq("id", "label"), nprobe0 = model.nlist)
    assert(res.select($"qid", $"rank", $"id").collect().toSet == brute(f, 8))
  }

  test("indexed post-filter: permissive filter satisfies within probed clusters") {
    val model = IvfIndex.trainLocal(corpus, "vec", nlist = 8, maxTrainRows = 200)
    val clustered = IvfIndex.layout(corpus, "vec", model).cache()
    val f = $"label" =!= 7
    val res = VectorSearch.iterativePostFilterIndexed(clustered, "id", "vec",
      model, queries, "qid", "qvec", Metric.L2, 5, f,
      outputCols = Seq("id", "label"), nprobe0 = 2)
    val rows = res.select($"qid", $"rank", $"id", $"label").collect()
    // every query filled to k, every hit passes the filter
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    assert(rows.forall(_.getLong(3) != 7))
    // a corpus query's own vector lives in its probed-first cluster:
    // rank 1 is the true (filtered) nearest even at low nprobe
    val r1 = res.filter($"rank" === 1).select($"qid", $"id")
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("post-filter falls back to exact scan when k exceeds the filtered corpus") {
    val f = $"id" < 6 // only 6 rows can ever match; k=10 can't be filled
    val res = VectorSearch.iterativePostFilter(corpus, "id", "vec",
      queries, "qid", "qvec", Metric.L2, 10, f, outputCols = Seq("id"))
    val perQ = res.groupBy($"qid").count().as[(Long, Long)].collect().toMap
    assert(perQ.values.forall(_ == 6)) // short but complete and exact
    assert(res.select($"qid", $"rank", $"id").collect().toSet == brute(f, 10))
  }
}
