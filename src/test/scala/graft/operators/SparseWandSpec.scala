package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SparseFunctions, TextFunctions}

/** SPARSE_WAND: pruned top-k must equal brute force, and the pruning
  * must actually skip postings at practical thresholds.
  */
class SparseWandSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 'rare' appears in 4 docs with high tf; filler terms everywhere
  private lazy val docs = (0L until 200L).map { i =>
    val rare = if (i % 50 == 0) "rare rare rare " else ""
    val text = rare + s"alpha beta ${if (i % 2 == 0) "gamma" else "delta"} alpha"
    (i, text)
  }.toDF("doc_id", "text")

  private lazy val idx = SparseWand.build(docs, "doc_id",
    SparseFunctions.termFreqs(TextFunctions.tokenize(col("text"))))

  private val query = Map("rare" -> 5.0, "alpha" -> 0.4, "gamma" -> 0.3)

  test("postings index carries per-term max weights and df") {
    val bounds = idx.termBounds
      .select(col("term"), col("max_weight"), col("df")).collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(bounds("rare") == ((3.0, 4L)))   // tf 3 in 4 docs
    assert(bounds("alpha") == ((2.0, 200L)))
    assert(bounds("gamma")._2 == 100L)
  }

  test("essential split prunes common terms at a practical threshold") {
    val (essential, theta) = SparseWand.essentialSplit(idx, query, k = 4)
    // θ = 4th best 'rare' contribution = 3·5.0 = 15; UB(alpha)+UB(gamma)
    // = 0.8 + 0.9 < 15, so only 'rare' is essential
    assert(theta == 15.0)
    assert(essential == Seq("rare"))
    // candidate generation touches 4 docs, not the 200 matching 'alpha'
    val candidates = idx.postings
      .filter(col("term").isin(essential: _*))
      .select(col("doc_id")).distinct().count()
    assert(candidates == 4)
  }

  test("pruned search equals exhaustive brute force") {
    val pruned = SparseWand.search(idx, query, k = 4)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    val brute = SparseWand.search(idx, query, k = 4, exhaustive = true)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    assert(pruned == brute)
    assert(pruned.map(_._1) == Seq(0L, 50L, 100L, 150L))
    // rare 3·5.0 + alpha 2·0.4 + gamma tf1·0.3 (docs 0,50,100,150 even)
    assert(pruned.head._2 == 15.0 + 0.8 + 0.3)
  }

  test("k larger than the best term's postings falls back to exhaustive") {
    val (essential, theta) = SparseWand.essentialSplit(idx, query, k = 10)
    assert(theta == 0.0)
    assert(essential == query.keys.toSeq.sorted)
    val hits = SparseWand.search(idx, query, k = 10)
    assert(hits.count() == 10)
  }

  test("query with no indexed terms returns empty") {
    assert(SparseWand.search(idx, Map("zzz" -> 1.0), k = 5).count() == 0)
  }

  test("negative weights disable pruning (bound needs non-negative terms)") {
    val q = Map("rare" -> 5.0, "alpha" -> -1.0)
    val (essential, theta) = SparseWand.essentialSplit(idx, q, k = 2)
    assert(theta == 0.0 && essential == q.keys.toSeq.sorted)
    val pruned = SparseWand.search(idx, q, k = 5)
      .orderBy(col("score").desc, col("doc_id")).as[(Long, Double)].collect().toSeq
    val brute = SparseWand.search(idx, q, k = 5, exhaustive = true)
      .orderBy(col("score").desc, col("doc_id")).as[(Long, Double)].collect().toSeq
    assert(pruned == brute)
  }

  test("negative DOCUMENT weight under a query term disables pruning") {
    // build from explicit postings: doc 9 carries a negative 'rare'
    // weight, so θ from single-term contributions would over-estimate
    // the true k-th score and over-prune — must take the exhaustive path
    val sparse = (0L until 20L).map { i =>
      val w = if (i == 9L) -2.0 else if (i % 5 == 0) 3.0 else 0.5
      (i, Map("rare" -> w, "alpha" -> 1.0))
    }.toDF("doc_id", "sv")
    val nidx = SparseWand.build(sparse, "doc_id", col("sv"))
    val q = Map("rare" -> 4.0, "alpha" -> 0.1)
    val (essential, theta) = SparseWand.essentialSplit(nidx, q, k = 3)
    assert(theta == 0.0 && essential == q.keys.toSeq.sorted)
    val pruned = SparseWand.search(nidx, q, k = 3)
      .orderBy(col("score").desc, col("doc_id")).as[(Long, Double)].collect().toSeq
    val brute = SparseWand.search(nidx, q, k = 3, exhaustive = true)
      .orderBy(col("score").desc, col("doc_id")).as[(Long, Double)].collect().toSeq
    assert(pruned == brute)
  }

  test("nq-batched search equals per-query search, pruning intact") {
    val queries = Seq(
      1L -> query,
      2L -> Map("alpha" -> 1.0, "delta" -> 2.0),
      3L -> Map("rare" -> 1.0))
    val batched = SparseWand.searchMany(idx, queries, k = 4)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val single = queries.flatMap { case (qid, q) =>
      SparseWand.search(idx, q, k = 4)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))))
        .select(lit(qid).as("qid"), col("doc_id"), col("score"), col("rank"))
        .as[(Long, Long, Double, Long)].collect()
    }.toSet
    assert(batched == single)
  }
}
