package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.IngestFunctions._

/** The ingest FunctionSchema triad (reference function.go:36-47):
  * BM25 / MinHash / TextEmbedding output-field derivation at ingest.
  */
class IngestFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "pack my box with five dozen jugs"),
    (3L, "the quick brown fox"), // duplicate of 1: outputs must match
    (4L, "")).toDF("doc_id", "text")

  test("applyAll derives all three function outputs in one pass") {
    val out = applyAll(docs, Seq(
      Bm25Function("text", "tf"),
      MinHashFunction("text", "sig", numHashes = 16, shingleSize = 2),
      TextEmbeddingFunction("text", "emb", dim = 8)))
    assert(out.columns.toSeq == Seq("doc_id", "text", "tf", "sig", "emb"))
    val rows = out.orderBy($"doc_id").collect()
    def sig(i: Int) = rows(i).getSeq[Long](rows(i).fieldIndex("sig")).toList
    def emb(i: Int) = rows(i).getSeq[Float](rows(i).fieldIndex("emb")).toList
    // deterministic: duplicate text → identical derived fields
    assert(rows(0).getAs[Map[String, Double]]("tf") == rows(2).getAs[Map[String, Double]]("tf"))
    assert(sig(0) == sig(2))
    assert(emb(0) == emb(2))
    assert(sig(0).length == 16)
  }

  test("charfreq embedding: unit norm, right dim, zero text → zero vector") {
    val out = applyAll(docs, Seq(TextEmbeddingFunction("text", "emb", dim = 8)))
      .orderBy($"doc_id").collect()
    out.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("emb")).toList
      assert(v.length == 8)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (r.getLong(0) == 4L) assert(norm == 0.0)      // empty text
      else assert(math.abs(norm - 1.0) < 1e-6)
    }
    // 'q' is letter 17 — beyond dim 8 — so only a-h counts contribute:
    // "the quick brown fox": a=0 b=1 c=1 d=0 e=1 f=1 g=0 h=1
    val v1 = out(0).getSeq[Float](out(0).fieldIndex("emb")).toList
    assert(v1(0) == 0.0f && v1(3) == 0.0f && v1(6) == 0.0f)
    assert(v1(1) > 0 && v1(2) > 0 && v1(4) > 0 && v1(5) > 0 && v1(7) > 0)
  }

  test("schema validation: missing input / clashing output / bad dim / external provider") {
    intercept[IllegalArgumentException] {
      applyAll(docs, Seq(TextEmbeddingFunction("nope", "emb", 8)))
    }
    intercept[IllegalArgumentException] {
      applyAll(docs, Seq(TextEmbeddingFunction("text", "text", 8)))
    }
    intercept[IllegalArgumentException] {
      CharFreqEmbedding.embed(lit("x"), 27)
    }
    intercept[UnsupportedOperationException] {
      applyAll(docs, Seq(TextEmbeddingFunction("text", "emb", 8,
        provider = ExternalEmbedding("openai"))))
    }
  }

  test("ingested embedding is searchable and self-similar") {
    import graft.operators.VectorSearch
    val ingested = applyAll(docs.filter($"doc_id" =!= 4L),
      Seq(TextEmbeddingFunction("text", "emb", dim = 8)))
    val qs = spark.range(1).select(lit(0L).as("qid"),
      CharFreqEmbedding.embed(lit("the quick brown fox"), 8).as("qvec"))
    val hits = VectorSearch.topK(ingested, "doc_id", "emb", qs, "qid", "qvec",
        Metric.IP, k = 3)
      .select($"rank", $"doc_id", $"_score").as[(Long, Long, Double)].collect()
    // docs 1 and 3 are exact text matches → IP 1.0, ranks 1-2
    assert(hits.take(2).map(_._2).toSet == Set(1L, 3L))
    assert(hits.take(2).forall(h => math.abs(h._3 - 1.0) < 1e-6))
  }
}
