package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "THE QUICK BROWN FOX  jumps over the lazy dog near the river bank today!!"), // norm dup of 1
    (4L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (5L, "completely different content about spark dataframes and catalyst optimizer rules"),
    (6L, "completely different content about spark dataframes and catalyst optimizer rule") // near dup of 5
  ).toDF("doc_id", "text")

  test("exact groups finds raw duplicates only") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[scala.collection.Seq[Long]]("ids") == scala.collection.Seq(1L, 2L))
  }

  test("fingerprint groups are case/punct/whitespace-invariant") {
    val groups = Dedup.fingerprintGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[scala.collection.Seq[Long]]("ids") == scala.collection.Seq(1L, 2L, 3L))
  }

  test("dropExactDuplicates keeps min-id representative") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  test("minhash LSH candidates cover all high-jaccard pairs (recall)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)) && exact.contains((5L, 6L)))
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"LSH missed ${exact diff lsh}")
  }

  test("minhash estimated jaccard approximates exact jaccard") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 256)
    val a = sigs.filter($"doc_id" === 1).select($"sig".as("sig_a"))
    val b = sigs.filter($"doc_id" === 4).select($"sig".as("sig_b"))
    val est = a.crossJoin(b)
      .select(graft.functions.TextFunctions.minhashJaccard($"sig_a", $"sig_b"))
      .as[Double].head()
    // true 3-shingle jaccard of docs 1,4 is ~0.71 (differs in last token)
    assert(est > 0.5 && est < 0.95, s"est=$est")
  }

  test("simhash near-dup pairs found, far pairs excluded") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 5L)))
  }

  test("embedding cosine pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec")
    val pairs = Dedup.embeddingCosinePairs(vecs, "id", "vec", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
