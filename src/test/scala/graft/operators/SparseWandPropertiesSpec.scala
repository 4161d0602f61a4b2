package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated invariant for SPARSE_WAND: for ANY corpus and
  * non-negative query, the pruned top-k equals the exhaustive top-k —
  * the no-false-negatives guarantee WAND's bound is supposed to give.
  */
class SparseWandPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  /** (doc_id, sparse map) corpora of varied skew: some terms rare/heavy,
    * some common/light — the regime where the essential split actually
    * prunes, plus degenerate shapes (empty maps, singleton corpora).
    */
  private val corpusGen: Gen[Seq[(Long, Map[String, Double])]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      nTerms <- Gen.choose(0, 5)
      terms <- Gen.listOfN(nTerms, Gen.oneOf(vocab))
      ws <- Gen.listOfN(nTerms, Gen.choose(1, 9))
    } yield terms.zip(ws.map(_.toDouble)).toMap)
  } yield rows.zipWithIndex.map { case (m, i) => (i.toLong, m) }

  private val queryGen: Gen[Map[String, Double]] = for {
    nTerms <- Gen.choose(1, 4)
    terms <- Gen.pick(nTerms, vocab)
    ws <- Gen.listOfN(nTerms, Gen.oneOf(0.5, 1.0, 2.0, 8.0))
  } yield terms.zip(ws).toMap

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("pruned == exhaustive for 30 generated corpus/query/k combinations") {
    for (seed <- 1L to 30L) {
      val corpus = sample(corpusGen, seed)
      val query = sample(queryGen, seed * 31 + 7)
      val k = sample(Gen.choose(1, 12), seed * 17 + 3)
      val idx = SparseWand.materialize(SparseWand.build(
        corpus.toDF("doc_id", "tf"), "doc_id", col("tf")))
      def run(ex: Boolean) = SparseWand.search(idx, query, k, exhaustive = ex)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Double)].collect().toSeq
      assert(run(false) == run(true), s"seed=$seed query=$query k=$k")
      idx.postings.unpersist(); idx.termBounds.unpersist()
    }
  }
}
