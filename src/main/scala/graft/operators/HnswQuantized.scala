package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{Column, DataFrame}

/** HNSW over quantized storage — the reference's HNSW_SQ / HNSW_PQ /
  * HNSW_PRQ index kinds (client/index/common.go:50-52; the index bodies
  * live in the reference's external index library: an HNSW graph whose
  * stored vectors are SQ8 / PQ / progressive-residual-PQ codes, with
  * graph traversal on quantized distances and an optional exact-vector
  * refine).
  *
  * Composition, not new graph code: the corpus is passed through the
  * quantizer's encode→decode round trip (map-only, codegen'd codecs)
  * and [[HnswIndex]] builds/searches on the RECONSTRUCTED vectors —
  * precisely the distances a quantized-storage graph computes. The
  * candidate shortlist then refines against the exact vectors
  * ([[PqIndex.searchRefined]]'s shape). PRQ adds a second PQ stage on
  * the first stage's residuals, halving the reconstruction error before
  * the graph ever forms.
  *
  * Scale shape: encode/decode is a narrow projection; the graph build
  * is [[HnswIndex]]'s segment-parallel mapPartitions; the refine joins
  * an nq·k·mult shortlist — nothing here shuffles the corpus beyond the
  * graph build's id-hash partition.
  */
object HnswQuantized {

  sealed trait Variant
  final case class SQ(model: Sq8Index.Model) extends Variant
  final case class PQ(model: PqIndex.Model) extends Variant
  /** Progressive residual quantization: stage2 codes the residual of
    * stage1's reconstruction.
    */
  final case class PRQ(stage1: PqIndex.Model, stage2: PqIndex.Model) extends Variant

  def trainSq(corpus: DataFrame, vecCol: String): Variant =
    SQ(Sq8Index.train(corpus, vecCol))

  def trainPq(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int): Variant =
    PQ(PqIndex.trainLocal(corpus, vecCol, m, k, dim))

  def trainPrq(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int): Variant = {
    val s1 = PqIndex.trainLocal(corpus, vecCol, m, k, dim)
    val withRes = corpus.withColumn("_res",
      residual(s1, col(vecCol)).cast(ArrayType(FloatType)))
    val s2 = PqIndex.trainLocal(withRes, "_res", m, k, dim)
    PRQ(s1, s2)
  }

  /** Reconstruct a PQ code array back to a float vector: per-subspace
    * codebook rows concatenated — plain builtin column math.
    */
  def pqDecode(model: PqIndex.Model, codes: Column): Column =
    flatten(zip_with(codes,
      typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq),
      (c, cb) => element_at(cb, c + 1)))

  private def residual(model: PqIndex.Model, vec: Column): Column =
    zip_with(vec, pqDecode(model, PqIndex.encode(model, vec)), (a, b) => a - b)

  /** The quantizer's reconstruction of `vec` — what a quantized-storage
    * HNSW measures distances against.
    */
  def reconstruct(variant: Variant, vec: Column): Column = (variant match {
    case SQ(m) => Sq8Index.decode(m, Sq8Index.encode(m, vec))
    case PQ(m) => pqDecode(m, PqIndex.encode(m, vec))
    case PRQ(s1, s2) =>
      val d1 = pqDecode(s1, PqIndex.encode(s1, vec))
      val d2 = pqDecode(s2, PqIndex.encode(s2,
        zip_with(vec, d1, (a, b) => a - b).cast(ArrayType(FloatType))))
      zip_with(d1, d2, (a, b) => a + b)
  }).cast(ArrayType(FloatType))

  /** Graph build over reconstructed vectors. Keep the returned frame
    * alongside the original corpus for [[searchRefined]].
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      variant: Variant, numParts: Int, m: Int = 16,
      efConstruction: Int = 64): DataFrame =
    HnswIndex.build(
      corpus.withColumn("_qvec_recon", reconstruct(variant, col(vecCol))),
      idCol, "_qvec_recon", numParts, m, efConstruction)

  /** Quantized-graph candidates + exact refine: traverse with ef wide
    * enough for `k·refineMult` candidates, then re-rank the shortlist by
    * exact L2 against the original vectors. ef ≥ corpus and
    * refineMult·k ≥ corpus ⇒ exact (the oracle configuration).
    */
  def searchRefined(index: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Float])], k: Int, ef: Int,
      refineMult: Int = 3, roundTo: Option[Int] = None): DataFrame = {
    // the beam pool bounds the candidate count: never ask past ef
    // (knowhere's ef >= k search contract)
    val want = math.max(k, math.min(k * refineMult, ef))
    val cands = HnswIndex.search(index, queries, k = want, ef = ef)
      .select(col("qid"), col("id").as(idCol))
    VectorSearch.refineExactL2(cands, corpus, idCol, vecCol, queries, k,
      want, roundTo)
  }
}
