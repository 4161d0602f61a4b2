package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{Column, DataFrame}

/** AISAQ — the reference's all-in-storage DiskANN variant
  * (`client/index/disk_ann.go:74-158`): a Vamana graph whose per-node
  * compressed (PQ) vectors ride INLINE with the adjacency so a beam
  * hop costs one read instead of two. The SSD block layout and the
  * aio/uring IO engines are storage plumbing this engine does not
  * reproduce (Spark's shuffle/storage layer stands in); the ALGORITHMIC
  * half — graph traversal over PQ-reconstructed vectors plus an exact
  * refine of the shortlist — is exactly the [[HnswQuantized]]
  * composition, here over [[VamanaIndex]]:
  *
  * build: PQ-encode→decode the corpus (map-only, codegen'd codecs) and
  * build the Vamana graph on the RECONSTRUCTIONS — precisely the
  * distances an inline-PQ traversal computes; search: beam-traverse for
  * `k·refineMult` candidates, then re-rank the shortlist by exact L2
  * against the original vectors (`vectors_beamwidth`'s exact-vector
  * pass). `search_list ≥ corpus` and `refineMult·k ≥ corpus` ⇒ exact —
  * the oracle configuration.
  *
  * Scale shape: encode/decode is a narrow projection; the graph build
  * is [[VamanaIndex]]'s segment-parallel mapPartitions; the refine
  * joins an nq·k·mult shortlist — nothing shuffles the corpus beyond
  * the graph build's id-hash partition.
  */
object AisaqIndex {

  /** PQ codebooks + the graph knobs they were paired with. */
  final case class Model(pq: PqIndex.Model, numParts: Int, r: Int, l: Int)

  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int, dim: Int,
      numParts: Int, r: Int = 32, l: Int = 64): Model =
    Model(PqIndex.trainLocal(corpus, vecCol, m, k, dim), numParts, r, l)

  /** The PQ reconstruction of `vec` — what an inline-PQ beam measures. */
  def reconstruct(model: Model, vec: Column): Column =
    HnswQuantized.pqDecode(model.pq, PqIndex.encode(model.pq, vec))
      .cast(ArrayType(FloatType))

  /** Vamana graph over reconstructed vectors. Keep the returned frame
    * alongside the original corpus for [[searchRefined]].
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    VamanaIndex.build(
      corpus.withColumn("_pq_recon", reconstruct(model, col(vecCol))),
      idCol, "_pq_recon", model.numParts, r = model.r, l = model.l)

  /** Compressed-graph candidates + exact refine. `searchList` is the
    * reference's `search_list` beam; the ≥ k contract is enforced by
    * [[VamanaIndex.search]] with DiskANN's named error.
    */
  def searchRefined(index: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Float])], k: Int,
      searchList: Int, refineMult: Int = 3,
      roundTo: Option[Int] = None): DataFrame = {
    // the beam pool bounds the candidate count: never ask past the beam
    val want = math.max(k, math.min(k * refineMult, searchList))
    val cands = VamanaIndex.search(index, queries, k = want, l = searchList)
      .select(col("qid"), col("id").as(idCol))
    VectorSearch.refineExactL2(cands, corpus, idCol, vecCol, queries, k,
      want, roundTo)
  }
}
