package graft.operators

import org.apache.spark.sql.DataFrame

/** IVF_HNSW — the reference's composite index kind
  * (`client/index/common.go:53`; the index body lives in the external
  * index library: an IVF coarse quantizer whose cell lists are
  * traversed by per-cell HNSW graphs instead of flat scans, the
  * faiss-convention composite).
  *
  * Composition, not new graph code: [[IvfIndex.trainLocal]] learns the
  * coarse centroids; [[HnswIndex.buildClustered]] partitions the corpus
  * by nearest centroid and builds ONE graph PER CELL segment-parallel;
  * [[HnswIndex.searchPruned]] ranks the (driver-local) centroids per
  * query and traverses only the `nprobe` nearest cells' graphs. Scores
  * are exact L2 over the raw vectors (the graphs store originals, so
  * no quantization refine stage is needed); recall follows the IVF
  * pruning curve × the graph beam — `nprobe = nlist` and
  * `ef ≥ cell size` ⇒ exact, the oracle configuration.
  *
  * Scale shape: train samples ride the driver (bounded), the build is
  * one shuffle (corpus → cells) + embarrassingly-parallel graph
  * construction, and a search touches O(nprobe·nq·beam) nodes — the
  * corpus is never re-shuffled per query.
  */
object IvfHnswIndex {

  /** Coarse centroids + the graph-build knobs they were paired with. */
  final case class Model(ivf: IvfIndex.Model, m: Int, efConstruction: Int)

  /** Train the coarse quantizer on a bounded sample (knowhere trains
    * IVF centroids on a capped sample the same way).
    */
  def train(corpus: DataFrame, vecCol: String, nlist: Int,
      m: Int = 16, efConstruction: Int = 64,
      maxTrainRows: Int = 10000): Model = {
    require(nlist >= IndexParamCheck.MinNList && nlist <= IndexParamCheck.MaxNList,
      s"nlist $nlist out of range: [${IndexParamCheck.MinNList}, ${IndexParamCheck.MaxNList}]")
    // HNSW graphs degenerate below M=2 (idx_hnsw*.py range contract)
    require(m >= 2 && m <= IndexParamCheck.HnswMaxM,
      s"param 'M' ($m) should be in range [2, ${IndexParamCheck.HnswMaxM}]")
    require(efConstruction >= 1, s"efConstruction ($efConstruction) must be positive")
    Model(IvfIndex.trainLocal(corpus, vecCol, nlist, maxTrainRows = maxTrainRows),
      m, efConstruction)
  }

  /** One HNSW graph per IVF cell: shuffle by nearest centroid, then
    * segment-parallel in-memory graph construction per cell.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    HnswIndex.buildClustered(corpus, idCol, vecCol, model.ivf,
      m = model.m, efConstruction = model.efConstruction)

  /** nprobe-pruned graph search: each query ranks the centroids
    * driver-locally and traverses only its `nprobe` nearest cells'
    * graphs. Squared-L2 scores, ties by ascending id — the
    * [[VectorSearch.topK]] contract.
    */
  def search(index: DataFrame, model: Model,
      queries: Seq[(Long, Array[Float])], k: Int, ef: Int, nprobe: Int,
      roundTo: Option[Int] = None): DataFrame = {
    // knowhere's HNSW search contract: the beam must cover k
    require(ef >= k, s"ef($ef) should be larger than k($k)")
    require(nprobe >= 1 && nprobe <= model.ivf.nlist,
      s"nprobe $nprobe out of range: [1, ${model.ivf.nlist}]")
    HnswIndex.searchPruned(index, model.ivf, queries, k, ef, nprobe, roundTo)
  }
}
