package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Metric
import graft.operators.HnswIndex.{Hit, Node}

/** HNSW graph index, segment-parallel (reference: the knowhere HNSW index
  * the engine builds per sealed segment — config surface
  * pkg/util/indexparamcheck/index_type.go `IndexHNSW`, per-segment build +
  * cross-segment reduce as in querynodev2/segments/search.go).
  *
  * Spark mapping: a "segment" is a hash partition of the corpus. Build
  * runs `mapPartitions` — each task constructs an in-memory
  * hierarchical navigable-small-world graph for its partition
  * (Malkov & Yashunin, TPAMI'18: level ~ floor(-ln(U)·1/ln(M)), greedy
  * descent through upper layers, beam of width efConstruction at lower
  * layers, M-closest bidirectional links pruned to Mmax). The graph is
  * emitted as plain rows (part, id, vec, level, per-level neighbor ids) —
  * a DataFrame/Parquet-storable adjacency, so the index persists like any
  * table and co-partitions by `part`.
  *
  * Search re-groups rows by `part` and runs the standard descent+beam per
  * partition (every query probes every partition — same fan-out the
  * reference uses across segments), emitting per-partition top-k; the
  * global answer is the existing partial-agg top-k reduce, so shuffle
  * volume is O(parts·nq·k), never O(corpus).
  *
  * Exactness guarantee used by the oracle query: layer-0 adjacency keeps
  * an insertion-chain edge (node i ↔ previous inserted node) that pruning
  * never removes, so layer 0 is connected BY CONSTRUCTION and a beam of
  * ef ≥ partition size visits every node — search is then exhaustive
  * within each partition and the global result equals brute force.
  * Recall at practical ef is asserted in HnswIndexSpec instead.
  *
  * Scale notes: one partition's vectors + graph must fit a task's memory
  * — identical to the reference's segment-sized build; pick `numParts`
  * so corpus/numParts ≈ segment size (1M vectors × 128d ≈ 0.5 GB + M·16
  * bytes of edges per node). Build is embarrassingly parallel across
  * partitions and never shuffles vectors after the initial hash
  * partitioning (one shuffle, unavoidable: co-locating a node with its
  * graph). Graph quality uses simple M-closest neighbor selection; the
  * paper's select-neighbors heuristic is a pluggable refinement.
  */
object HnswIndex {

  case class Node(part: Int, id: Long, vec: Array[Float], level: Int,
      nbrs: Array[Array[Long]])
  case class Hit(qid: Long, id: Long, _score: Double)
  case class InRow(id: Long, vec: Array[Float], part: Int)

  /** Build the per-partition graphs. One shuffle (hash by id → part). */
  def build(df: DataFrame, idCol: String, vecCol: String, numParts: Int,
      m: Int = 16, efConstruction: Int = 64): DataFrame =
    buildFrom(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
        .withColumn("part", pmod(xxhash64(col("id")), lit(numParts)).cast("int")),
      numParts, m, efConstruction)

  /** IVF-clustered HNSW: partition by nearest IVF centroid instead of by
    * id hash, one graph per cell. Hash partitioning scatters every
    * neighborhood across all partitions, so plain [[build]] must probe
    * them all; centroid partitioning makes partitions spatially coherent,
    * and [[searchPruned]] then probes only the `nprobe` nearest cells per
    * query — the same two-level pruning the reference gets from delegator
    * segment pruning over clustering-compacted segments (its
    * segment-prune design doc) in front of per-segment graph indexes.
    */
  def buildClustered(df: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, m: Int = 16, efConstruction: Int = 64): DataFrame =
    buildFrom(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
        .withColumn("part", IvfIndex.assign(model, col("vec")).cast("int")),
      model.nlist, m, efConstruction)

  private def buildFrom(withPart: DataFrame, numParts: Int, m: Int,
      efConstruction: Int): DataFrame = {
    val spark = withPart.sparkSession
    import spark.implicits._
    val parted = withPart.repartition(numParts, col("part")).as[InRow]
    parted.mapPartitions { rows =>
      // a task may hold several parts; each part is its own graph
      rows.toArray.groupBy(_.part).iterator.flatMap { case (part, group) =>
        val all = group.sortBy(_.id) // deterministic insertion order
        buildPartition(part, all.map(_.id), all.map(_.vec), m, efConstruction)
      }
    }.toDF()
  }

  /** Classic HNSW insertion over one partition's rows (driver-free,
    * in-memory, deterministic given insertion order).
    */
  private def buildPartition(part: Int, ids: Array[Long],
      vecs: Array[Array[Float]], m: Int, efC: Int): Seq[Node] = {
    val n = ids.length
    val mlMult = 1.0 / math.log(m.toDouble)
    val maxLevelCap = 16
    // deterministic per-id level draw (not a shared RNG: independent of
    // partitioning and insertion order)
    val levels = Array.tabulate(n) { i =>
      val h = scala.util.hashing.byteswap64(ids(i) * 0x9E3779B97F4A7C15L)
      val u = ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
      math.min(maxLevelCap, math.floor(-math.log(u) * mlMult).toInt)
    }
    // adjacency(node)(level) = local neighbor indices
    val adj = Array.tabulate(n)(i => Array.fill(levels(i) + 1)(mutable.ArrayBuffer.empty[Int]))
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = (a(i) - b(i)).toDouble; s += d * d; i += 1 }
      s
    }
    var entry = 0
    // beam search at one level over the partial graph (first `built` nodes)
    def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int): mutable.PriorityQueue[(Double, Int)] = {
      val visited = new java.util.BitSet(n)
      // results: max-heap by dist (worst on top); cands: min-heap by dist
      val results = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
      val cands = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), Double](_._1).reverse)
      val d0 = dist(q, vecs(ep))
      visited.set(ep); results.enqueue((d0, ep)); cands.enqueue((d0, ep))
      while (cands.nonEmpty) {
        val (dc, c) = cands.dequeue()
        if (dc > results.head._1 && results.size >= ef) { cands.clear() }
        else {
          val nbrs = if (level < adj(c).length) adj(c)(level) else mutable.ArrayBuffer.empty[Int]
          var i = 0
          while (i < nbrs.length) {
            val e = nbrs(i)
            if (!visited.get(e)) {
              visited.set(e)
              val de = dist(q, vecs(e))
              if (results.size < ef || de < results.head._1) {
                results.enqueue((de, e)); cands.enqueue((de, e))
                if (results.size > ef) results.dequeue()
              }
            }
            i += 1
          }
        }
      }
      results
    }
    def mmax(level: Int): Int = if (level == 0) 2 * m else m
    // prune a node's neighbor list to Mmax closest, preserving the
    // layer-0 insertion-chain edges in BOTH directions (node-1 AND
    // node+1): beam search follows directed edges, so a one-way chain
    // would only let it descend toward node 0, not reach later nodes —
    // the bidirectional chain is what makes layer 0 strongly connected
    // and ef ≥ n exhaustive-exact.
    def prune(node: Int, level: Int): Unit = {
      val lst = adj(node)(level)
      val cap = mmax(level)
      if (lst.length > cap) {
        val chain: Set[Int] =
          if (level == 0) Set(node - 1, node + 1).filter(e => e >= 0 && e < n)
          else Set.empty
        val sorted = lst.distinct.sortBy(e => dist(vecs(node), vecs(e)))
        val kept = sorted.take(cap).to(mutable.ArrayBuffer)
        chain.foreach { e => if (lst.contains(e) && !kept.contains(e)) kept += e }
        adj(node)(level) = kept
      }
    }
    var node = 1
    while (node < n) {
      val q = vecs(node)
      val nodeLevel = levels(node)
      var ep = entry
      var lev = levels(entry)
      while (lev > nodeLevel) {
        ep = searchLayer(q, ep, 1, lev).dequeue()._2
        lev -= 1
      }
      var l = math.min(nodeLevel, levels(entry))
      while (l >= 0) {
        val w = searchLayer(q, ep, math.max(efC, m + 1), l).toArray.sortBy(_._1)
        ep = w.head._2
        val chosen = w.take(m).map(_._2)
        adj(node)(l) ++= chosen
        chosen.foreach { e =>
          if (l < adj(e).length) { adj(e)(l) += node; prune(e, l) }
        }
        l -= 1
      }
      // chain edge at layer 0 (bidirectional, never pruned away)
      if (!adj(node)(0).contains(node - 1)) adj(node)(0) += (node - 1)
      if (!adj(node - 1)(0).contains(node)) adj(node - 1)(0) += node
      if (nodeLevel > levels(entry)) entry = node
      node += 1
    }
    (0 until n).map { i =>
      Node(part, ids(i), vecs(i), levels(i),
        adj(i).map(_.toArray.map(ids(_))))
    }
  }

  /** Probe every partition graph, reduce per-partition top-k globally.
    * `ef ≥ partition size` ⇒ exact (see class doc). Squared-L2 scores,
    * ties by ascending id — same contract as [[VectorSearch.topK]].
    */
  def search(index: DataFrame, queries: Seq[(Long, Array[Float])], k: Int,
      ef: Int, roundTo: Option[Int] = None): DataFrame = {
    // knowhere's search contract (idx_hnsw.py:108): the beam must cover k
    require(ef >= k, s"ef($ef) should be larger than k($k)")
    val spark = index.sparkSession
    import spark.implicits._
    val qs = queries.toArray
    val hits = index.as[Node]
      .repartition(col("part")) // all nodes of one graph into one task
      .mapPartitions { rows =>
        // a task may hold several hash-parts; search each graph separately
        rows.toArray.groupBy(_.part).iterator.flatMap { case (_, nodes) =>
          searchPartition(nodes, qs, k, ef)
        }
      }.toDF()
    val scored = roundTo.map(d => hits.withColumn("_score", round(col("_score"), d)))
      .getOrElse(hits)
    VectorSearch.reduceTopK(scored, "id", "qid", Metric.L2, k, Seq("id"))
  }

  /** Probe-pruned search over a [[buildClustered]] index: each query
    * visits only its `nprobe` nearest cells' graphs (ranked against the
    * — driver-local — IVF centroids, nq·nlist float ops). Work drops
    * from O(parts·nq·beam) to O(nprobe·nq·beam); recall follows the IVF
    * pruning curve and is spec-asserted. Exact when nprobe = nlist and
    * ef ≥ cell size.
    */
  def searchPruned(index: DataFrame, model: IvfIndex.Model,
      queries: Seq[(Long, Array[Float])], k: Int, ef: Int, nprobe: Int,
      roundTo: Option[Int] = None): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = (a(i) - b(i)).toDouble; s += d * d; i += 1 }
      s
    }
    // part -> the queries that probe it (small: nq · nprobe entries)
    val qsByPart: Map[Int, Array[(Long, Array[Float])]] = queries
      .flatMap { case (qid, q) =>
        model.centroids.indices
          .sortBy(c => d2(q, model.centroids(c)))
          .take(math.min(nprobe, model.nlist))
          .map(c => c -> ((qid, q)))
      }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toArray }
    val hits = index.as[Node]
      .repartition(col("part"))
      .mapPartitions { rows =>
        rows.toArray.groupBy(_.part).iterator.flatMap { case (part, nodes) =>
          qsByPart.get(part) match {
            case Some(qs) => searchPartition(nodes, qs, k, ef)
            case None     => Nil // cell pruned for every query
          }
        }
      }.toDF()
    val scored = roundTo.map(d => hits.withColumn("_score", round(col("_score"), d)))
      .getOrElse(hits)
    VectorSearch.reduceTopK(scored, "id", "qid", Metric.L2, k, Seq("id"))
  }

  private def searchPartition(nodes: Array[Node],
      qs: Array[(Long, Array[Float])], k: Int, ef: Int): Seq[Hit] = {
    val n = nodes.length
    val sorted = nodes.sortBy(_.id)
    val idToIdx = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) { idToIdx.put(sorted(i).id, i); i += 1 }
    val vecs = sorted.map(_.vec)
    val adj: Array[Array[Array[Int]]] =
      sorted.map(_.nbrs.map(_.map(idToIdx.get(_).intValue())))
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val d = (a(j) - b(j)).toDouble; s += d * d; j += 1 }
      s
    }
    // entry point: the max-level node (min id on ties — deterministic)
    var entry = 0
    i = 1
    while (i < n) { if (sorted(i).level > sorted(entry).level) entry = i; i += 1 }
    val efEff = math.max(ef, k)
    val out = mutable.ArrayBuffer.empty[Hit]
    qs.foreach { case (qid, q) =>
      var ep = entry
      var lev = sorted(entry).level
      while (lev > 0) {
        // greedy ef=1 descent through upper layers
        var improved = true
        while (improved) {
          improved = false
          val nbrs = if (lev < adj(ep).length) adj(ep)(lev) else Array.emptyIntArray
          var j = 0
          var best = dist(q, vecs(ep))
          while (j < nbrs.length) {
            val d = dist(q, vecs(nbrs(j)))
            if (d < best) { best = d; ep = nbrs(j); improved = true }
            j += 1
          }
        }
        lev -= 1
      }
      // beam at layer 0
      val visited = new java.util.BitSet(n)
      val results = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
      val cands = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), Double](_._1).reverse)
      val d0 = dist(q, vecs(ep))
      visited.set(ep); results.enqueue((d0, ep)); cands.enqueue((d0, ep))
      while (cands.nonEmpty) {
        val (dc, c) = cands.dequeue()
        if (dc > results.head._1 && results.size >= efEff) { cands.clear() }
        else {
          val nbrs = adj(c)(0)
          var j = 0
          while (j < nbrs.length) {
            val e = nbrs(j)
            if (!visited.get(e)) {
              visited.set(e)
              val de = dist(q, vecs(e))
              if (results.size < efEff || de < results.head._1) {
                results.enqueue((de, e)); cands.enqueue((de, e))
                if (results.size > efEff) results.dequeue()
              }
            }
            j += 1
          }
        }
      }
      results.toArray.sortBy(r => (r._1, sorted(r._2).id)).take(k).foreach {
        case (d, idx) => out += Hit(qid, sorted(idx).id, d)
      }
    }
    out.toSeq
  }
}
