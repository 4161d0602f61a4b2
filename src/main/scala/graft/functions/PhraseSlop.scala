package graft.functions

import scala.collection.mutable

/** Minimum-slop computation for phrase match (reference: the
  * `ComputePhraseMatchSlop` API — querynodev2/services.go:1988 →
  * tantivy-binding/src/phrase_match_slop.rs — which answers "what slop
  * would `phrase_match(field, query)` need to match this document?").
  *
  * Algorithm (as the reference's): for query term at position q (0-based,
  * max position Q), adjust each of its data positions p to p + (Q - q);
  * a phrase match with slop s exists iff some choice of one adjusted
  * position per term spans a range ≤ s. The minimum is the classic
  * smallest-range-over-k-sorted-lists sweep: O(n log k) over n total
  * postings. An exact in-order adjacent phrase gives 0; one inserted
  * filler costs 1; an adjacent transposition costs 2 (tantivy's move
  * budget, NOT a per-gap allowance).
  *
  * This is a driver-side admin utility in the reference (a coordinator
  * RPC used to tune slop), so it is exposed as a plain function over
  * token sequences, not a per-row expression.
  */
object PhraseSlop {

  /** Minimum slop for `query` to phrase-match `data`, or None when a
    * query term does not occur in `data` (no slop can match). Empty
    * query matches trivially with slop 0.
    */
  def computeSlop(query: Seq[String], data: Seq[String]): Option[Int] = {
    if (query.isEmpty) return Some(0)
    val maxQ = query.length - 1
    val dataPos: Map[String, Seq[Int]] =
      data.zipWithIndex.groupMap(_._1)(_._2)
    val lists: Array[Array[Long]] = new Array(query.length)
    var i = 0
    while (i < query.length) {
      dataPos.get(query(i)) match {
        case Some(ps) =>
          val rev = (maxQ - i).toLong
          lists(i) = ps.map(_ + rev).sorted.toArray
        case None => return None
      }
      i += 1
    }
    // smallest range covering one element from each list
    val idx = Array.fill(lists.length)(0)
    // min-heap of (value, listIndex)
    val heap = mutable.PriorityQueue.empty[(Long, Int)](Ordering.by(-_._1))
    var curMax = Long.MinValue
    lists.zipWithIndex.foreach { case (l, li) =>
      heap.enqueue((l(0), li))
      if (l(0) > curMax) curMax = l(0)
    }
    var best = Long.MaxValue
    var done = false
    while (!done) {
      val (curMin, li) = heap.dequeue()
      if (curMax - curMin < best) best = curMax - curMin
      idx(li) += 1
      if (idx(li) >= lists(li).length) done = true // this list is exhausted
      else {
        val v = lists(li)(idx(li))
        heap.enqueue((v, li))
        if (v > curMax) curMax = v
      }
    }
    Some(best.toInt)
  }

  /** Analyzer-aware convenience matching the reference API shape:
    * tokenize both sides with the standard analyzer, then compute.
    */
  def computeSlopText(query: String, data: String): Option[Int] =
    computeSlop(TextFunctions.tokenizeString(query), TextFunctions.tokenizeString(data))
}
