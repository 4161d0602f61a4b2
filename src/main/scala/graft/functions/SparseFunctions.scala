package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse-vector operations, encoded as `map<key, double>` columns
  * (reference: VECTOR_SPARSE_U32_F32 type internal/core/src/common/
  * Types.h:70-100; SPARSE_INVERTED_INDEX / SPARSE_WAND index names in
  * internal/util/indexparamcheck/index_type.go; BM25 term-freq sparse
  * vectors produced at ingest by internal/util/function/bm25_function.go).
  *
  * All operations are built from codegen'd higher-order functions — no
  * UDFs — so sparse scoring stays inside whole-stage codegen and
  * distributes as a map-only stage.
  */
object SparseFunctions {

  /** Term-frequency sparse vector of a token array: `map(token -> count)`.
    * The ingest-side twin of the reference's BM25 FunctionSchema output.
    */
  def termFreqs(tokens: Column): Column = {
    val distinctToks = array_distinct(tokens)
    map_from_arrays(
      distinctToks,
      transform(distinctToks, t => size(filter(tokens, x => x === t)).cast("double")))
  }

  /** Dot product of two sparse maps: Σ over keys of a of a[k]·b[k]. */
  def sparseDot(a: Column, b: Column): Column =
    aggregate(
      map_entries(a),
      lit(0.0),
      (acc, e) =>
        acc + e.getField("value").cast("double") *
          coalesce(try_element_at(b, e.getField("key")).cast("double"), lit(0.0)))

  /** Dot product against a plan-time-constant query vector. Unrolls to a
    * flat arithmetic expression (one `try_element_at` per query term) —
    * the WAND-style "only touch query terms" evaluation order, for free.
    */
  def sparseDotLiteral(tf: Column, query: Map[String, Double]): Column =
    query.toSeq
      .sortBy(_._1)
      .map { case (t, w) =>
        coalesce(try_element_at(tf, lit(t)).cast("double"), lit(0.0)) * lit(w)
      }
      .reduceOption(_ + _)
      .getOrElse(lit(0.0))

  /** L2 norm of a sparse map's values. */
  def sparseNorm(a: Column): Column =
    sqrt(aggregate(map_values(a), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
}
