package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TopKFunctions

/** Search aggregations — Elasticsearch-style facets over search hits
  * (reference: internal/proxy/search_agg/ — buckets by composite keys,
  * per-bucket metrics, `top_hits` with sort; computer.go:33-430,
  * types.go:75-105).
  *
  * The hits input is already reduced to nq·k rows, so facet aggregation
  * is a small shuffle; `top_hits` uses the partial-aggregating
  * [[TopKFunctions.top_k]] rather than a window, keeping per-bucket
  * state bounded at `topHits` on the map side.
  */
object SearchAgg {

  /** Bucket hits by `bucketCols`; per bucket emit doc_count, avg/best
    * score, and the `topHits` best hit ids (score order, ties by id).
    */
  def facets(
      hits: DataFrame,
      bucketCols: Seq[String],
      scoreCol: String,
      idCol: String,
      topHits: Int,
      higherIsBetter: Boolean = true,
      roundTo: Int = 4): DataFrame = {
    val asc = !higherIsBetter
    val best: Column => Column = if (higherIsBetter) max else min
    val idType = hits.schema(idCol).dataType
    hits
      .groupBy(bucketCols.map(col): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        round(avg(col(scoreCol)), roundTo).as("avg_score"),
        round(best(col(scoreCol)), roundTo).as("best_score"),
        TopKFunctions
          .top_k(col(scoreCol), TopKFunctions.tieFor(col(idCol), idType),
            struct(col(idCol)), topHits, asc)
          .as("_th"))
      .withColumn("top_hit_ids",
        transform(col("_th"), h => h.getField("payload").getField(idCol)))
      .drop("_th")
  }
}
