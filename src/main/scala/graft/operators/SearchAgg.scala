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

  // ---- search embedded aggregation (20260413-search_embedded_agg.md) ----

  /** Within-bucket top-hits spec (ES `top_hits`): `size` hits per
    * bucket, ordered by `sortCol` — any numeric expression, not just the
    * score (the MEP's R5: document sort inside a bucket).
    */
  final case class TopHits(size: Int, sortCol: Column, ascending: Boolean,
      payloadCols: Seq[String])

  /** One grouping level (ES `multi_terms` + metric sub-aggregations):
    * composite key `fields`, keep the `topGroups` buckets ranked by
    * `orderBy` over the emitted columns (the MEP's R7 bucket-level
    * ordering — `_count`, a key, or any metric alias), compute
    * `metrics` (alias -> aggregate over the bucket's hits), optionally
    * return per-bucket `topHits`, and recurse into `subGroup` (R6
    * hierarchical grouping).
    */
  final case class GroupBy(
      fields: Seq[String],
      topGroups: Int,
      metrics: Map[String, Column] = Map.empty,
      orderBy: Seq[Column] = Seq(col("_count").desc),
      topHits: Option[TopHits] = None,
      subGroup: Option[GroupBy] = None)

  /** Execute a (possibly nested) grouping tree over search hits and
    * return the FLATTENED leaf buckets: ancestor keys ++ this level's
    * keys, `_count`, metric aliases, and `_hits` — one row per leaf
    * bucket, ES's nested-terms response in relational form (the proxy
    * reconstructs the tree client-side in the reference; a DataFrame IS
    * the flattened tree).
    *
    * Scale shape: the input is nq·k hit rows, so every level is a small
    * hash agg; bucket selection is rank-over-aggregate (tiny), and the
    * next level semi-joins the kept buckets before re-aggregating —
    * children of dropped buckets are never computed.
    */
  def groupTree(hits: DataFrame, spec: GroupBy, idCol: String,
      parentKeys: Seq[String] = Nil, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = parentKeys ++ spec.fields
    val idType = hits.schema(idCol).dataType
    val aggs =
      Seq(count(lit(1)).as("_count")) ++
        spec.metrics.toSeq.sortBy(_._1).map { case (alias, aggExpr) =>
          round(aggExpr, roundTo).as(alias)
        } ++
        spec.topHits.toSeq.map { th =>
          TopKFunctions
            .top_k(th.sortCol, TopKFunctions.tieFor(col(idCol), idType),
              struct((idCol +: th.payloadCols).distinct.map(col): _*),
              th.size, th.ascending)
            .as("_th")
        }
    val bucketed = hits.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // bucket-level ordering (ES terms.order): keep topGroups buckets.
    // Root level: sort+limit → TakeOrderedAndProject (distributed
    // partial top-N — an unpartitioned window would funnel every bucket
    // of a high-cardinality group-by through ONE task). Nested levels:
    // rank within the parent's buckets (naturally partitioned).
    val order = spec.orderBy ++ spec.fields.map(col(_).asc)
    val kept =
      if (parentKeys.isEmpty) bucketed.orderBy(order: _*).limit(spec.topGroups)
      else bucketed
        .withColumn("_brank", row_number().over(
          Window.partitionBy(parentKeys.map(col): _*).orderBy(order: _*)))
        .filter(col("_brank") <= spec.topGroups)
        .drop("_brank")
    val withHits = spec.topHits match {
      case Some(_) => kept.withColumn("_hits",
        transform(col("_th"), h => h.getField("payload"))).drop("_th")
      case None => kept
    }
    spec.subGroup match {
      case None => withHits
      case Some(child) =>
        // children only of surviving buckets
        val scoped = hits.join(
          broadcast(withHits.select(keys.map(col): _*)), keys, "left_semi")
        val childDf = groupTree(scoped, child, idCol, parentKeys = keys, roundTo = roundTo)
        // attach this level's metrics to each leaf row (flattened tree)
        val renamed = withHits.columns.foldLeft(withHits) { (df, c) =>
          if (keys.contains(c)) df else df.withColumnRenamed(c, s"${c}_l${parentKeys.size}")
        }
        childDf.join(broadcast(renamed), keys)
    }
  }
}
