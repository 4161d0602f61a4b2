package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar index builds as batch jobs producing queryable index tables
  * (reference: index types in internal/util/indexparamcheck/
  * index_type.go — INVERTED (tantivy InvertedIndexTantivy.cpp), BITMAP
  * (BitmapIndex.cpp), NGRAM (NgramInvertedIndex.cpp)).
  *
  * Spark-first: an "index" is a second table keyed by the indexed value
  * — `explode + groupBy(value) + collect_list(rowid)` — written sorted
  * by key so point/range lookups prune to a few row groups. Lookups
  * join the (tiny) matched posting lists back to the base table by pk —
  * a broadcast join, never a shuffle of the base.
  */
object InvertedIndex {

  /** Inverted index over a token-array column: (term, df, postings). */
  def buildTokenIndex(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    df.select(col(idCol), explode(tokensCol).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col(idCol))).as("postings"))

  /** Bitmap-style index over a low-cardinality scalar column:
    * (value, cnt, postings). The sorted id list is the roaring-bitmap
    * stand-in; at scale, store as parquet sorted by `value`.
    */
  def buildValueIndex(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("postings"))

  /** Term lookup via the index: ids of rows containing ALL query terms
    * (posting-list intersection — the index-side fast path the reference
    * takes for `text_match` when an inverted index exists).
    */
  def lookupAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    index
      .filter(col("term").isin(terms: _*))
      .agg(
        count(lit(1)).as("_nterms"),
        aggregate(collect_list(col("postings")), lit(null).cast("array<long>"),
          (acc, p) => when(acc.isNull, p).otherwise(array_intersect(acc, p)))
          .as("ids"))
      .select(explode(when(col("_nterms") === terms.distinct.size, col("ids"))
        .otherwise(array().cast("array<long>"))).as("id"))
  }
}
