package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Clustering compaction — range-partition the data by a clustering key
  * and persist per-file key stats, so range/point filters on that key
  * prune whole files and row groups at scan time.
  *
  * Reference semantics: clustering compaction + partitionStats pruning
  * (reference: internal/datacoord/compaction_policy_clustering.go,
  * querynodev2/delegator/segment_pruner.go:36, design doc
  * docs/user_guides/clustering_compaction.md — the published 25×-QPS
  * pruning study in BASELINE.md). Spark-first: `repartitionByRange` +
  * `sortWithinPartitions` IS the compaction; Parquet row-group min/max
  * stats + footer pruning ARE partitionStats — no bespoke metadata
  * service needed, and the same curve (prune % → speedup) falls out of
  * the scan.
  *
  * At 100 TB: the range shuffle is one pass (AQE sizes the partitions),
  * and every later read with a key predicate skips non-overlapping
  * files entirely — the dominant cost saver for selective scans.
  */
object Clustering {

  /** Range-cluster by `keyCol` (the clustering-compaction rewrite). */
  def compact(df: DataFrame, keyCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))

  /** Compact and persist the clustered layout as Parquet. */
  def writeClustered(df: DataFrame, keyCol: String, path: String,
      numPartitions: Int): Unit =
    compact(df, keyCol, numPartitions).write.mode("overwrite").parquet(path)

  /** Per-file clustering-key stats of a written layout — the
    * partitionStats equivalent, derivable from the data itself.
    */
  def fileStats(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"),
        count(lit(1)).as("rows"))

  /** Read with a key-range predicate; Parquet stats prune files/row
    * groups that the clustered layout made disjoint.
    */
  def prunedRead(spark: SparkSession, path: String, keyCol: String,
      lo: Long, hi: Long): DataFrame =
    spark.read.parquet(path).filter(col(keyCol) >= lo && col(keyCol) <= hi)
}
