package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Partition-key collections (reference: `is_partition_key` in
  * pkg/util/typeutil/schema.go — rows are hashed on the partition-key
  * field into one of N physical partitions at insert
  * (proxy/repack_func.go), and a `key == value` filter routes the query
  * to exactly that partition, skipping the rest; tests
  * tests/python_client + materialized-view integration suite).
  *
  * Spark-first shape: the physical partition is a real directory
  * partition (`partitionBy(_part)`), so routing is Catalyst partition
  * pruning — directory-level, visible in the scan's `PartitionFilters`,
  * stronger than row-group stats. At 100 TB, an equality query on the
  * partition key touches 1/N of the files before a single row is read.
  */
object PartitionKey {

  /** Deterministic partition id for a key value (mirrors the
    * reference's hash-to-channel repack: hash(key) % num).
    */
  def partitionId(key: Column, numPartitions: Int): Column =
    pmod(xxhash64(key), lit(numPartitions.toLong))

  /** Write `df` hash-partitioned on `keyCol` into `numPartitions`
    * directory partitions at `path`. Rows are shuffled onto their
    * target partition first (`filesPerPartition` tasks per directory)
    * so the layout is `numPartitions × filesPerPartition` right-sized
    * files — without this, every input task writes a sliver into every
    * directory (tasks × partitions small files, the classic dynamic-
    * partition-write explosion at scale).
    */
  def write(df: DataFrame, keyCol: String, numPartitions: Int, path: String,
      filesPerPartition: Int = 1): Unit =
    df.withColumn("_part", partitionId(col(keyCol), numPartitions))
      .withColumn("_subfile", pmod(xxhash64(col(keyCol), lit(17)), lit(filesPerPartition.toLong)))
      .repartition(numPartitions * filesPerPartition, col("_part"), col("_subfile"))
      .drop("_subfile")
      .write.partitionBy("_part").mode("overwrite").parquet(path)

  /** Read with partition-key routing: `keyCol == value` becomes a
    * directory-pruning `_part` filter AND the exact key predicate (the
    * reference applies both: route to the partition, then filter within).
    */
  def readKeyEquals(spark: SparkSession, path: String, keyCol: String,
      value: Column, numPartitions: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("_part") === partitionId(value, numPartitions) &&
        col(keyCol) === value)
      .drop("_part")
}
