package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** L0 / delete-merge compaction — fold accumulated delete tombstones
  * into sealed data by rewriting it, so later reads stop paying the
  * per-query anti-join for old deletes (reference:
  * internal/datacoord/compaction_l0_view.go — L0 segments hold deltalog
  * deletes; an L0 compaction pushes them down into the sealed segments
  * they cover; compaction_task_l0.go executes the rewrite).
  *
  * Spark-first shape: ONE pk join of data against the folded tombstone
  * set (AQE broadcasts it when small), rewrite the parquet, and keep
  * only the residual tombstones (ts > compactTs) for the read path.
  * At 100 TB the join is the same cost a single read would pay — paid
  * once instead of per query, and the rewrite can ride along with a
  * clustering compaction's shuffle.
  */
object Compaction {

  /** Fold tombstones with ts <= `compactTs` into `data`: returns
    * (compacted data, residual tombstones). A row is dropped when a
    * folded tombstone for its pk has tomb.ts >= row.ts (the MVCC delete
    * rule, evaluated once at compaction time instead of per read).
    */
  def foldDeletes(data: DataFrame, tombstones: DataFrame, pkCol: String,
      tsCol: String, compactTs: Column): (DataFrame, DataFrame) = {
    val foldable = tombstones
      .filter(col(tsCol) <= compactTs)
      .groupBy(col(pkCol)).agg(max(col(tsCol)).as("_tomb_ts"))
    val compacted = data
      .join(foldable, Seq(pkCol), "left")
      .filter(col("_tomb_ts").isNull || col(tsCol) > col("_tomb_ts"))
      .drop("_tomb_ts")
    val residual = tombstones.filter(col(tsCol) > compactTs)
    (compacted, residual)
  }

  /** Execute the L0 compaction: rewrite `data` with deletes folded,
    * persist the residual tombstones next to it, and record the
    * compaction watermark — reads below it would be WRONG (folded
    * deletes are physically gone, so a row deleted at ts ∈ (readTs,
    * compactTs] could not be resurrected) and must be rejected.
    */
  def writeCompacted(data: DataFrame, tombstones: DataFrame, pkCol: String,
      tsCol: String, compactTs: Column, path: String): Unit = {
    val (compacted, residual) = foldDeletes(data, tombstones, pkCol, tsCol, compactTs)
    compacted.write.mode("overwrite").parquet(s"$path/data")
    residual.write.mode("overwrite").parquet(s"$path/tombstones")
    val spark = data.sparkSession
    spark.range(1).select(compactTs.cast("long").as("compact_ts"))
      .write.mode("overwrite").parquet(s"$path/_watermark")
  }

  /** Read a compacted layout at `readTs`: only the residual tombstones
    * are re-applied — the folded ones are physically gone, which is why
    * readTs must be ≥ the recorded compaction watermark (the reference
    * enforces the same rule as the collection's truncated MVCC horizon).
    */
  def readCompacted(spark: SparkSession, path: String, pkCol: String,
      tsCol: String, readTs: Column): DataFrame = {
    val watermark = spark.read.parquet(s"$path/_watermark")
      .head().getLong(0)
    val readTsVal = spark.range(1).select(readTs.cast("long")).head().getLong(0)
    require(readTsVal >= watermark,
      s"readTs $readTsVal predates the compaction watermark $watermark — " +
        "deletes folded at compaction cannot be un-applied; read an " +
        "un-compacted layout for time travel below the watermark")
    val data = spark.read.parquet(s"$path/data")
    val residual = spark.read.parquet(s"$path/tombstones")
    Mvcc.visible(data, pkCol, tsCol, readTs, tombstones = Some(residual))
  }

  /** Mix compaction (reference: the datacoord "mix" policy — merge many
    * small sealed segments into ~maxSize ones, no delete folding):
    * coalesce a fragmented layout into files of ≈`targetFileBytes`,
    * optionally keeping/establishing a sort by `sortCol` so zone-map
    * pruning survives the merge. Returns the output file count.
    *
    * File count derives from the INPUT's on-disk bytes (compressed), so
    * the merge stays proportional at any scale; `coalesce` avoids a
    * shuffle entirely in the unsorted case.
    */
  def mergeSmallFiles(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCol: Option[String] = None): Int = {
    val data = spark.read.parquet(inPath)
    val inputBytes = data.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1,
      math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    val merged = sortCol match {
      case Some(c) => data.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None    => data.coalesce(nFiles)
    }
    merged.write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
