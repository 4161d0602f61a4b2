package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Collection snapshots (reference: internal/datacoord/snapshot.go —
  * a snapshot is METADATA ONLY: a manifest of the segment files live at
  * snapshot time, stored under snapshots/{collection}/manifests/{id};
  * no data is copied, and restore/read serves exactly the manifested
  * segments regardless of later appends, compactions, or GC of the
  * live collection; internal/snapshotio writes the manifests).
  *
  * Spark-first shape: the manifest is itself a small parquet table of
  * (file, bytes) written by the driver from a FileSystem listing — an
  * O(files) metadata operation at any corpus size — and reading a
  * snapshot is `spark.read.parquet(files: _*)`, which plans the exact
  * manifested file set (later files in the same directory are invisible
  * by construction, not by filtering).
  */
object Snapshot {

  /** Record the current file set of `dataPath` as snapshot `id`. */
  def create(spark: SparkSession, dataPath: String, snapRoot: String, id: String): Int = {
    val p = new Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen))
    require(files.nonEmpty, s"no parquet files to snapshot under $dataPath")
    import spark.implicits._
    files.toDF("file", "bytes")
      .coalesce(1)
      .write.mode("errorifexists") // snapshots are immutable once taken
      .parquet(s"$snapRoot/manifests/$id")
    files.size
  }

  /** List the files captured by snapshot `id`. */
  def manifest(spark: SparkSession, snapRoot: String, id: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$snapRoot/manifests/$id")
      .select(col("file")).as[String].collect().toSeq
  }

  /** Read snapshot `id`: exactly the manifested files, nothing newer. */
  def read(spark: SparkSession, snapRoot: String, id: String): DataFrame =
    spark.read.parquet(manifest(spark, snapRoot, id): _*)

  /** Export snapshot `id` as a SELF-CONTAINED portable directory
    * (reference: 20260609-external-snapshot-export-restore.md —
    * snapshots export to external storage and restore into a different
    * cluster): the manifested data files are copied under
    * `destDir/data/`, so the export survives GC/compaction/drop of the
    * source collection. Returns the number of files exported.
    */
  def export(spark: SparkSession, snapRoot: String, id: String, destDir: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(s"$destDir/data")
    val fs = dest.getFileSystem(conf)
    require(!fs.exists(dest), s"export target $dest already exists")
    fs.mkdirs(dest)
    val files = manifest(spark, snapRoot, id)
    files.zipWithIndex.foreach { case (f, i) =>
      val src = new Path(f)
      org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
        fs, new Path(dest, f"part-$i%05d.parquet"), false, conf)
    }
    files.size
  }

  /** Open an exported snapshot — no manifest indirection needed: the
    * directory IS the snapshot.
    */
  def restore(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(s"$destDir/data")
}
