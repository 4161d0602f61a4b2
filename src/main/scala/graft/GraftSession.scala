package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by Verify, Bench, tests and examples.
  *
  * Scale notes: shuffle partitions default to the local core count here,
  * but on a real cluster callers should leave
  * `spark.sql.shuffle.partitions` to AQE coalescing
  * (`spark.sql.adaptive.enabled=true` below lets Spark right-size
  * post-shuffle partitions at 100 TB without manual tuning).
  */
object GraftSession {

  /** Local session tuned for the test harness (local[N], AQE on, UTC). */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // local-only: the test parquet files are single-digit MB, so the
      // default 128 MB split puts a whole table in ONE task — expensive
      // per-row expressions (minhash, simhash) then run single-threaded.
      // On a real cluster leave the default; files are many and large.
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      // events.parquet carries TIMESTAMP(NANOS); read as long (nanos)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-provided parquet tables under `dir`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
