package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the winnowing fingerprint plan. */
object WinnowDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$label: $n rows in ${(System.nanoTime() - t0) / 1e9}s")
    }
    val docs = graft.GraftSession.table(spark, dir, "documents")
    time("read")(docs.count())
    val fp = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.winnowFingerprints(col("text"))).as("fp"))
    time("winnow all")(fp.count())
    fp.explain("formatted")
    spark.stop()
  }
}
