package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bulk-import format dispatch (reference:
  * internal/util/importutilv2/{parquet,json,numpy,csv,binlog}/ — one
  * reader per accepted wire format). parquet/json/csv are Spark-native
  * readers (distributed, schema-inferring, predicate-pushdown-capable);
  * numpy goes through [[Npy]]; binlog is the reference engine's internal
  * WAL encoding with no public contract, so it is rejected with
  * guidance rather than half-parsed.
  */
object BulkImport {

  def read(spark: SparkSession, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    format.toLowerCase match {
      case "parquet" => spark.read.options(options).parquet(path)
      case "json"    => spark.read.options(options).json(path)
      case "csv"     =>
        spark.read.options(Map("header" -> "true", "inferSchema" -> "true") ++ options)
          .csv(path)
      case "npy" | "numpy" => Npy.read(spark, path)
      case "binlog" => throw new IllegalArgumentException(
        "binlog is the reference engine's internal WAL format; export segments " +
          "to parquet for import")
      case other => throw new IllegalArgumentException(s"unknown import format: $other")
    }
}
