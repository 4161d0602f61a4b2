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

  /** External table with field mapping (reference:
    * docs/user_guides/external_table.md — `external_field` maps a
    * collection field name onto a differently-named column of the
    * external file; query-in-place, no copy). `fieldMapping` is
    * collectionField -> externalColumn; unmapped external columns are
    * dropped (the collection schema is the contract, not the file's).
    * Pure projection — pushdown/pruning on the mapped columns still
    * reaches the scan.
    */
  def readExternal(spark: SparkSession, format: String, path: String,
      fieldMapping: Map[String, String],
      options: Map[String, String] = Map.empty): DataFrame = {
    val raw = read(spark, format, path, options)
    val missing = fieldMapping.values.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"external table $path lacks mapped columns: ${missing.mkString(", ")}")
    raw.select(fieldMapping.toSeq.sortBy(_._1).map { case (field, ext) =>
      org.apache.spark.sql.functions.col(ext).as(field)
    }: _*)
  }
}
