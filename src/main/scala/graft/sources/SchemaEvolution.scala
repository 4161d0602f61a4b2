package graft.sources

import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Schema evolution over a segmented parquet layout (reference:
  * `AddCollectionField` / `AlterCollectionField` in internal/proxy/impl.go
  * — a collection's schema can grow a nullable field with a
  * `default_value`; segments sealed BEFORE the DDL simply lack the
  * column, and reads fill the default).
  *
  * Spark-first shape: parquet `mergeSchema` unions the per-segment
  * schemas (old segments yield null for the added column — a metadata
  * merge, no data rewrite, same as the reference which never rewrites
  * sealed binlogs on DDL), then `coalesce(col, default)` applies the
  * field's default value. Column pruning and predicate pushdown still
  * reach the scan: the default fill is a plain projection on top.
  */
object SchemaEvolution {

  /** Read segment paths under a merged (evolved) schema, filling
    * `defaults` (fieldName -> default literal) where old segments have
    * no value. Fields absent from `defaults` stay nullable-null.
    */
  def readMerged(spark: SparkSession, paths: Seq[String],
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    defaults.foldLeft(merged) { case (df, (field, default)) =>
      require(df.columns.contains(field),
        s"default for unknown field $field (have: ${df.columns.mkString(", ")})")
      df.withColumn(field, coalesce(col(field), default))
    }
  }

  /** Convenience for tests: default as a plain value. */
  def readMergedValues(spark: SparkSession, paths: Seq[String],
      defaults: Map[String, Any]): DataFrame =
    readMerged(spark, paths, defaults.map { case (k, v) => k -> lit(v) })

  /** Drop a collection field (reference:
    * 20260413-drop-collection-field-design.md — DDL-level removal, no
    * segment rewrite; the column simply stops being served and later
    * re-adding the name starts fresh). Read-side: a projection mask.
    */
  def dropField(df: DataFrame, field: String): DataFrame = {
    require(df.columns.contains(field), s"no such field $field")
    df.drop(field)
  }
}
