package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** JSON flat/stats shredded index (reference: `index/json_stats/` +
  * `index/JsonFlatIndex.cpp` — at flush, collect key statistics over a
  * JSON column, shred the FREQUENT typed paths into real columnar
  * subcolumns, keep everything else reachable through the raw JSON;
  * queries on shredded paths are answered from the typed columns, the
  * rest fall back to per-row JSON parsing).
  *
  * Spark-first shape: statistics collection is Spark's own distributed
  * JSON schema inference (`spark.read.json` over the string column —
  * one pass, executor-parallel); shredding is ONE `from_json` per row
  * (not one parse per path) projected into flat typed columns; the
  * shredded layout is plain parquet, so path predicates compile to
  * `PushedFilters` + zone-map pruning exactly like any scalar column —
  * at 100 TB the JSON is parsed once at flush, never on the read path.
  */
object JsonShred {

  /** One shredded path: dotted JSON path, inferred Spark type, and the
    * fraction of rows carrying the path (the frequency STATS decide
    * shred-vs-fallback, as the reference's key-stats do).
    */
  final case class PathStat(path: String, dataType: DataType, freq: Double)

  final case class Manifest(jsonCol: String, paths: Seq[PathStat]) {
    def shredded(path: String): Option[PathStat] = paths.find(_.path == path)
  }

  /** Column name a shredded path lands in (`$meta.a.b` → `_js_a_b`). */
  def shredColName(path: String): String = "_js_" + path.replace('.', '_')

  /** Flatten a struct schema into dotted scalar leaf paths. Arrays and
    * deeper non-scalar leaves stay un-shredded (served by fallback) —
    * the reference's flat index likewise shreds leaf scalars.
    */
  private def leafPaths(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => leafPaths(st, p)
        case dt @ (LongType | DoubleType | StringType | BooleanType) => Seq(p -> dt)
        case _ => Nil
      }
    }

  /** Collect path statistics: distributed schema inference, then ONE
    * aggregate pass counting per-path presence. Paths present in at
    * least `minFreq` of rows (capped at `maxPaths`, most frequent
    * first) become shredded columns.
    *
    * Stats run over a `sampleRows`-bounded prefix — key statistics are
    * a frequency ESTIMATE deciding layout, not a correctness input, so
    * at 100 TB the analyze cost stays constant (the reference likewise
    * collects stats per flushed segment, never over the full
    * collection). Pass Int.MaxValue to force exact stats.
    */
  def analyze(df: DataFrame, jsonCol: String, minFreq: Double = 0.5,
      maxPaths: Int = 16, sampleRows: Int = 100000): Manifest = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.limit(sampleRows)
    val strings = sample.select(col(jsonCol)).as[String]
    val inferred = spark.read.json(strings).schema
    val leaves = leafPaths(inferred)
    if (leaves.isEmpty) return Manifest(jsonCol, Nil)
    val presence = sample.agg(
      count(lit(1)).as("_n"),
      leaves.map { case (p, _) =>
        count(get_json_object(col(jsonCol), s"$$.$p")).as(shredColName(p))
      }: _*).head()
    val total = math.max(presence.getLong(0), 1L).toDouble
    val stats = leaves.zipWithIndex.map { case ((p, dt), i) =>
      PathStat(p, dt, presence.getLong(i + 1) / total)
    }
    Manifest(jsonCol,
      stats.filter(_.freq >= minFreq).sortBy(-_.freq).take(maxPaths))
  }

  /** Materialize the shredded columns next to the original data: one
    * `from_json` parse per row, flat typed projections out of it.
    */
  def shred(df: DataFrame, manifest: Manifest): DataFrame = {
    if (manifest.paths.isEmpty) return df
    // parse with a schema covering exactly the shredded paths — nested
    // paths re-assemble into the minimal struct tree
    def treeOf(paths: Seq[(Seq[String], DataType)]): StructType =
      StructType(paths.groupBy(_._1.head).toSeq.sortBy(_._1).map {
        case (name, group) =>
          val (leaves, deeper) = group.partition(_._1.lengthCompare(1) == 0)
          if (deeper.isEmpty) StructField(name, leaves.head._2, nullable = true)
          else StructField(name,
            treeOf(deeper.map { case (segs, dt) => (segs.tail, dt) }),
            nullable = true)
      })
    val schema = treeOf(manifest.paths.map(p => (p.path.split('.').toSeq, p.dataType)))
    val parsed = from_json(col(manifest.jsonCol), schema)
    // dotted paths resolve segment by segment out of the parsed struct
    val shredCols = manifest.paths.map { p =>
      p.path.split('.').foldLeft(parsed: Column)(_.getField(_)).as(shredColName(p.path))
    }
    df.select(col("*") +: shredCols: _*)
  }

  /** Write the shredded layout (the flush-time index build). */
  def write(df: DataFrame, manifest: Manifest, path: String,
      numPartitions: Int): Unit =
    shred(df, manifest).repartition(numPartitions)
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Auto-route a path reference: shredded paths read the typed column
    * (parquet-pushable), everything else falls back to per-row JSON
    * extraction — the reference's shared-key fallback.
    */
  def pathCol(manifest: Manifest, path: String, fallbackType: DataType): Column =
    manifest.shredded(path) match {
      case Some(_) => col(shredColName(path))
      case None =>
        get_json_object(col(manifest.jsonCol), s"$$.$path").cast(fallbackType)
    }
}
