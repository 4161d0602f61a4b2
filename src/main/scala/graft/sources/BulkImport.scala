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
    project(raw, fieldMapping, path)
  }

  private[sources] def project(raw: DataFrame, fieldMapping: Map[String, String],
      path: String): DataFrame = {
    val missing = fieldMapping.values.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"external table $path lacks mapped columns: ${missing.mkString(", ")}")
    raw.select(fieldMapping.toSeq.sortBy(_._1).map { case (field, ext) =>
      org.apache.spark.sql.functions.col(ext).as(field)
    }: _*)
  }
}

/** External table with a STABLE fragment snapshot + refresh (reference:
  * docs/user_guides/external_table.md and the refresh designs
  * 20260526-milvus-table-external-source.md /
  * 20260526-external_table_add_column_refresh.md).
  *
  * Reads serve exactly the file fragments captured at creation or last
  * [[refresh]] — files landing in the directory later are INVISIBLE
  * until the next refresh (the manifest-snapshot contract; a live Spark
  * path read would silently pick them up). Refresh diffs the directory:
  * unchanged fragments are kept as-is (the same-segment patch — no
  * rewrite), new fragments join, removed fragments drop out, and the
  * field mapping can grow additively (a new collection field mapped
  * onto an existing external column); fragments predating the column
  * serve null for it via mergeSchema. Dropping or re-mapping fields is
  * a non-goal, as in the reference.
  *
  * Scale note: the snapshot is a driver-side path list (the catalog
  * manifest analogue); the data plane stays a plain distributed scan
  * with pushdown over the pinned fragment paths.
  */
final class ExternalTable private (
    spark: SparkSession,
    format: String,
    dir: String,
    private var mapping: Map[String, String],
    private var functions: Seq[graft.functions.IngestFunctions.FunctionSchema] =
      Nil) {

  final case class RefreshStats(kept: Int, added: Int, removed: Int)

  /** One recorded refresh (reference: impl.go
    * ListRefreshExternalCollectionJobs:7464 /
    * GetRefreshExternalCollectionProgress:7416 — datacoord's refresh-job
    * registry). Refreshes run synchronously inside [[refresh]], so a
    * recorded job is always Completed at 100% — the polling contract
    * holds with a zero-width Executing window, the same device as the
    * import and compaction registries.
    */
  final case class RefreshJob(id: Long, state: String, progress: Int,
      kept: Int, added: Int, removed: Int)

  private var refreshJobs: Vector[RefreshJob] = Vector.empty
  private val jobIds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** ListRefreshExternalCollectionJobs: recorded jobs, newest first. */
  def listRefreshJobs: Seq[RefreshJob] = refreshJobs.reverse

  /** GetRefreshExternalCollectionProgress: one job's state + percent;
    * unknown ids error (the reference's failed status for unknown job
    * ids).
    */
  def getRefreshProgress(id: Long): RefreshJob =
    refreshJobs.find(_.id == id).getOrElse(
      throw new NoSuchElementException(s"no refresh job with id $id"))

  private var fragments: Vector[String] = Vector.empty

  // per-fragment manifest versions (reference BatchUpdateManifest:
  // proxy/impl.go:7265 → datacoord/services.go:2287 →
  // ddl_callbacks_batch_update_manifest.go — one batched commit bumps
  // each segment's manifest pointer; the storage-v3 sibling of the
  // refresh path's whole-snapshot advance). Creation/refresh admits
  // fragments at version 0; removed fragments drop their entries.
  private var manifests: Map[String, Long] = Map.empty

  /** Current (fragment, manifestVersion) view — the GetSegmentsInfo-
    * style consumer of the batch commit.
    */
  def fragmentManifests: Seq[(String, Long)] =
    fragments.map(f => f -> manifests.getOrElse(f, 0L))

  /** BatchUpdateManifest: commit per-fragment manifest-version bumps in
    * ONE batch call. Per-entry outcomes (batchDescribeCollection's
    * shape): an unknown fragment or a non-advancing version fails its
    * OWN entry while every valid entry still commits — the reference's
    * ack callback applies the valid operators and warns-and-skips the
    * rest instead of failing the batch
    * (ddl_callbacks_batch_update_manifest.go:26-60); an empty item list
    * is rejected up front (task_batch_update_manifest.go PreExecute).
    */
  def batchUpdateManifest(items: Seq[(String, Long)])
      : Seq[(String, scala.util.Try[Long])] = {
    require(items.nonEmpty, "items is empty")
    items.map { case (frag, ver) =>
      frag -> scala.util.Try {
        if (!fragments.contains(frag))
          throw new NoSuchElementException(s"unknown fragment: $frag")
        val cur = manifests.getOrElse(frag, 0L)
        if (ver <= cur)
          throw new IllegalArgumentException(
            s"manifest version $ver does not advance current $cur for $frag")
        manifests += frag -> ver
        ver
      }
    }
  }

  /** Lists via the Hadoop FileSystem API so hdfs:// / s3a:// / any
    * Hadoop-FS URI works, not just local paths (the class is a catalog
    * manifest over whatever store the cluster reads).
    */
  private def listFragments(): Vector[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val p  = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Vector.empty
    else fs.listStatus(p).toVector
      .filter { s => // fragments may be files or parquet dirs
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString).sorted
  }

  def fieldMapping: Map[String, String] = mapping
  def fragmentPaths: Seq[String] = fragments

  private def readWith(frags: Vector[String], map: Map[String, String]): DataFrame = {
    require(frags.nonEmpty, s"external table $dir has no fragments")
    val raw = format.toLowerCase match {
      case "parquet" =>
        spark.read.option("mergeSchema", "true").parquet(frags: _*)
      case "json" => spark.read.json(frags: _*)
      case "csv" =>
        spark.read.options(Map("header" -> "true", "inferSchema" -> "true"))
          .csv(frags: _*)
      case other => throw new IllegalArgumentException(
        s"external table format '$other' not supported")
    }
    // function output fields (reference: 20260521-external-table-
    // function-output.md — BM25/MinHash/TextEmbedding outputs over
    // external text fields; source columns stay referenced in place,
    // only the DERIVED columns are engine-computed). Spark-first the
    // derivation is a column expression evaluated at read — the same
    // lazy stance as the projection; persist()/cache covers re-reads
    // where the reference materializes packed column groups.
    graft.functions.IngestFunctions.applyAll(
      BulkImport.project(raw, map, dir), functions)
  }

  /** Read the SNAPSHOT fragments under the current mapping. */
  def read(): DataFrame = readWith(fragments, mapping)

  /** Re-list the directory and advance the snapshot; optionally grow the
    * mapping (additive only). Returns the fragment diff.
    *
    * Validates the CANDIDATE mapping against the CANDIDATE fragment list
    * BEFORE committing either — a refresh that references a column absent
    * from the new fragments throws and leaves the table exactly as it was
    * (mappings are additive-only, so a half-committed bad mapping would be
    * permanent otherwise).
    */
  def refresh(addMappings: Map[String, String] = Map.empty): RefreshStats = {
    addMappings.keys.find(mapping.contains).foreach { f =>
      throw new IllegalArgumentException(
        s"field '$f' is already mapped — refresh mappings are additive only")
    }
    val now        = listFragments()
    val candidate  = mapping ++ addMappings
    readWith(now, candidate) // validate first; throws without mutating state
    val stats = RefreshStats(
      kept = fragments.count(now.contains),
      added = now.count(f => !fragments.contains(f)),
      removed = fragments.count(f => !now.contains(f)))
    mapping = candidate
    fragments = now
    // manifest entries follow the snapshot: removed fragments drop out
    manifests = manifests.filter { case (f, _) => now.contains(f) }
    refreshJobs :+= RefreshJob(jobIds.incrementAndGet(), "Completed", 100,
      stats.kept, stats.added, stats.removed)
    stats
  }
}

object ExternalTable {
  /** Create over `dir`, snapshotting its current fragments; `functions`
    * are engine-computed output fields over the MAPPED columns
    * (reference: external-table function outputs — each function's
    * input must be a mapped collection field, validated here).
    */
  def create(spark: SparkSession, format: String, dir: String,
      fieldMapping: Map[String, String],
      functions: Seq[graft.functions.IngestFunctions.FunctionSchema] = Nil)
      : ExternalTable = {
    functions.foreach { fn =>
      require(fieldMapping.contains(fn.inputField),
        s"function input '${fn.inputField}' is not a mapped field")
      require(!fieldMapping.contains(fn.outputField),
        s"function output '${fn.outputField}' collides with a mapped field")
    }
    val dupOutputs = functions.groupBy(_.outputField).filter(_._2.size > 1).keys
    require(dupOutputs.isEmpty, // two functions must not share an output
      s"duplicate function output(s): ${dupOutputs.mkString(", ")}")
    val et = new ExternalTable(spark, format, dir, fieldMapping, functions)
    et.refresh()
    et
  }
}
