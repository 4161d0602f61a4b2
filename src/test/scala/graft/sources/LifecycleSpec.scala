package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.PartitionKey

class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("Npy.write/read round-trips float32 matrices bit-exactly") {
    val path = "/tmp/graft_test_npy_rt.npy"
    val data = Seq(
      Array(1.5f, -2.25f, Float.MinPositiveValue),
      Array(0f, 1e30f, -0.5f),
      Array(Float.MaxValue, -1f, 42f))
    Npy.write(path, data)
    val got = Npy.read(spark, path)
      .select($"row_idx", $"vec").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(got.map(_._2.toList).toList == data.map(_.toList).toList)
  }

  test("Npy.write rejects ragged and empty input") {
    intercept[IllegalArgumentException](Npy.write("/tmp/x.npy", Seq.empty))
    intercept[IllegalArgumentException](
      Npy.write("/tmp/x.npy", Seq(Array(1f), Array(1f, 2f))))
  }

  test("SchemaEvolution fills defaults only where the column is absent") {
    val base = "/tmp/graft_test_evolve"
    Seq((1L, 10.0), (2L, 20.0)).toDF("pk", "v")
      .write.mode("overwrite").parquet(s"$base/old")
    Seq((3L, 30.0, "x"), (4L, 40.0, null.asInstanceOf[String]))
      .toDF("pk", "v", "tag")
      .write.mode("overwrite").parquet(s"$base/new")
    val got = SchemaEvolution
      .readMergedValues(spark, Seq(s"$base/old", s"$base/new"), Map("tag" -> "D"))
      .select($"pk", $"tag").as[(Long, String)].collect().sortBy(_._1)
    // old-segment rows AND explicit nulls in new segments both take the
    // default — matching the reference, where a nullable added field
    // reads back default_value when unset
    assert(got.toList == List((1L, "D"), (2L, "D"), (3L, "x"), (4L, "D")))
  }

  test("SchemaEvolution rejects defaults for unknown fields") {
    val base = "/tmp/graft_test_evolve2"
    Seq((1L, 1.0)).toDF("pk", "v").write.mode("overwrite").parquet(s"$base/a")
    intercept[IllegalArgumentException](
      SchemaEvolution.readMergedValues(spark, Seq(s"$base/a"), Map("nope" -> 1)))
  }

  test("PartitionKey routing prunes to a single directory partition") {
    val path = "/tmp/graft_test_partkey"
    val df = (0L until 400L).map(i => (i, i % 20, s"u$i")).toDF("id", "key", "v")
    PartitionKey.write(df, "key", numPartitions = 8, path)
    val routed = PartitionKey.readKeyEquals(spark, path, "key", lit(7L), 8)
    // correctness: exactly the key==7 rows
    assert(routed.count() == 20)
    assert(routed.agg(count_distinct($"key")).head().getLong(0) == 1)
    // pruning: the routing predicate reaches the scan as a directory-level
    // PartitionFilter on the folded partition id (not a post-scan Filter)
    val expectedPart = spark.range(1)
      .select(PartitionKey.partitionId(lit(7L), 8)).head().getLong(0)
    val planStr = routed.queryExecution.sparkPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.matches(s"(?s).*PartitionFilters: \\[[^\\]]*_part#\\d+ = $expectedPart.*"),
      s"expected a PartitionFilters entry (_part = $expectedPart) in:\n$planStr")
  }

  test("materialized-view search: partition-key filter prunes before the vector scan") {
    import graft.functions.Metric
    import graft.operators.VectorSearch
    val path = "/tmp/graft_test_mv"
    val dim = 4
    val df = (0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d => (i * 31 + d).toFloat % 97), (i % 5).toInt)
    }.toDF("id", "vec", "cat")
    PartitionKey.write(df, "cat", numPartitions = 8, path)
    val pruned = PartitionKey.readKeyEquals(spark, path, "cat", lit(2), 8)
    // the ANN search's scan carries the directory-level PartitionFilter —
    // vectors outside the pinned key's partition are never read
    val qs = Seq((0L, Array.tabulate(dim)(d => (62 + d).toFloat % 97)))
      .toDF("qid", "qvec")
    val hits = VectorSearch.topK(pruned, "id", "vec", qs, "qid", "qvec",
      Metric.L2, k = 5)
    val expectedPart = spark.range(1)
      .select(PartitionKey.partitionId(lit(2), 8)).head().getLong(0)
    val planStr = hits.queryExecution.sparkPlan.toString
    assert(planStr.matches(s"(?s).*PartitionFilters: \\[[^\\]]*_part#\\d+ = $expectedPart.*"),
      s"expected a PartitionFilters entry (_part = $expectedPart) in:\n$planStr")
    // every hit is from the pinned key, and rank 1 is the exact row (id=2
    // has vec = (62+d)%97, matching the query): isolation didn't lose it
    val got = hits.select($"id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ % 5 == 2))
    assert(hits.filter($"rank" === 1).select($"id").as[Long].head() == 2L)
  }

  test("readExternal maps external column names and rejects missing ones") {
    val path = "/tmp/graft_test_external"
    Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("ext_id", "ext_name", "ext_score")
      .write.mode("overwrite").parquet(path)
    val mapped = BulkImport.readExternal(spark, "parquet", path,
      Map("id" -> "ext_id", "score" -> "ext_score"))
    assert(mapped.columns.toList == List("id", "score"))
    assert(mapped.agg(sum($"score")).head().getDouble(0) == 11.0)
    intercept[IllegalArgumentException](
      BulkImport.readExternal(spark, "parquet", path, Map("id" -> "missing_col")))
  }

  test("ExternalTable snapshots fragments; refresh diffs and widens the mapping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_extref").toString
    Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("ext_id", "ext_name", "ext_score")
      .write.parquet(s"$dir/f1")
    val et = ExternalTable.create(spark, "parquet", dir, Map("id" -> "ext_id"))
    // a fragment landing after the snapshot stays invisible until refresh
    Seq((3L, "c", 7.0)).toDF("ext_id", "ext_name", "ext_score")
      .write.parquet(s"$dir/f2")
    assert(et.read().count() == 2)
    val s1 = et.refresh(addMappings = Map("score" -> "ext_score"))
    assert(s1.kept == 1 && s1.added == 1 && s1.removed == 0)
    assert(et.read().columns.sorted.toSeq == Seq("id", "score"))
    assert(et.read().agg(sum($"score")).head().getDouble(0) == 18.0)
    // removed fragments drop out on the next refresh
    deleteRec(new java.io.File(s"$dir/f1"))
    val s2 = et.refresh()
    assert(s2.kept == 1 && s2.removed == 1)
    assert(et.read().count() == 1)
    // re-mapping an existing field is rejected (additive only)
    intercept[IllegalArgumentException](et.refresh(Map("id" -> "ext_name")))
    // a refresh whose widened mapping references a missing column fails
    // WITHOUT committing: the table keeps serving the old snapshot+mapping
    val (fragsBefore, mapBefore) = (et.fragmentPaths, et.fieldMapping)
    intercept[IllegalArgumentException](et.refresh(Map("extra" -> "no_such_col")))
    assert(et.fragmentPaths == fragsBefore && et.fieldMapping == mapBefore)
    assert(et.read().count() == 1) // still readable after the failed refresh
  }

  test("batchUpdateManifest commits per-fragment versions with per-entry failures") {
    val dir = java.nio.file.Files.createTempDirectory("graft_extman").toString
    Seq((1L, "a")).toDF("ext_id", "ext_name").write.parquet(s"$dir/f1")
    Seq((2L, "b")).toDF("ext_id", "ext_name").write.parquet(s"$dir/f2")
    val et = ExternalTable.create(spark, "parquet", dir, Map("id" -> "ext_id"))
    val Seq(f1, f2) = et.fragmentPaths.sorted
    assert(et.fragmentManifests.toMap == Map(f1 -> 0L, f2 -> 0L))
    // one batch: two valid bumps + an unknown fragment — the bad entry
    // fails alone, the valid ones commit (warn-and-skip, not batch-fail)
    val res = et.batchUpdateManifest(
      Seq(f1 -> 3L, f2 -> 1L, s"$dir/ghost" -> 9L)).toMap
    assert(res(f1).isSuccess && res(f2).isSuccess)
    assert(res(s"$dir/ghost").isFailure)
    assert(et.fragmentManifests.toMap == Map(f1 -> 3L, f2 -> 1L))
    // versions must advance: an equal or lower version fails its entry
    // without disturbing the committed state
    val res2 = et.batchUpdateManifest(Seq(f1 -> 3L, f2 -> 2L)).toMap
    assert(res2(f1).isFailure && res2(f2).isSuccess)
    assert(et.fragmentManifests.toMap == Map(f1 -> 3L, f2 -> 2L))
    // empty batches are rejected up front; refresh drops removed
    // fragments' manifest entries and admits new ones at version 0
    intercept[IllegalArgumentException](et.batchUpdateManifest(Nil))
    deleteRec(new java.io.File(new java.net.URI(f1).getPath))
    Seq((3L, "c")).toDF("ext_id", "ext_name").write.parquet(s"$dir/f3")
    et.refresh()
    val after = et.fragmentManifests.toMap
    assert(!after.contains(f1) && after(f2) == 2L)
    assert(after.exists { case (p, v) => p.endsWith("f3") && v == 0L })
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete()
  }

  test("dropField removes a column without touching data files") {
    val path = "/tmp/graft_test_dropfield"
    Seq((1L, "x", 5.0), (2L, "y", 6.0)).toDF("pk", "tag", "v")
      .write.mode("overwrite").parquet(path)
    val dropped = SchemaEvolution.dropField(spark.read.parquet(path), "tag")
    assert(dropped.columns.toList == List("pk", "v"))
    intercept[IllegalArgumentException](
      SchemaEvolution.dropField(dropped, "tag"))
    // the files still carry the column: re-adding the name starts fresh
    assert(spark.read.parquet(path).columns.contains("tag"))
  }
}
