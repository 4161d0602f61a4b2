package graft.operators

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotLobSpec extends SparkSpec {
  import spark.implicits._

  private def rmrf(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).sorted(Comparator.reverseOrder[JPath]())
        .forEach(f => Files.delete(f))
  }

  test("snapshot read is immune to later appends and compactions") {
    val base = "/tmp/graft_test_snap"
    rmrf(base)
    (1L to 10L).toDF("id").write.parquet(s"$base/data")
    val n = Snapshot.create(spark, s"$base/data", s"$base/snaps", "s1")
    assert(n > 0)
    (11L to 20L).toDF("id").write.mode("append").parquet(s"$base/data")
    val snapIds = Snapshot.read(spark, s"$base/snaps", "s1")
      .as[Long].collect().sorted
    assert(snapIds.toList == (1L to 10L).toList)
    // the live collection sees everything
    assert(spark.read.parquet(s"$base/data").count() == 20)
  }

  test("snapshots are immutable: re-creating an existing id fails") {
    val base = "/tmp/graft_test_snap2"
    rmrf(base)
    (1L to 3L).toDF("id").write.parquet(s"$base/data")
    Snapshot.create(spark, s"$base/data", s"$base/snaps", "s1")
    intercept[Exception](
      Snapshot.create(spark, s"$base/data", s"$base/snaps", "s1"))
  }

  test("lob externalize dedups identical payloads; gc drops unreferenced") {
    val docs = Seq(
      (1L, "same-bytes"), (2L, "same-bytes"), (3L, "other"), (4L, "doomed"))
      .toDF("id", "txt")
      .select($"id", encode($"txt", "UTF-8").as("payload"))
    val (data, blobs) = Lob.externalize(docs, "payload")
    assert(blobs.count() == 3) // content-addressed: 2 identical payloads → 1 blob
    val live = data.filter($"id" =!= 4L)
    val kept = Lob.gc(blobs, live)
    assert(kept.count() == 2) // "doomed" blob collected
    val resolved = Lob.resolve(live, kept)
      .select($"id", decode($"payload", "UTF-8").as("txt"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(resolved.toList ==
      List((1L, "same-bytes"), (2L, "same-bytes"), (3L, "other")))
  }

  test("lob gc keeps a blob while ANY referencing row survives") {
    val docs = Seq((1L, "shared"), (2L, "shared"))
      .toDF("id", "txt").select($"id", encode($"txt", "UTF-8").as("payload"))
    val (data, blobs) = Lob.externalize(docs, "payload")
    val live = data.filter($"id" === 1L) // delete row 2, row 1 still refs the blob
    assert(Lob.gc(blobs, live).count() == 1)
  }

  test("exported snapshot survives deletion of the source collection") {
    val base = "/tmp/graft_test_snap_export"
    rmrf(base)
    (1L to 8L).toDF("id").write.parquet(s"$base/data")
    Snapshot.create(spark, s"$base/data", s"$base/snaps", "s1")
    val n = Snapshot.export(spark, s"$base/snaps", "s1", s"$base/exported")
    assert(n > 0)
    rmrf(s"$base/data") // source collection dropped/GC'd
    val restored = Snapshot.restore(spark, s"$base/exported")
      .as[Long].collect().sorted
    assert(restored.toList == (1L to 8L).toList)
    // export refuses to clobber an existing target
    intercept[IllegalArgumentException](
      Snapshot.export(spark, s"$base/snaps", "s1", s"$base/exported"))
  }
}
