package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinlogSpec extends SparkSpec {
  import spark.implicits._

  test("payload encode/decode round-trips every supported type") {
    import Binlog.DType
    assert(Binlog.decodePayload(DType.Int64,
      Binlog.encodePayload(DType.Int64, Seq(1L, -7L, Long.MaxValue))) ==
      Seq(1L, -7L, Long.MaxValue))
    assert(Binlog.decodePayload(DType.Double,
      Binlog.encodePayload(DType.Double, Seq(1.5, -0.25))) == Seq(1.5, -0.25))
    assert(Binlog.decodePayload(DType.VarChar,
      Binlog.encodePayload(DType.VarChar, Seq("a", "", "héllo"))) ==
      Seq("a", "", "héllo"))
    assert(Binlog.decodePayload(DType.Bool,
      Binlog.encodePayload(DType.Bool, Seq(true, false))) == Seq(true, false))
    assert(Binlog.decodePayload(DType.FloatVector,
      Binlog.encodePayload(DType.FloatVector, Seq(Seq(1f, 2f), Seq(3f, 4f)))) ==
      Seq(Seq(1f, 2f), Seq(3f, 4f)))
  }

  test("binlog file round-trips descriptor and events byte-exactly") {
    val dir = Files.createTempDirectory("graft_binlog_spec_").toString
    val desc = Binlog.Descriptor(collectionId = 7L, partitionId = 3L,
      segmentId = 42L, fieldId = 101L, startTs = 1L, endTs = 9L,
      payloadType = Binlog.DType.Int64, fieldName = "pk")
    val events = Seq(
      Binlog.DataEvent(1, 1L, 5L, Seq(10L, 20L, 30L)),
      Binlog.DataEvent(1, 6L, 9L, Seq(40L, 50L)))
    Binlog.writeFile(s"$dir/f1", desc, events)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/f1"))
    val (gotDesc, gotEvents) = Binlog.readFile(bytes)
    assert(gotDesc == desc)
    assert(gotEvents.map(e => (e.typeCode, e.startTs, e.endTs, e.values)) ==
      events.map(e => (e.typeCode, e.startTs, e.endTs, e.values)))
    // the writer is deterministic modulo parquet created_by metadata:
    // re-writing the parsed content yields a structurally equal file
    Binlog.writeFile(s"$dir/f2", gotDesc, gotEvents)
    val (d2, e2) = Binlog.readFile(
      Files.readAllBytes(java.nio.file.Paths.get(s"$dir/f2")))
    assert(d2 == gotDesc && e2.map(_.values) == gotEvents.map(_.values))
  }

  test("segment write/read round-trips a DataFrame with delete masking") {
    val dir = Files.createTempDirectory("graft_binlog_seg_").toString
    val df = Seq(
      (1L, "a", 1.5, Seq(1f, 0f)),
      (2L, "b", 2.5, Seq(0f, 1f)),
      (3L, "c", 3.5, Seq(1f, 1f)),
      (4L, "d", 4.5, Seq(2f, 2f))
    ).toDF("pk", "name", "score", "emb")
    Binlog.writeSegment(df.filter($"pk" <= 2), s"$dir/seg-0", 1L, 1L, 0L, "pk")
    Binlog.writeSegment(df.filter($"pk" > 2), s"$dir/seg-1", 1L, 1L, 1L, "pk",
      deletes = Some(Seq(4L).toDF("pk")))
    val got = Binlog.readSegments(spark, dir)
    assert(got.schema.fieldNames.toSeq == Seq("pk", "name", "score", "emb"))
    val rows = got.orderBy($"pk")
      .as[(Long, String, Double, Seq[Float])].collect().toSeq
    assert(rows == Seq(
      (1L, "a", 1.5, Seq(1f, 0f)),
      (2L, "b", 2.5, Seq(0f, 1f)),
      (3L, "c", 3.5, Seq(1f, 1f))))
  }

  test("truncated file and bad magic are refused") {
    intercept[IllegalArgumentException] {
      Binlog.readFile(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    val dir = Files.createTempDirectory("graft_binlog_bad_").toString
    Binlog.writeFile(s"$dir/f", Binlog.Descriptor(1, 1, 1, 100, 1, 1,
      Binlog.DType.Int64, "pk"), Seq(Binlog.DataEvent(1, 1, 1, Seq(1L))))
    val whole = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/f"))
    intercept[Exception] { Binlog.readFile(whole.dropRight(5)) }
  }
}
