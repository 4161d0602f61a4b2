package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

class NpySpec extends SparkSpec {
  import spark.implicits._

  /** Hand-build a v1 .npy file (little-endian f4, C-order). */
  private def writeNpy(path: String, rows: Array[Array[Float]]): Unit = {
    val shape = s"(${rows.length}, ${rows.head.length})"
    var dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': $shape, }"
    // pad so that 10 + len(dict) ≡ 0 (mod 64), newline-terminated
    val total = 10 + dict.length + 1
    dict = dict + " " * ((64 - total % 64) % 64) + "\n"
    val out = new DataOutputStream(new FileOutputStream(path))
    out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
    out.write(dict.length & 0xff); out.write((dict.length >> 8) & 0xff)
    out.write(dict.getBytes("ASCII"))
    val buf = ByteBuffer.allocate(rows.length * rows.head.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach(_.foreach(buf.putFloat))
    out.write(buf.array())
    out.close()
  }

  test("npy reader parses v1 headers and row-major f4 data") {
    val path = "/tmp/graft_test_vectors.npy"
    val data = Array(
      Array(1.5f, -2.25f, 3f),
      Array(0f, 10f, -0.5f))
    writeNpy(path, data)
    val got = Npy.read(spark, path)
      .select($"row_idx", $"vec").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(got.length == 2)
    assert(got(0)._2 == data(0).toSeq && got(1)._2 == data(1).toSeq)
  }

  test("bulk import dispatch routes formats and rejects binlog") {
    val viaDispatch = BulkImport.read(spark, "npy", "/tmp/graft_test_vectors.npy")
    assert(viaDispatch.count() == 2)
    val pq = BulkImport.read(spark, "parquet", s"$sfDir/embeddings.parquet")
    assert(pq.count() > 0)
    intercept[IllegalArgumentException] {
      BulkImport.read(spark, "binlog", "/tmp/whatever")
    }
  }

  test("header parser handles padding, v2 length field, and rejects garbage") {
    val v2 = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 2, 0) ++ {
      val dict = "{'descr': '<i8', 'fortran_order': False, 'shape': (4,), }\n"
      val lenBytes = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(dict.length).array()
      lenBytes ++ dict.getBytes("ASCII")
    }
    val h = Npy.parseHeader(v2 ++ new Array[Byte](32))
    assert(h.descr == "<i8" && h.shape == Seq(4))
    intercept[IllegalArgumentException] {
      Npy.parseHeader("not an npy file at all".getBytes)
    }
  }
}
