package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** NumPy `.npy` bulk-import reader (reference: numpy import format in
  * internal/util/importutilv2/numpy/ — the standard way embedding dumps
  * arrive). Parses the NPY v1/v2 header and yields one row per matrix
  * row: (file, row_idx, vec array<float>).
  *
  * Distribution model matches the reference's import shape: bulk import
  * is a DIRECTORY of per-segment files, and `binaryFiles` assigns files
  * to tasks — so parallelism scales with file count, and no single task
  * ever parses more than one file. (A single multi-TB .npy is not a
  * thing importers produce; the reference also splits per field/segment.)
  */
object Npy {

  final case class Header(descr: String, fortranOrder: Boolean, shape: Seq[Int],
      dataOffset: Int)

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Parse the NPY header from the file's leading bytes. */
  def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length > 10 && bytes.take(6).sameElements(Magic), "not an NPY file")
    val major = bytes(6)
    val (headerLen, dictStart) =
      if (major == 1) {
        (((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff), 10)
      } else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    val dict = new String(bytes, dictStart, headerLen, "ASCII")
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(dict)
      .map(_.group(1)).getOrElse(sys.error(s"no descr in NPY header: $dict"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(dict)
      .map(_.group(1) == "True").getOrElse(false)
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(dict)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(sys.error(s"no shape in NPY header: $dict"))
    Header(descr, fortran, shape, dictStart + headerLen)
  }

  /** Decode one file's rows: 1-D = a single vector, 2-D = (rows, dim). */
  private[sources] def decode(bytes: Array[Byte]): Iterator[(Long, Seq[Float])] = {
    val h = parseHeader(bytes)
    require(!h.fortranOrder, "fortran-order NPY not supported (transpose on export)")
    require(h.shape.nonEmpty && h.shape.length <= 2,
      s"only 1-D/2-D NPY supported, got shape ${h.shape}")
    val (rows, dim) = h.shape match {
      case Seq(n)    => (1, n)
      case Seq(n, d) => (n, d)
    }
    val buf = ByteBuffer.wrap(bytes, h.dataOffset, bytes.length - h.dataOffset)
      .order(if (h.descr.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val next: () => Float = h.descr.stripPrefix("<").stripPrefix(">").stripPrefix("|") match {
      case "f4" => () => buf.getFloat
      case "f8" => () => buf.getDouble.toFloat
      case "i4" => () => buf.getInt.toFloat
      case "i8" => () => buf.getLong.toFloat
      case "i1" => () => buf.get.toFloat
      case "u1" => () => (buf.get & 0xff).toFloat
      case other => sys.error(s"unsupported NPY dtype $other")
    }
    (0 until rows).iterator.map { r =>
      (r.toLong, Seq.fill(dim)(next()))
    }
  }

  private val schema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row_idx", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Read a file/glob/directory of .npy files: (file, row_idx, vec). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      decode(pds.toArray()).map { case (i, v) => Row(file, i, v) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write a 2-D float32 matrix as an NPY v1 file (`<f4`, C order) —
    * the export half of the import contract, used by tests and the
    * round-trip oracle query. Caller bounds `rows` (this is a fixture
    * writer, not a data path; bulk exports go through parquet).
    */
  def write(path: String, rows: Seq[Array[Float]]): Unit = {
    require(rows.nonEmpty, "empty NPY write")
    val dim = rows.head.length
    require(rows.forall(_.length == dim), "ragged rows in NPY write")
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': (${rows.length}, $dim), }"
    // header (magic + version + len + dict) padded with spaces to 64-byte
    // alignment, newline-terminated (numpy format spec v1.0)
    val unpadded = Magic.length + 2 + 2 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val headerLen = dict.length + pad + 1
    val buf = ByteBuffer.allocate(unpadded + pad + rows.length * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
      .put((headerLen & 0xff).toByte).put(((headerLen >> 8) & 0xff).toByte)
      .put(dict.getBytes("ASCII")).put(Array.fill(pad)(' '.toByte)).put('\n'.toByte)
    rows.foreach(r => r.foreach(buf.putFloat))
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }
}
