package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.{ColumnIOFactory, DelegatingSeekableInputStream, InputFile, SeekableInputStream}
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Milvus v1 binlog segment reader/writer (reference:
  * `internal/storage/binlog_writer.go` MagicNumber/event layout,
  * `internal/storage/event_header.go` baseEventHeader,
  * `internal/storage/event_data.go` DescriptorEventDataFixPart,
  * `internal/util/importutilv2/binlog/reader.go` import shape — one
  * binlog FILE per field per segment, insert logs + delete logs).
  *
  * File layout (little-endian, as the reference's common.Endian):
  * {{{
  *   magic int32 (0xfffabc)
  *   descriptor event:
  *     header  : ts uint64 | typeCode int8 | eventLength int32 | nextPosition int32
  *     fixPart : collectionID int64 | partitionID int64 | segmentID int64 |
  *               fieldID int64 | startTs uint64 | endTs uint64 | payloadDataType int32
  *     extras  : extraLength int32 | extraBytes (json) | postHeaderLengths uint8[8]
  *   data events (insert or delete):
  *     header  : ts uint64 | typeCode int8 | eventLength int32 | nextPosition int32
  *     fixPart : startTs uint64 | endTs uint64
  *     payload : single-column parquet bytes (the reference encodes every
  *               payload chunk as parquet via pqarrow — payload_writer.go:91)
  * }}}
  *
  * Scale shape: a segment is the reference's bounded unit (~512 MB);
  * import parallelism is ACROSS segments — [[readSegments]] assigns one
  * task per segment directory through the Hadoop FS API, so a 100 TB
  * import is thousands of independent segment tasks, and no task ever
  * holds more than one segment's columns. Within a task, columns zip
  * positionally exactly as the reference's DeserializeReader does.
  */
object Binlog {

  val Magic: Int = 0xfffabc

  // schemapb.DataType codes (milvus-proto schema.proto)
  object DType {
    val Bool = 1; val Int64 = 5; val Double = 11; val VarChar = 21
    val FloatVector = 101
  }
  private val EvDescriptor: Byte = 0
  private val EvInsert: Byte = 1
  private val EvDelete: Byte = 2

  private def dtypeOf(dt: DataType): Int = dt match {
    case BooleanType => DType.Bool
    case LongType => DType.Int64
    case DoubleType => DType.Double
    case StringType => DType.VarChar
    case ArrayType(FloatType, _) => DType.FloatVector
    case other => sys.error(s"binlog: unsupported field type $other " +
      "(supported: boolean, long, double, string, array<float>)")
  }

  private def sparkTypeOf(code: Int): DataType = code match {
    case DType.Bool => BooleanType
    case DType.Int64 => LongType
    case DType.Double => DoubleType
    case DType.VarChar => StringType
    case DType.FloatVector => ArrayType(FloatType, containsNull = false)
    case other => sys.error(s"binlog: unknown payload data type code $other")
  }

  // ---- single-column parquet payload (payload_writer.go analogue) ----

  private def parquetSchemaFor(code: Int): MessageType = {
    val field = code match {
      case DType.Bool => "required boolean val;"
      case DType.Int64 => "required int64 val;"
      case DType.Double => "required double val;"
      case DType.VarChar => "required binary val (UTF8);"
      case DType.FloatVector => "repeated float val;"
    }
    MessageTypeParser.parseMessageType(s"message payload { $field }")
  }

  private[sources] def encodePayload(code: Int, values: Seq[Any]): Array[Byte] = {
    val tmp = Files.createTempFile("graft_binlog_payload_", ".parquet")
    Files.delete(tmp) // parquet writer refuses to overwrite
    val conf = new Configuration()
    val schema = parquetSchemaFor(code)
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(tmp.toUri), conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.ZSTD) // the reference's codec
      .build()
    val factory = new SimpleGroupFactory(schema)
    try values.foreach { v =>
      val g = factory.newGroup()
      code match {
        case DType.Bool => g.add("val", v.asInstanceOf[Boolean])
        case DType.Int64 => g.add("val", v.asInstanceOf[Long])
        case DType.Double => g.add("val", v.asInstanceOf[Double])
        case DType.VarChar => g.add("val", v.asInstanceOf[String])
        case DType.FloatVector =>
          v.asInstanceOf[Seq[Float]].foreach(f => g.add("val", f))
      }
      writer.write(g)
    } finally writer.close()
    val bytes = Files.readAllBytes(tmp)
    Files.delete(tmp)
    bytes
  }

  /** In-memory InputFile so payload decode never touches local disk on
    * the executor (the bytes already rode in with the event).
    */
  private final class BytesInputFile(bytes: Array[Byte]) extends InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): SeekableInputStream = {
      val in = new java.io.ByteArrayInputStream(bytes) {
        def seekTo(p: Long): Unit = { reset(); skip(p) }
        def position: Long = bytes.length - available()
      }
      new DelegatingSeekableInputStream(in) {
        override def getPos: Long = in.position
        override def seek(newPos: Long): Unit = in.seekTo(newPos)
      }
    }
  }

  private[sources] def decodePayload(code: Int, bytes: Array[Byte]): Seq[Any] = {
    val reader = ParquetFileReader.open(new BytesInputFile(bytes))
    val out = ArrayBuffer.empty[Any]
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val io = new ColumnIOFactory().getColumnIO(schema)
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rec = io.getRecordReader(pages, new GroupRecordConverter(schema))
        (0L until pages.getRowCount).foreach { _ =>
          val g: Group = rec.read()
          out += (code match {
            case DType.Bool => g.getBoolean("val", 0)
            case DType.Int64 => g.getLong("val", 0)
            case DType.Double => g.getDouble("val", 0)
            case DType.VarChar => g.getString("val", 0)
            case DType.FloatVector =>
              (0 until g.getFieldRepetitionCount("val")).map(g.getFloat("val", _))
          })
        }
        pages = reader.readNextRowGroup()
      }
    } finally reader.close()
    out.toSeq
  }

  // ---- event framing ----

  private def writeHeader(o: DataOutputStream, ts: Long, code: Byte,
      eventLength: Int, nextPosition: Int): Unit = {
    val b = ByteBuffer.allocate(17).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(ts); b.put(code); b.putInt(eventLength); b.putInt(nextPosition)
    o.write(b.array())
  }

  final case class Descriptor(collectionId: Long, partitionId: Long,
      segmentId: Long, fieldId: Long, startTs: Long, endTs: Long,
      payloadType: Int, fieldName: String)

  final case class DataEvent(typeCode: Byte, startTs: Long, endTs: Long,
      values: Seq[Any])

  /** Serialize one binlog file: magic | descriptor | events. */
  def writeFile(path: String, desc: Descriptor, events: Seq[DataEvent]): Unit = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    val magic = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(Magic)
    o.write(magic.array())
    // descriptor: extras carry the field NAME (the reference stores
    // names in the collection schema keyed by fieldID; a self-contained
    // file spares the import a side-channel schema) + original_size,
    // which the reference always writes (event_data.go originalSizeKey)
    val extras = s"""{"field_name":"${desc.fieldName}","original_size":"0"}"""
      .getBytes(StandardCharsets.UTF_8)
    val fixAndExtras = ByteBuffer
      .allocate(8 * 4 + 8 * 2 + 4 + 4 + extras.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    fixAndExtras.putLong(desc.collectionId).putLong(desc.partitionId)
      .putLong(desc.segmentId).putLong(desc.fieldId)
      .putLong(desc.startTs).putLong(desc.endTs)
      .putInt(desc.payloadType)
      .putInt(extras.length).put(extras)
    // postHeaderLengths: one uint8 per event type (event_data.go
    // PostHeaderLengths) — data events carry a 16-byte fix part
    fixAndExtras.put(Array.fill[Byte](8)(16))
    val descLen = 17 + fixAndExtras.position()
    writeHeader(o, desc.endTs, EvDescriptor, descLen, 4 + descLen)
    o.write(fixAndExtras.array(), 0, fixAndExtras.position())
    var pos = 4 + descLen
    events.foreach { ev =>
      val payload = encodePayload(desc.payloadType, ev.values)
      val evLen = 17 + 16 + payload.length
      pos += evLen
      writeHeader(o, ev.endTs, ev.typeCode, evLen, pos)
      val fix = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(ev.startTs).putLong(ev.endTs)
      o.write(fix.array())
      o.write(payload)
    }
    o.flush()
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, bos.toByteArray)
  }

  /** Parse one binlog file's descriptor + events from raw bytes. */
  def readFile(bytes: Array[Byte]): (Descriptor, Seq[DataEvent]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt() == Magic, "not a graft/milvus v1 binlog (bad magic)")
    // descriptor
    b.getLong(); val dCode = b.get(); b.getInt(); b.getInt()
    require(dCode == EvDescriptor, s"first event must be descriptor, got $dCode")
    val coll = b.getLong(); val part = b.getLong(); val seg = b.getLong()
    val fid = b.getLong(); val sts = b.getLong(); val ets = b.getLong()
    val ptype = b.getInt()
    val extraLen = b.getInt()
    val extraBytes = new Array[Byte](extraLen); b.get(extraBytes)
    val extras = new String(extraBytes, StandardCharsets.UTF_8)
    val fieldName = "\"field_name\"\\s*:\\s*\"([^\"]*)\"".r
      .findFirstMatchIn(extras).map(_.group(1)).getOrElse(s"field_$fid")
    b.position(b.position() + 8) // postHeaderLengths
    val desc = Descriptor(coll, part, seg, fid, sts, ets, ptype, fieldName)
    val events = ArrayBuffer.empty[DataEvent]
    while (b.remaining() > 0) {
      if (b.remaining() < 17 + 16) throw new EOFException("truncated binlog event")
      b.getLong(); val code = b.get(); val evLen = b.getInt(); b.getInt()
      val evSts = b.getLong(); val evEts = b.getLong()
      val payloadLen = evLen - 17 - 16
      val payload = new Array[Byte](payloadLen); b.get(payload)
      events += DataEvent(code, evSts, evEts, decodePayload(ptype, payload))
    }
    (desc, events.toSeq)
  }

  // ---- segment-level write/read (importutilv2/binlog shape) ----

  /** Write a DataFrame as one binlog segment: `insert_log/<fieldId>`
    * per column (fieldIDs from 100, the reference's user-field base),
    * and optionally `delta_log/<pk>` tombstones as (pk, ts) files.
    * Rows are ordered by `orderCol` before the column split so every
    * field file carries the SAME row order — the positional-zip
    * invariant the reference's column-chunk assembly relies on.
    */
  def writeSegment(df: DataFrame, dir: String, collectionId: Long,
      partitionId: Long, segmentId: Long, orderCol: String,
      deletes: Option[DataFrame] = None): Unit = {
    val fields = df.schema.fields
    val rows = df.orderBy(orderCol).collect() // a segment is bounded by design
    val ts = rows.length.toLong.max(1L)
    fields.zipWithIndex.foreach { case (f, i) =>
      val code = dtypeOf(f.dataType)
      val values = rows.toSeq.map { r =>
        f.dataType match {
          case ArrayType(FloatType, _) => r.getSeq[Float](i)
          case _ => r.get(i)
        }
      }
      writeFile(s"$dir/insert_log/${100 + i}",
        Descriptor(collectionId, partitionId, segmentId, 100 + i, 1L, ts,
          code, f.name),
        Seq(DataEvent(EvInsert, 1L, ts, values)))
    }
    deletes.foreach { d =>
      val del = d.collect()
      writeFile(s"$dir/delta_log/${100}",
        Descriptor(collectionId, partitionId, segmentId, 100, 1L, ts,
          dtypeOf(d.schema.fields(0).dataType), d.schema.fields(0).name),
        Seq(DataEvent(EvDelete, 1L, ts, del.toSeq.map(_.get(0)))))
    }
  }

  /** Read every segment under `dir` (layout `seg-N/insert_log/<fid>` +
    * optional `seg-N/delta_log/<fid>`) into one DataFrame, delete-masked.
    * One task per segment; columns zip positionally within the task.
    */
  def readSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val segDirs = fs.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.toString).sorted
    require(segDirs.nonEmpty, s"no segment directories under $dir")
    // schema from the first segment's descriptors (driver-side, cheap:
    // headers only — but readFile decodes payloads too; acceptable at
    // fixture scale, and a real deployment caches the schema anyway)
    val first = readSegmentRows(fs.getConf, segDirs.head)
    val schema = StructType(first._1.map { d =>
      StructField(d.fieldName, sparkTypeOf(d.payloadType), nullable = true)
    })
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val rdd = spark.sparkContext
      .parallelize(segDirs, segDirs.length)
      .flatMap { seg => readSegmentRows(serConf.value, seg)._2 }
    spark.createDataFrame(rdd, schema)
  }

  /** One segment → (field descriptors, delete-masked positional rows). */
  private def readSegmentRows(conf: Configuration,
      segDir: String): (Seq[Descriptor], Seq[Row]) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(segDir).getFileSystem(conf)
    def readAll(p: Path): Array[Byte] = {
      val st = fs.getFileStatus(p)
      val buf = new Array[Byte](st.getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      buf
    }
    val insertFiles = fs.listStatus(new Path(segDir, "insert_log"))
      .map(_.getPath).sortBy(_.getName.toLong)
    val cols = insertFiles.toSeq.map(p => readFile(readAll(p)))
    val descs = cols.map(_._1)
    val colVals: Seq[Seq[Any]] =
      cols.map(_._2.filter(_.typeCode == EvInsert).flatMap(_.values))
    require(colVals.map(_.length).distinct.size == 1,
      s"segment $segDir: field binlogs disagree on row count")
    val deltaDir = new Path(segDir, "delta_log")
    val deleted: Set[Any] =
      if (!fs.exists(deltaDir)) Set.empty
      else fs.listStatus(deltaDir).map(_.getPath).toSeq
        .flatMap(p => readFile(readAll(p))._2.filter(_.typeCode == EvDelete)
          .flatMap(_.values)).toSet
    // pk is the first field file by id (the reference resolves it from
    // the schema; writeSegment puts it at fieldID 100 by convention)
    val rows = colVals.transpose.collect {
      case vals if !deleted.contains(vals.head) => Row.fromSeq(vals)
    }
    (descs, rows)
  }
}
