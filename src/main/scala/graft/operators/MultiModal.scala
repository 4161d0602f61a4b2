package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Multimodal payload plumbing: image/audio/video handled as opaque
  * `binary` columns with typed metadata, processed by iterator-to-
  * iterator `mapPartitions` batches.
  *
  * The actual media codec (JPEG decode, audio resample, video frame
  * extraction) is STUBBED with a deterministic fake — the container has
  * no image/audio libraries — but the Spark-side contract is real and
  * tested: schema (binary payload + metadata struct), partition-local
  * batch processing with no shuffle, and SQL-checkable deterministic
  * features. Swapping [[decodeStub]] for a real codec changes no
  * plumbing.
  *
  * Scale design: feature extraction is a narrow map — payload bytes
  * never shuffle. Column pruning drops `payload` for queries that touch
  * only metadata; keep payloads in their own parquet column so scans of
  * metadata stay cheap at 100 TB.
  */
object MultiModal {

  /** Attach a binary payload + metadata struct to a table. In production
    * the payload parquet column is written at ingest; here we derive it
    * from a text column (UTF-8 bytes) so the pipeline is runnable and
    * oracle-checkable on the driver's test tables.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String,
      mime: String = "text/plain"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(lit(mime).as("mime"), length(payload).cast("long").as("n_bytes"))
        .as("media_meta"))
  }

  // not `private`: Spark's encoder codegen needs public accessors, else
  // every row pays the interpreted-projection fallback
  case class Features(
      id: Long, n_bytes: Long, n_frames: Long, head: Long, sum_sampled: Long)

  /** Deterministic stand-in for a real media decoder: "frame-samples"
    * every `stride`-th byte and reports exact integer features. Replace
    * with a codec call to produce real features; the signature
    * (bytes in, fixed-schema features out) is the contract.
    */
  private[graft] def decodeStub(bytes: Array[Byte], stride: Int): (Long, Long, Long) = {
    if (bytes.isEmpty) (0L, -1L, 0L)
    else {
      var i = 0; var n = 0L; var sum = 0L
      while (i < bytes.length) { sum += bytes(i) & 0xff; n += 1; i += stride }
      (n, (bytes(0) & 0xff).toLong, sum)
    }
  }

  /** Feature extraction over payload batches: partition-local, shuffle-
    * free. Output: (idCol, n_bytes, n_frames, head, sum_sampled).
    */
  def extractFeatures(withPayload: DataFrame, idCol: String, stride: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (nFrames, head, sum) = decodeStub(bytes, stride)
          Features(id, bytes.length.toLong, nFrames, head, sum)
        }
      }
      .toDF()
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic stand-in for a pixel resize: maps the payload to
    * exactly `targetBytes` by periodic sampling (up- or down-"scaling").
    * A real image resize has the identical contract — bytes in, bytes of
    * a known size out — so swapping the codec changes no plumbing.
    */
  private[graft] def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes.isEmpty) new Array[Byte](0)
    else Array.tabulate(targetBytes)(i => bytes(((i.toLong * bytes.length) / targetBytes).toInt))
  }

  case class Resized(id: Long, payload: Array[Byte], n_bytes: Long)

  /** Payload→payload transform (the resize shape): binary in, binary
    * out, metadata refreshed; narrow map, nothing shuffles.
    */
  def resize(withPayload: DataFrame, idCol: String, targetBytes: Int): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = resizeStub(bytes, targetBytes)
        Resized(id, out, out.length.toLong)
      })
      .toDF()
      .withColumnRenamed("id", idCol)
  }

  case class Frame(id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling (the video shape): one INPUT row fans out to one row
    * per sampled fixed-size frame — `mapPartitions` + iterator flatMap,
    * so a long video never materializes all frames at once and the fan-
    * out happens where the bytes already live (no shuffle; downstream
    * repartition can rebalance if frame counts skew).
    */
  def sampleFrames(withPayload: DataFrame, idCol: String, frameBytes: Int,
      stride: Int = 2): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          Frame(id, f.toLong,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
        }
      })
      .toDF()
      .withColumnRenamed("id", idCol)
  }
}
