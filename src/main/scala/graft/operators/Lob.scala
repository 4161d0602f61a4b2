package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** LOB (large-object) externalization + garbage collection (reference:
  * internal/storagev2/packed/ffi_common.go:398 `LobFileInfo` — oversized
  * binary values live in separate LOB files referenced from the row
  * data; internal/datacoord/garbage_collector_lob.go walks segment
  * manifests and deletes LOB files no live segment references;
  * compaction merges references instead of rewriting payloads
  * (`AddLobFilesToTransaction` REUSE_ALL)).
  *
  * Spark-first shape, content-addressed: the blob store keys payloads by
  * digest, so identical payloads are stored ONCE (byte-level dedup — for
  * a multimodal training corpus this is also the image/audio exact-dedup
  * primitive), and GC is one left-semi join of blobs against live
  * references — ids-only shuffle on the digest key, payloads never
  * move except when first externalized. Deletes/compaction never touch
  * the blob store; GC runs as its own batch job, same as the reference.
  */
object Lob {

  /** Split `df` into (data with `binCol` replaced by `_lob_ref`/`_lob_bytes`,
    * blob store (_lob_ref, payload)). Payloads dedup by digest.
    */
  def externalize(df: DataFrame, binCol: String): (DataFrame, DataFrame) = {
    val data = df
      .withColumn("_lob_ref", md5(col(binCol)))
      .withColumn("_lob_bytes", octet_length(col(binCol)).cast("long"))
      .drop(binCol)
    // one shuffle on the digest; payloads ride once as max-by proxy
    // (any row's payload works — digests are content hashes)
    val blobs = df
      .select(md5(col(binCol)).as("_lob_ref"), col(binCol).as("payload"))
      .groupBy(col("_lob_ref"))
      .agg(first(col("payload")).as("payload"))
    (data, blobs)
  }

  /** Re-attach payloads to rows (the read path). Join on the digest key;
    * AQE broadcasts the smaller side when one fits.
    */
  def resolve(data: DataFrame, blobs: DataFrame, payloadCol: String = "payload"): DataFrame =
    data.join(blobs.withColumnRenamed("payload", payloadCol), Seq("_lob_ref"), "left")

  /** GC: keep only blobs some live row still references (the reference's
    * manifest-walk, as a semi join — no payload shuffle, the probe side
    * is digests only).
    */
  def gc(blobs: DataFrame, liveData: DataFrame): DataFrame =
    blobs.join(liveData.select(col("_lob_ref")).distinct(), Seq("_lob_ref"), "left_semi")
}
