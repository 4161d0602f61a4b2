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

  /** Content-addressing digest: SHA-256 (hex). MD5 is NOT acceptable
    * here — the store dedups first-writer-wins across every field and
    * tenant of a collection, and chosen-prefix MD5 collisions are
    * practical, so a crafted payload could poison a digest and a later
    * colliding payload would silently read back as the first writer's
    * bytes. SHA-256 has no known collision path.
    */
  private def digest(c: org.apache.spark.sql.Column) = sha2(c, 256)

  /** Split `df` into (data with `binCol` replaced by `_lob_ref`/`_lob_bytes`,
    * blob store (_lob_ref, payload)). Payloads dedup by digest.
    */
  def externalize(df: DataFrame, binCol: String): (DataFrame, DataFrame) = {
    val data = df
      .withColumn("_lob_ref", digest(col(binCol)))
      .withColumn("_lob_bytes", octet_length(col(binCol)).cast("long"))
      .drop(binCol)
    // one shuffle on the digest; payloads ride once as max-by proxy
    // (any row's payload works — digests are content hashes)
    val blobs = df
      .select(digest(col(binCol)).as("_lob_ref"), col(binCol).as("payload"))
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

  // ---- TEXT-field threshold externalization (reference: the TEXT
  // datatype is LOB-backed at/above the inline threshold —
  // MILVUS_TEXT_INLINE_THRESHOLD, default 64 KiB; below it the value
  // stays inline in the row data. Pinned by
  // test_milvus_client_text_lob.py:2434 — below ⇒ inline, at/above ⇒
  // LOB ref.) Unlike [[externalize]] (all-or-nothing binary columns),
  // only the oversized VALUES move; small/empty/null payloads never
  // touch the blob store, so the common short-text row pays nothing.

  /** Split a TEXT column at `threshold` bytes: the returned data frame
    * keeps sub-threshold values inline, nulls out externalized ones and
    * records their digest in `refCol`; the blob delta holds one
    * (`refCol`, payload) row per DISTINCT oversized payload (content
    * addressing — identical payloads store once, and an upsert carrying
    * an already-stored payload is a no-op append that [[gc]] dedups).
    * Map-only on the data side; the delta pays one shuffle on the
    * digest, payloads ride once.
    */
  def externalizeText(df: DataFrame, field: String, refCol: String,
      threshold: Int): (DataFrame, DataFrame) = {
    val oversized = octet_length(col(field)) >= threshold
    // stage the digest ONCE: both the data-side ref and the delta's
    // group key derive from the same `_lob_digest` column, so each
    // payload is hashed a single time per plan regardless of whether
    // Catalyst CSEs the two uses
    val staged = df.withColumn("_lob_digest", when(oversized, digest(col(field))))
    val data = staged
      .withColumn(refCol, col("_lob_digest"))
      .withColumn(field, when(oversized, lit(null).cast("string"))
        .otherwise(col(field)))
      .drop("_lob_digest")
    // the delta lands under CANONICAL names (`_lob_ref`, `_lob_payload`)
    // so one content-addressed store serves every TEXT field of the
    // collection — digests are content hashes, field identity is
    // irrelevant to storage
    val delta = staged
      .filter(oversized)
      .select(col("_lob_digest").as("_lob_ref"), col(field).as("_lob_payload"))
      .groupBy(col("_lob_ref"))
      .agg(first(col("_lob_payload")).as("_lob_payload"))
    (data, delta)
  }

  /** Re-attach externalized TEXT payloads (the read path): a left join
    * on the digest — inline rows carry a null ref and fall through the
    * coalesce untouched; only LOB-backed rows pick the store's payload.
    * The ref column leaves the view here, so a resolved read is
    * column-identical to an all-inline collection.
    */
  def resolveText(data: DataFrame, blobs: DataFrame, field: String,
      refCol: String): DataFrame = {
    // rename BY NAME (the store's canonical schema), never by position —
    // a reordered snapshot would otherwise silently join on the payload
    val store = blobs
      .withColumnRenamed("_lob_ref", refCol)
      .withColumnRenamed("_lob_payload", s"_lob_payload_$field")
    data.join(store, Seq(refCol), "left")
      .withColumn(field, coalesce(col(field), col(s"_lob_payload_$field")))
      .drop(refCol, s"_lob_payload_$field")
  }

  /** [[resolveText]] with a LOUD dangling-ref contract: a row whose
    * non-null ref finds no payload RAISES instead of coalescing to
    * null. The read path wants the lenient join (a just-GC'd blob
    * behind an in-flight plan is indistinguishable from inline-null);
    * feed consumers (CDC re-seed, audit, downstream ETL) must not be
    * handed silently-nulled historical payloads — after [[gc]] collects
    * a superseded payload, the raw feed can no longer reproduce it, and
    * the only safe recovery is a snapshot re-seed.
    */
  def resolveTextStrict(data: DataFrame, blobs: DataFrame, field: String,
      refCol: String, context: String): DataFrame = {
    val store = blobs
      .withColumnRenamed("_lob_ref", refCol)
      .withColumnRenamed("_lob_payload", s"_lob_payload_$field")
    data.join(store, Seq(refCol), "left")
      .withColumn(field,
        when(col(refCol).isNotNull && col(s"_lob_payload_$field").isNull,
          raise_error(concat(
            lit(s"$context: LOB payload for '$field' ref "), col(refCol),
            lit(" no longer exists (superseded or deleted, then garbage-" +
              "collected) — the raw change feed cannot reproduce it; " +
              "re-seed from a snapshot instead"))))
          .otherwise(coalesce(col(field), col(s"_lob_payload_$field"))))
      .drop(refCol, s"_lob_payload_$field")
  }
}
