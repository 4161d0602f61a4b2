package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{TextFunctions, VectorFunctions}

/** Large-scale corpus deduplication operators — the training-data
  * pipeline counterpart of the reference's MinHash/MHJACCARD support
  * (reference: internal/util/function/minhash_function.go, metric
  * MHJACCARD pkg/util/metric/metric_type.go:35, index MINHASH_LSH
  * internal/core/src/minhash/).
  *
  * Scale design notes:
  *  - exact/fingerprint dedup: one hash-shuffle on a short digest key —
  *    the canonical 100 TB dedup shape (map-side partial agg first).
  *  - MinHash LSH: band signatures → `groupBy(band_hash)` bucket join.
  *    Bucket sizes are bounded by banding; no O(n²) cross join ever
  *    materializes. Candidate verification re-checks estimated Jaccard.
  *  - SimHash: 64-bit signatures, near-dup = hamming distance ≤ t via
  *    pigeonhole banding on 16-bit chunks.
  *  - embedding dedup: cosine ≥ τ pairs via the same LSH idea on random
  *    hyperplane signs (SRP) — brute-force variant for exactness.
  */
object Dedup {

  /** Spread a DataFrame across the cluster's cores when its source gave
    * it too few partitions (a single small parquet row group = one task,
    * which serializes the expensive per-row signature expressions). A
    * no-op at real scale where inputs already have many partitions — the
    * shuffle only triggers when the input is narrower than the cluster.
    */
  private def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // estimate the scan's task count from plan statistics (bytes /
    // max split size) — materializing `df.rdd` just to read its
    // partition count would force an RDD lineage per call. Inflated
    // logical estimates only make the (cheap, small-input) repartition
    // less likely; large inputs estimate far above `target` and skip it.
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val estParts = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit
    if (estParts < target) df.repartition(target) else df
  }

  /** Exact duplicate groups by raw text equality (hash-groupBy, never a
    * self-join). Returns (key, cnt, ids) for groups with >1 member.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("dup_key"))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("cnt") > 1)

  /** Whitespace/punctuation/case-invariant duplicate groups
    * (normalized-token fingerprint).
    */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("dup_key"))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("cnt") > 1)

  /** Keep one representative (min id) per exact-duplicate class. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.withColumn("_fp", TextFunctions.fingerprint(col(textCol)))
    val keep = keyed.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    keyed.join(keep, Seq("_fp", idCol), "left_semi").drop("_fp")
  }

  /** MinHash signatures: (id, sig array<long>) from word `shingleSize`-
    * grams hashed `numHashes` ways.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame = {
    val sh = TextFunctions.shingles(TextFunctions.tokenize(col(textCol)), shingleSize)
    df.select(col(idCol), TextFunctions.minhash(sh, numHashes).as("sig"))
  }

  /** LSH candidate pairs: ids sharing ≥1 of `bands` bands, with their
    * estimated (minhash) Jaccard — pairs with est ≥ `threshold` kept.
    * Output: (id_a, id_b, est_jaccard), id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // signatures feed three consumers (banding + both pair-join sides);
    // computing them is the expensive pass over the raw text, so persist
    // the (small) signature table instead of re-deriving it per consumer
    val sigs = minhashSignatures(parallelize(df), idCol, textCol, numHashes, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // explode to (band_idx, band_hash, id) — ids only, so the bucket
    // self-join shuffles 3 small columns, never the 64-long signatures
    val banded = sigs.select(
      col(idCol),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b), array_join(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), ","))
      }: _*)).as(Seq("band_idx", "band_hash")))

    val a = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    // dedup candidate pairs FIRST (near-dups collide in many bands — up
    // to `bands`× repeated pairs), then fetch signatures once per pair
    val pairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextFunctions.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram-token Jaccard similar pairs (quadratic verify step —
    * use only on LSH candidates or bounded subsets).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = df.select(col(idCol),
      array_distinct(TextFunctions.tokenize(col(textCol))).as("toks"))
    val a = toks.select(col(idCol).as("id_a"), col("toks").as("toks_a"))
    val b = toks.select(col(idCol).as("id_b"), col("toks").as("toks_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextFunctions.jaccard(col("toks_a"), col("toks_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token stream: per-token xxhash64, bitwise
    * majority vote. Pure DataFrame math (no UDF): for each of 64 bits,
    * sum ±1 across tokens and take the sign.
    *
    * Single pass: token hashes are computed once and folded into a
    * 64-element vote accumulator (64 separate `aggregate` subtrees would
    * re-tokenize and re-hash per bit — a 64× blowup at sf0.1).
    */
  /** masks(i) = 1L << i (shift builtins need literal amounts). */
  private val BitMasks = typedlit(Seq.tabulate(64)(1L << _))

  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, BitMasks, (v, m) =>
        v + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, BitMasks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L),
      (acc, w) => acc.bitwiseOR(w))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxDist, found via pigeonhole
    * banding (4×16-bit chunks: any pair within distance 3 shares ≥1 exact
    * chunk) — bucket join, no cross join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    // persisted for the same three-consumer reason as minhashLshPairs
    val sigs = parallelize(df).select(col(idCol),
        simhash(TextFunctions.tokenize(col(textCol))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col(idCol),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("chunk_idx", "chunk")))
    val a = banded.select(col("chunk_idx"), col("chunk"), col(idCol).as("id_a"))
    val b = banded.select(col("chunk_idx"), col("chunk"), col(idCol).as("id_b"))
    val pairs = a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sim").as("sim_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Brute-force
    * variant (exact); callers at scale should pre-bucket with
    * [[IvfIndex]] or SRP-LSH and verify within buckets.
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("vec_a"), col("vec_b")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
