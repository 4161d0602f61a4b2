package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{SrpFunctions, TextFunctions, VectorFunctions}

/** Large-scale corpus deduplication operators — the training-data
  * pipeline counterpart of the reference's MinHash/MHJACCARD support
  * (reference: internal/util/function/minhash_function.go, metric
  * MHJACCARD pkg/util/metric/metric_type.go:35, index MINHASH_LSH
  * internal/core/src/minhash/).
  *
  * Scale design notes:
  *  - exact/fingerprint dedup: one hash-shuffle on a short digest key —
  *    the canonical 100 TB dedup shape (map-side partial agg first).
  *  - near-dup families (MinHash, SimHash, SRP/cosine) all share one
  *    shape: per-row signature → explode to (band, key) → equi-join
  *    buckets → verify candidates exactly. No O(n²) pass ever runs on
  *    the full corpus; the quadratic verify steps take an explicit
  *    candidate-pair input (or a hard row cap) by API shape.
  *  - hot buckets (empty docs, boilerplate) are salted into sub-buckets
  *    above `bucketCap`, bounding any single join task; a true near-dup
  *    pair inside a salted bucket still collides in its other bands.
  */
object Dedup {

  /** Spread a DataFrame across the cluster's cores when its source gave
    * it too few partitions (a single small parquet row group = one task,
    * which serializes the expensive per-row signature expressions). A
    * no-op at real scale where inputs already have many partitions — the
    * shuffle only triggers when the input is narrower than the cluster.
    */
  // estimate the scan's task count from plan statistics (bytes /
  // max split size) — materializing `df.rdd` just to read its
  // partition count would force an RDD lineage per call. Inflated
  // logical estimates only make the (cheap, small-input) repartition
  // less likely; large inputs estimate far above target and skip it.
  // Shared engine-wide since r17 as [[graft.GraftSession.spread]].
  private[operators] def parallelize(df: DataFrame): DataFrame =
    graft.GraftSession.spread(df)

  // ------------------------------------------------------------------
  // exact / fingerprint dedup
  // ------------------------------------------------------------------

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

  // ------------------------------------------------------------------
  // shared banded-LSH machinery
  // ------------------------------------------------------------------

  /** Distinct candidate pairs from an exploded (band_idx, band_hash, id)
    * table — the bucket equi-join at the heart of every LSH variant.
    *
    * Hot-bucket mitigation: a degenerate band key (empty docs, template
    * boilerplate) would otherwise make one bucket quadratic and one
    * straggler task at scale, so buckets larger than `bucketCap` are
    * salted into ⌈size/bucketCap⌉ sub-buckets by id hash. This bounds
    * each join task at ~bucketCap² pair candidates. Pairs split across
    * sub-buckets are only lost if they ALSO miss in every other band —
    * for a pair colliding in m bands the residual miss probability is
    * ∏(1−1/sᵢ) ≈ (1−1/s)^m, negligible for true near-duplicates (which
    * collide in most bands). Sizing the cap above the largest expected
    * legitimate duplicate class keeps exact-oracle workloads untouched.
    */
  private[operators] def bandedPairs(
      banded: DataFrame, idCol: String, bucketCap: Int): DataFrame = {
    require(bucketCap > 1, s"bucketCap must be > 1, got $bucketCap")
    // banded feeds three consumers (bucket sizes + both join sides);
    // its lineage includes the per-row signature pass over the raw
    // corpus, so cache the (small, ids-only) exploded table instead of
    // recomputing signatures three times
    val bandedP = banded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only buckets ABOVE the cap need salting, and those are rare by
    // construction (≤ rows·bands/bucketCap of them, each a degenerate
    // band hash), so join the banded table against the hot buckets only:
    // AQE broadcasts the (tiny) hot set and the banded table never
    // re-shuffles — vs a full sizes equi-join, which would move every
    // (band, id) row a second time just to attach a count that is ≤ cap
    // for almost all of them. Salt is PER BAND (hash of band_idx + id):
    // two ids split apart in one hot band can still meet in another, so
    // identical-doc recall under salting is 1 − (1−1/s)^hotBands rather
    // than hard loss.
    val hot = bandedP.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("_sz"))
      .filter(col("_sz") > bucketCap)
    val salted = bandedP.join(hot, Seq("band_idx", "band_hash"), "left")
      .withColumn("_salt",
        when(col("_sz").isNotNull,
          pmod(xxhash64(col("band_idx"), col(idCol)),
            ceil(col("_sz").cast("double") / bucketCap).cast(LongType)))
          .otherwise(lit(0L)))
      .select(col("band_idx"), col("band_hash"), col("_salt"), col(idCol))
    val a = salted.withColumnRenamed(idCol, "id_a")
    val b = salted.withColumnRenamed(idCol, "id_b")
    // dedup candidate pairs FIRST (near-dups collide in many bands — up
    // to `bands`× repeated pairs), then verify once per pair
    a.join(b, Seq("band_idx", "band_hash", "_salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Hot-bucket diagnostic: (band_idx, band_hash, size) of buckets above
    * `bucketCap` — what `bandedPairs` salted. Intended for logging what
    * a production run mitigated (boilerplate detection falls out too).
    */
  def hotBuckets(banded: DataFrame, bucketCap: Int): DataFrame =
    banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("size"))
      .filter(col("size") > bucketCap)

  // ------------------------------------------------------------------
  // MinHash-LSH (token-shingle Jaccard)
  // ------------------------------------------------------------------

  /** MinHash signatures: (id, sig array<long>) from word `shingleSize`-
    * grams hashed `numHashes` ways.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame =
    df.select(col(idCol), TextFunctions.minhashSignature(
      TextFunctions.tokenize(col(textCol)), numHashes, shingleSize).as("sig"))

  /** LSH candidate pairs: ids sharing ≥1 of `bands` bands, with their
    * estimated (minhash) Jaccard — pairs with est ≥ `threshold` kept.
    * Output: (id_a, id_b, est_jaccard), id_a < id_b. Probabilistic (the
    * estimate is signature agreement); see [[minhashNearDupPairs]] for
    * the exactly-verified variant.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.5, bucketCap: Int = 20000): DataFrame = {
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

    bandedPairs(banded, idCol, bucketCap)
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextFunctions.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Near-duplicate pairs by EXACT shingle-set Jaccard ≥ `threshold`,
    * found via MinHash-LSH candidate generation + exact verification —
    * the production dedup shape (bucketed candidates, quadratic work
    * only inside candidate pairs) whose output is deterministic and
    * engine-agnostic: banding only has to *find* each qualifying pair
    * once, and with r = numHashes/bands rows per band the miss
    * probability at J = `threshold` is (1 − J^r)^bands — defaults give
    * (1 − 0.8³)^21 ≈ 3·10⁻⁷ per pair (reference analogue:
    * minhash_function.go signatures + core/src/minhash/ LSH index).
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 63, bands: Int = 21,
      shingleSize: Int = 3, bucketCap: Int = 20000,
      roundTo: Option[Int] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val base = parallelize(df)
    // ONE pass over the raw text: tokenize → shingle → distinct set,
    // persisted. Signatures derive from the SET (shingleSize=1 hashes
    // each shingle string as-is): per-seed minima over distinct shingles
    // equal minima over all shingle occurrences, so this is bit-identical
    // to signing the token stream directly — but the expensive
    // tokenize+shingle work is not repeated for the verify-side sets.
    val sets = base.select(col(idCol), TextFunctions.shingleSet(
      TextFunctions.tokenize(col(textCol)), shingleSize).as("_set"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sets.select(col(idCol),
      TextFunctions.minhashSignature(col("_set"), numHashes, 1).as("sig"))
    val banded = sigs.select(
      col(idCol),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b), array_join(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), ","))
      }: _*)).as(Seq("band_idx", "band_hash")))
    jaccardVerify(bandedPairs(banded, idCol, bucketCap), sets, idCol, "_set",
      threshold, roundTo)
  }

  /** Winnowing-fingerprint near-dup pairs (the MOSS shape): docs
    * sharing rolling-hash fingerprints (see
    * [[graft.functions.WinnowFingerprint]]) are paired through a
    * fingerprint-bucket join, scored by overlap = |shared| / min(|A|,|B|)
    * — a containment measure robust to truncation/extension, which
    * minhash-Jaccard under-scores.
    *
    * Scale shape: explode to (fp, id) — each fingerprint IS the bucket
    * key, like an LSH band hash. Fingerprints appearing in more than
    * `maxDocFreq` docs are dropped before the self-join (MOSS's
    * boilerplate mitigation — an fp shared by half the corpus carries no
    * dedup signal but would make one bucket quadratic); overlap is then
    * measured against the FILTERED fingerprint sets on both sides, so
    * the ratio stays internally consistent. Everything is equi-joins and
    * partial+final counts on the fp / pair keys; candidate pairs — not
    * the corpus — bound the quadratic term.
    *
    * Output: (id_a, id_b, shared, overlap), overlap rounded to 4dp.
    */
  def winnowNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      minOverlap: Double = 0.5, k: Int = 5, w: Int = 4,
      maxDocFreq: Long = 1000L): DataFrame = {
    val base = parallelize(df)
    val fps = base.select(col(idCol).as("id"),
        explode(TextFunctions.winnowFingerprints(col(textCol), k, w)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDocFreq).select(col("fp"))
    val filtered = fps.join(rare, "fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("nfp"))
    val a = filtered.select(col("fp"), col("id").as("id_a"))
    val b = filtered.select(col("fp"), col("id").as("id_b"))
    val shared = a.join(b, "fp").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("nfp").as("_na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nfp").as("_nb")), "id_b")
      .withColumn("overlap",
        round(col("shared") / least(col("_na"), col("_nb")), 4))
      .filter(col("shared") / least(col("_na"), col("_nb")) >= minOverlap)
      .select(col("id_a"), col("id_b"), col("shared"), col("overlap"))
  }

  /** Exact set-Jaccard verification of candidate pairs: joins each
    * (id_a, id_b) to its sets and keeps pairs with J ≥ `threshold`.
    * Quadratic work is bounded by the candidate count BY API SHAPE —
    * there is no full-corpus variant without a row cap.
    *
    * Output: (id_a, id_b, jaccard).
    */
  def jaccardVerify(candidates: DataFrame, sets: DataFrame, idCol: String,
      setCol: String, threshold: Double, roundTo: Option[Int] = None): DataFrame = {
    val j = TextFunctions.jaccard(col("_set_a"), col("_set_b"))
    val jr = roundTo.map(d => round(j, d)).getOrElse(j)
    candidates
      .join(sets.select(col(idCol).as("id_a"), col(setCol).as("_set_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col(setCol).as("_set_b")), "id_b")
      .select(col("id_a"), col("id_b"), jr.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components of an undirected (id_a, id_b) pair graph by
    * iterative min-label propagation: every node's label converges to
    * the minimum id reachable from it. Near-dup clusters are short
    * chains/stars, so convergence is a handful of iterations; each
    * iteration is one hash-agg + one join, both partial+final (the
    * standard large-graph CC shape — no driver-side graph).
    *
    * Output: (id, component) for every id appearing in `pairs`.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
      localEdgeCap: Long = 4_000_000L): DataFrame = {
    // persist BEFORE the symmetric union: its two branches would
    // otherwise each recompute the (expensive — typically an LSH
    // pipeline) pair lineage inside the union job
    val p = pairs.select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the duplicate graph is the DUP subset of the corpus — usually
    // orders of magnitude smaller than the data. Below the cap, a
    // driver-local union-find (milliseconds) replaces 2-4 iterative
    // join/agg rounds; above it, the distributed label propagation
    // runs. The count() FILLS p's cache, so the local path's collect is
    // a cache read — the (expensive, typically LSH) pair lineage
    // computes exactly once either way; an over-cap graph pays only the
    // count, never a driver-sized transfer.
    if (p.count() <= localEdgeCap) {
      val local = ccLocal(p.collect(), p.schema("id_a").dataType, p.sparkSession)
      p.unpersist()
      return local
    }
    val edges = p
      .unionByName(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("id_a"))
      .agg(min(col("id_b")).as("_minNbr"))
      .select(col("id_a").as("id"),
        least(col("id_a"), col("_minNbr")).as("component"))
    var persisted: DataFrame = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor's current label, min over neighbors ∪ self
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "id_b"), "id_b")
        .select(col("id_a").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // converged when no label changed this round (also materializes
      // `next`, making it safe to drop the previous iteration's cache)
      converged = next.join(labels.withColumnRenamed("component", "_prev"), "id")
        .filter(col("component") =!= col("_prev"))
        .isEmpty
      if (persisted != null) persisted.unpersist()
      persisted = next
      labels = next
      iter += 1
    }
    // min-label propagation advances one hop per round, so a component
    // whose diameter exceeds maxIter would otherwise return with NON-
    // minimal labels — i.e. silently split clusters and under-dedup.
    // Fail loudly instead: the caller raises maxIter (diameter-of-dup-
    // chain rounds) or pre-thins the pair graph.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations — " +
        "a duplicate chain is longer than maxIter hops; raise maxIter")
    // labels is persisted + materialized (by the convergence check), so
    // the edge caches behind it are dead weight
    edges.unpersist()
    p.unpersist()
    labels
  }

  /** Driver-local union-find with path compression over an already-
    * collected (bounded) edge list; labels normalized to the min id per
    * component. Handles both PK domains of the reference (int64 AND
    * varchar — Types.h:113) by unioning toward the type's natural
    * minimum.
    */
  private def ccLocal(edges: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val lt: (Any, Any) => Boolean = idType match {
      case LongType    => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case IntegerType => (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
      case StringType  => (a, b) => a.asInstanceOf[String] < b.asInstanceOf[String]
      case other => throw new IllegalArgumentException(
        s"connectedComponents: unsupported id type $other (int or string PKs)")
    }
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach(id =>
      out += org.apache.spark.sql.Row(id, find(id)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("id", idType), StructField("component", idType))))
  }

  /** Corpus minus near-duplicates: one representative (min id) survives
    * per near-dup cluster — the end-to-end operator a training-data
    * pipeline runs (pairs → components → filter), all bucketed joins.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 63, bands: Int = 21,
      shingleSize: Int = 3): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, threshold, numHashes,
      bands, shingleSize)
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component")) // keep the min id of each cluster
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** All-pairs exact token-set Jaccard over a SMALL table — verify-only
    * (ground truth for recall tests / bounded subsets). Guarded: refuses
    * inputs above `maxRows` rather than silently going quadratic.
    */
  def jaccardPairsExhaustive(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxRows: Int = 10000): DataFrame = {
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"jaccardPairsExhaustive is O(n²) verify-only: input exceeds maxRows=$maxRows; " +
        "use minhashNearDupPairs for corpus-scale near-dup search")
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

  // ------------------------------------------------------------------
  // SimHash (hamming near-dup)
  // ------------------------------------------------------------------

  /** masks(i) = 1L << i (shift builtins need literal amounts). */
  private val BitMasks64 = typedlit(Seq.tabulate(64)(1L << _))

  /** 64-bit SimHash of the token stream: per-token xxhash64, bitwise
    * majority vote (frequency-weighted). Pure DataFrame math (no UDF):
    * for each of 64 bits, sum ±1 across tokens and take the sign.
    *
    * Single pass: token hashes are computed once and folded into a
    * 64-element vote accumulator (64 separate `aggregate` subtrees would
    * re-tokenize and re-hash per bit — a 64× blowup at sf0.1).
    * Engine-local (xxhash64 seeds); see [[simhash60]] for the portable
    * variant whose output is reproducible outside Spark.
    */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, BitMasks64, (v, m) =>
        v + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, BitMasks64, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L),
      (acc, w) => acc.bitwiseOR(w))
  }

  /** Portable 60-bit SimHash over DISTINCT tokens: per-token hash = the
    * first 15 hex chars of md5 (60 bits, via base-16 `conv`), bit j of
    * the signature = sign of the ±1 vote sum. Engine-agnostic by
    * construction — md5 and hex→int are computed identically by any SQL
    * engine, so near-dup results can be oracle-checked end to end
    * (xxhash64 seeds are Spark-internal). Set semantics (distinct
    * tokens) rather than frequency-weighted votes, by design.
    *
    * Computed by the fused codegen'd [[graft.functions.SimHash60]]
    * expression (one pass, primitive vote accumulator) — bit-identical
    * to the declarative md5/conv formula above.
    */
  def simhash60(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SimHash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  /** Hamming distance between two packed signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxDist over the portable
    * 60-bit signature, found via pigeonhole banding: the signature is
    * split into maxDist+1 chunks, and any pair within distance maxDist
    * must agree exactly on ≥1 chunk — so recall is EXACT (deterministic
    * output), unlike probabilistic minhash banding. Bucket join, no
    * cross join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, bucketCap: Int = 20000): DataFrame = {
    require(maxDist >= 0 && maxDist < 60, s"maxDist must be in [0,60), got $maxDist")
    val chunks = maxDist + 1
    // chunk widths as equal as possible; pigeonhole only needs >maxDist
    // disjoint chunks covering all 60 bits, not equal widths
    val widths = Array.tabulate(chunks)(c => 60 / chunks + (if (c < 60 % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    // persisted for the same three-consumer reason as minhashLshPairs
    val sigs = parallelize(df).select(col(idCol),
        simhash60(TextFunctions.tokenize(col(textCol))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col(idCol),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("sim"), offsets(c)).bitwiseAND(lit((1L << widths(c)) - 1))
      }: _*)).as(Seq("band_idx", "band_hash")))
    bandedPairs(banded, idCol, bucketCap)
      .join(sigs.select(col(idCol).as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sim").as("sim_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------------------
  // embedding (cosine) near-dup
  // ------------------------------------------------------------------

  /** Embedding near-duplicate pairs: cosine ≥ threshold, via SRP-LSH
    * (signed-random-projection sign bits, banded like minhash) +
    * exact cosine verification within buckets — the scale path: the
    * corpus is scanned once for signatures (codegen'd [[SrpBands]]),
    * bucket joins ship ids only, and the only pairwise cosine work is
    * on candidates. Miss probability per qualifying pair is
    * (1 − p^r)^bands with p = 1 − θ/π; defaults (384 planes, r=12,
    * b=32) give ~4·10⁻⁹ at cosine 0.98.
    *
    * Output: (id_a, id_b, cosine), id_a < id_b.
    */
  def srpNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 384, rowsPerBand: Int = 12,
      seed: Long = 42L, bucketCap: Int = 20000,
      roundTo: Option[Int] = None): DataFrame = {
    require(numPlanes % rowsPerBand == 0, "rowsPerBand must divide numPlanes")
    val dim = df.select(size(col(vecCol)).as("d")).limit(1).head.getInt(0)
    val planes = SrpFunctions.gaussianPlanes(numPlanes, dim, seed)
    val base = parallelize(df)
    val vecs = base.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = vecs.select(col(idCol),
      posexplode(SrpFunctions.srpBands(col(vecCol), planes, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    cosineVerify(bandedPairs(banded, idCol, bucketCap), vecs, idCol, vecCol,
      threshold, roundTo)
  }

  /** Exact cosine verification of candidate pairs (bounded by the
    * candidate count by API shape). Output: (id_a, id_b, cosine).
    */
  def cosineVerify(candidates: DataFrame, vecs: DataFrame, idCol: String,
      vecCol: String, threshold: Double, roundTo: Option[Int] = None): DataFrame = {
    val c = VectorFunctions.cosine(col("_vec_a"), col("_vec_b"))
    val cr = roundTo.map(d => round(c, d)).getOrElse(c)
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("_vec_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("_vec_b")), "id_b")
      .select(col("id_a"), col("id_b"), cr.as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** All-pairs exact cosine over a SMALL table — verify-only ground
    * truth. Guarded: refuses inputs above `maxRows` rather than silently
    * going quadratic; use [[srpNearDupPairs]] at corpus scale.
    */
  def embeddingCosinePairsExhaustive(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxRows: Int = 10000): DataFrame = {
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"embeddingCosinePairsExhaustive is O(n²) verify-only: input exceeds maxRows=$maxRows; " +
        "use srpNearDupPairs for corpus-scale near-dup search")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("vec_a"), col("vec_b")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---- benchmark decontamination ----

  /** Corpus documents contaminated by an evaluation benchmark: docs
    * sharing at least one `n`-token shingle with any benchmark item
    * (the standard pretraining decontamination rule — n-gram overlap
    * against the eval set).
    *
    * Returns (id, n_hits = distinct overlapping shingles). Scale shape:
    * the benchmark side is tiny relative to the corpus (eval suites are
    * thousands of items), so its DISTINCT shingle set is built once and
    * the corpus's exploded shingles semi-join it — ids-only shuffle, no
    * corpus self-join, and AQE broadcasts the benchmark side. The
    * corpus's shingle explode is the same map-only pass the minhash
    * signatures use.
    */
  def contaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 5): DataFrame = {
    def shingleSet(c: Column) =
      TextFunctions.shingleSet(TextFunctions.tokenize(c), n)
    val benchShingles = benchmark
      .select(explode(shingleSet(col(benchTextCol))).as("_sh"))
      .distinct()
    corpus
      .select(col(idCol), explode(shingleSet(col(textCol))).as("_sh"))
      .join(benchShingles, Seq("_sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Drop contaminated docs from the corpus (the decontamination pass). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 5): DataFrame =
    corpus.join(
      contaminated(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
