package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data mixing for training-corpus assembly — not a reference operator
  * (the reference stops at random_sample), but the standard pretraining
  * step downstream of its dedup/quality passes: re-weight strata
  * (language, source, quality bucket) by DETERMINISTIC per-stratum
  * subsampling, so the mix is reproducible run-to-run and auditable
  * row-by-row (the same arithmetic-hash trick as q_sample_mod — no RNG,
  * no seed state, any engine can recompute membership).
  *
  * Scale shape: a pure narrow filter — no shuffle, no sampleBy() RNG
  * per partition, pushdown-friendly; the per-stratum rate lookup is a
  * CASE expression, not a join.
  */
object Mixing {

  /** Membership hash in [0, 100): uniform-ish, engine-agnostic
    * (multiplicative hash mod a prime — reproducible in plain SQL).
    * The id is reduced mod the prime BEFORE the multiply so the product
    * stays ≤ ~2.6e18 < Long.Max for ANY id — Spark 4's ANSI mode throws
    * on silent Long overflow, which an unreduced multiply would hit on
    * large synthetic ids.
    */
  def pctHash(idCol: Column): Column =
    pmod(pmod(pmod(idCol, lit(1000000007L)) * lit(2654435761L), lit(1000000007L)), lit(100))

  /** Membership hash in [0, 1e6): the pctHash scheme at ppm granularity
    * for rates too fine for whole percentages (temperature mixing).
    */
  def ppmHash(idCol: Column): Column =
    pmod(pmod(pmod(idCol, lit(1000000007L)) * lit(2654435761L), lit(1000000007L)),
      lit(1000000L))

  /** Temperature-based source mixing (the multilingual-pretraining
    * sampler — XLM §3.1 / mT5 §3.2 style): source i with n_i rows is
    * sampled with probability p_i ∝ n_i^alpha, alpha ∈ (0,1] flattening
    * the source distribution (alpha=1 keeps natural proportions,
    * alpha→0 approaches uniform over sources), then the expected output
    * is `targetRows` total. Per-source keep rate
    * r_i = min(1, targetRows·p_i / n_i), applied as the same
    * deterministic id-hash membership as [[stratifiedSample]] — no RNG,
    * reproducible in plain SQL.
    *
    * Scale shape: ONE count aggregate over the corpus (source
    * cardinality is tiny — languages/domains), then a narrow CASE+hash
    * filter; the rate table rides the driver, never a join.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetRows > 0, "targetRows must be positive")
    // strata key by STRING VALUE of the source (any input type works);
    // a NULL source is its own stratum — it gets a rate like any other
    // instead of silently inheriting the rate-0 CASE default
    val src = col(sourceCol).cast("string")
    val counts: Array[(Option[String], Long)] =
      df.groupBy(src.as("_src")).count()
        .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
    require(counts.nonEmpty, "temperatureMix over an empty corpus")
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val ratePpm: Map[Option[String], Long] = counts.map { case (s, n) =>
      val p = math.pow(n.toDouble, alpha) / z
      s -> math.min(1e6, math.floor(targetRows * p / n * 1e6)).toLong
    }.toMap
    val rate = ratePpm.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      val cond = k.map(s => src === lit(s)).getOrElse(src.isNull)
      when(cond, lit(v)).otherwise(acc)
    }
    df.filter(ppmHash(col(idCol)) < rate)
  }

  /** Keep each row of stratum s with probability rates(s)/100
    * (default `defaultPct` for unlisted strata), deterministically in
    * the row's id.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pctHash(col(idCol)) < rate)
  }

  /** Context-window sequence packing: assign documents to training packs
    * of at most `budget` tokens by deterministic greedy fill — the
    * standard pretraining batcher step (docs concatenated until the
    * window is full, then a new pack starts; an oversized doc occupies
    * its own pack).
    *
    * Determinism + scale: docs are sharded by `idCol % shards` and each
    * shard packs INDEPENDENTLY in ascending id order — the sequential
    * dependency of greedy packing is confined to a shard, so shards pack
    * in parallel and the result is a pure function of (ids, token
    * counts, budget, shards), reproducible in plain SQL. Pack ids are
    * (shard, pack_idx). Packing quality is within ~1 doc of
    * global-sequential greedy per shard; corpus order carries no meaning
    * in a shuffled training set, so sharding loses nothing.
    *
    * Per-task memory is O(1): each shard STREAMS through
    * `flatMapSortedGroups` (the sort rides the shuffle's spillable
    * sorter), so a shard never materializes in a task — a 25B-doc
    * corpus cannot OOM a task regardless of the shard count. `shards`
    * therefore only sets parallelism; when omitted it scales with the
    * corpus via [[autoShards]] (the Vamana numParts pattern) so the
    * walk stays parallel at any scale without the caller tuning it.
    *
    * Output: (id, shard, pack_idx) — one row per input doc.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int = AutoShards): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards >= 0, s"shards must be positive (or AutoShards=0), got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
    // auto mode pays one columnar count() of the (already pruned) input
    // — cheap next to the pack shuffle it sizes
    val nShards = if (shards > 0) shards else autoShards(slim.count())
    slim.as[(Long, Long)]
      .groupByKey { case (id, _) => ((id % nShards) + nShards) % nShards }
      .flatMapSortedGroups(col(idCol)) { (shard: Long, rows: Iterator[(Long, Long)]) =>
        var pack = 0L
        var acc = 0L
        var first = true
        rows.map { case (id, tokens) =>
          if (first) { acc = tokens; first = false }
          else if (acc + tokens > budget) { pack += 1L; acc = tokens }
          else acc += tokens
          (id, shard, pack)
        }
      }
      .toDF(idCol, "shard", "pack_idx")
  }

  /** Sentinel for [[packSequences]]: pick the shard count from the
    * corpus size.
    */
  val AutoShards = 0

  /** One shard per ~8M docs, floor 64: at sf0.1 (60k docs) the floor
    * keeps every core busy; at 25B docs (the 100 TB shape) this yields
    * ~3k shards, so the per-shard sequential walk stays a minutes-scale
    * task instead of one giant serial pass. Memory never constrains the
    * choice — shards stream (see [[packSequences]]).
    */
  def autoShards(nDocs: Long): Int =
    math.min(1 << 20, math.max(64L, nDocs / 8000000L + 1L)).toInt
}
