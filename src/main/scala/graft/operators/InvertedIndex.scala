package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar index builds as batch jobs producing queryable index tables
  * (reference: index types in internal/util/indexparamcheck/
  * index_type.go — INVERTED (tantivy InvertedIndexTantivy.cpp), BITMAP
  * (BitmapIndex.cpp), NGRAM (NgramInvertedIndex.cpp)).
  *
  * Spark-first: an "index" is a second table keyed by the indexed value
  * — `explode + groupBy(value) + collect_list(rowid)` — written sorted
  * by key so point/range lookups prune to a few row groups. Lookups
  * join the (tiny) matched posting lists back to the base table by pk —
  * a broadcast join, never a shuffle of the base.
  */
object InvertedIndex {

  /** Inverted index over a token-array column: (term, df, postings).
    * `collect_set` dedups (id, term) pairs inside the partial aggregate,
    * so the build is ONE shuffle (the old `distinct()+groupBy` shape was
    * two full shuffles of the exploded pairs).
    *
    * CAUTION at scale: a frequent term's postings land in ONE
    * aggregation-buffer row — fine for bounded-cardinality values
    * ([[buildValueIndex]], the bitmap analogue), hazardous for open text
    * at 100 TB. Prefer [[buildTokenPairs]] there.
    */
  def buildTokenIndex(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    df.select(col(idCol), explode(tokensCol).as("term"))
      .groupBy(col("term"))
      .agg(sort_array(collect_set(col(idCol))).as("postings"))
      .select(col("term"), size(col("postings")).cast("long").as("df"), col("postings"))

  /** Flat (term, id) pair index — the scale-safe text-index
    * representation: no per-term array buffer ever materializes, so a
    * boilerplate term appearing in billions of docs costs rows, not one
    * giant cell. `tokensCol` must be per-row distinct (wrap in
    * `array_distinct`) so (term, id) pairs are unique by construction.
    *
    * Probing needs NO aggregation of the full index: the term filter
    * prunes first (sorted-by-term storage ⇒ row-group pruning), and only
    * matching pairs reach the per-id counting shuffle.
    */
  def buildTokenPairs(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    df.select(col(idCol).as("id"), explode(tokensCol).as("term"))

  /** Persist a pair index sorted by term so lookups prune to the few
    * row groups covering their terms.
    */
  def writeTokenPairs(pairs: DataFrame, path: String, numPartitions: Int): Unit =
    pairs.repartitionByRange(numPartitions, col("term"))
      .sortWithinPartitions(col("term"), col("id"))
      .write.mode("overwrite").parquet(path)

  /** AND-semantics lookup on a pair index: ids containing ALL terms.
    * Only term-matching pairs shuffle; the count stays partial+final.
    */
  def lookupAllPairs(pairs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val distinctTerms = terms.distinct
    pairs
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === distinctTerms.size)
      .select(col("id"))
  }

  /** Bitmap-style index over a low-cardinality scalar column:
    * (value, cnt, postings). The sorted id list is the roaring-bitmap
    * stand-in; at scale, store as parquet sorted by `value`.
    */
  def buildValueIndex(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("postings"))

  /** Point lookup via a value (bitmap-style) index: ids of rows whose
    * indexed value is IN `values` — the reference's BITMAP index read
    * path (BitmapIndex.cpp In/range queries re-expressed as a pruned
    * index-table scan + posting explode). Postings of distinct values
    * are disjoint, so the union needs no dedup; at scale the index table
    * is stored sorted by value so the isin() prunes to a few row groups.
    */
  def lookupValues(index: DataFrame, valueCol: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "need at least one value")
    index
      .filter(col(valueCol).isin(values: _*))
      .select(explode(col("postings")).as("id"))
  }

  /** Positional postings: one row per (id, term) with the term's token
    * positions (reference: tantivy positional postings behind
    * PhraseMatch — index/TextMatchIndex.cpp stores positions so phrase
    * queries never rescan text). Positions per (doc, term) are bounded
    * by document length — no wide-row hazard. At scale, persist sorted
    * by term (same pruning argument as [[writeTokenPairs]]).
    */
  def buildPositionalIndex(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    df.select(col(idCol).as("id"), posexplode(tokensCol).as(Seq("pos", "term")))
      .groupBy(col("id"), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Index-accelerated exact phrase match (slop = 0): ids whose token
    * stream contains `terms` at consecutive positions. The scan touches
    * ONLY the query terms' postings (term filter prunes first); the
    * adjacency check is a per-candidate array fold, never a text rescan.
    * Sloppy phrases stay on the regex path ([[graft.expr.Calls]]) —
    * positional slop enumeration doesn't beat it until slop is large.
    */
  def phraseSearch(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    if (terms.distinct.size == 1 && terms.size == 1)
      return index.filter(col("term") === terms.head).select(col("id"))
    // per-candidate row: positions of each query term, in phrase order
    val matched = index.filter(col("term").isin(terms.distinct: _*))
    val byDoc = matched
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("positions"))))
        .as("_tp"))
      .filter(terms.distinct.map(t => map_contains_key(col("_tp"), lit(t)))
        .reduce(_ && _))
    // adjacency: ∃ p in positions(t0) such that ∀ i: p+i ∈ positions(ti)
    val anchor = element_at(col("_tp"), lit(terms.head))
    val ok = exists(anchor, p =>
      terms.zipWithIndex.tail.map { case (t, i) =>
        array_contains(element_at(col("_tp"), lit(t)), p + i)
      }.foldLeft(lit(true))(_ && _))
    byDoc.filter(ok).select(col("id"))
  }

  /** TRIE-style prefix lookup (reference: marisa-trie
    * index/StringIndexMarisa.cpp — prefix walks). On a value index table
    * stored sorted by value, `startsWith` is a contiguous key range, so
    * parquet min/max stats prune to the row groups covering the prefix.
    */
  def lookupPrefix(index: DataFrame, valueCol: String, prefix: String): DataFrame =
    index.filter(col(valueCol).startsWith(prefix))
      .select(explode(col("postings")).as("id"))

  /** STL_SORT-style range lookup (reference: index_type.go STL_SORT — a
    * sorted array binary-searched for range predicates). Same pruning
    * argument as [[lookupPrefix]]: a sorted index table turns the range
    * into a few row groups.
    */
  def lookupRange(index: DataFrame, valueCol: String, lo: Any, hi: Any): DataFrame =
    index.filter(col(valueCol) >= lit(lo) && col(valueCol) <= lit(hi))
      .select(explode(col("postings")).as("id"))

  /** Evaluate an ARBITRARY single-field filter expression over the
    * index DICTIONARY instead of the base table (reference: scalar
    * indexes run the predicate per distinct value over the dictionary
    * and union the matching postings — ScalarIndex Query/Range paths,
    * index/InvertedIndexTantivy.cpp). The expression compiles with the
    * SAME compiler the scan path uses, but touches cardinality-many
    * rows; NOT / arithmetic / IN all work because the dictionary holds
    * every live value, and a NULL dictionary entry fails the predicate
    * under 3VL exactly as its rows would on the scan.
    */
  def lookupExpr(index: DataFrame, valueCol: String, fieldName: String,
      filterExpr: String, jsonColumns: Set[String] = Set.empty): DataFrame = {
    val dict = index.withColumnRenamed(valueCol, fieldName)
    dict.filter(graft.expr.ExprCompiler.compile(filterExpr, dict, jsonColumns))
      .select(explode(col("postings")).as("id"))
  }

  /** Element index over a typed ARRAY field (reference: the array
    * element path of the inverted index, index/InvertedIndexTantivy.cpp
    * — every array element enters the dictionary, so `array_contains`
    * answers from postings; swept against the plain scan by
    * test_milvus_client_scalar_filtering.py:1479). (id, element) pairs
    * dedupe BEFORE posting-building: an id repeating an element must
    * not enter its postings list twice, or contains-all counting and
    * the consistency join would both overcount.
    */
  def buildElementIndex(df: DataFrame, idCol: String, arrCol: String): DataFrame =
    buildValueIndex(
      df.select(col(idCol), explode(col(arrCol)).as("element")).distinct(),
      idCol, "element")

  /** `array_contains(arr, v)` / `array_contains_any(arr, vs)` through
    * the element index: union of the values' postings. Distinct is
    * required — unlike a scalar value index, one id can sit under
    * SEVERAL of the probed element values.
    */
  def lookupElementsAny(index: DataFrame, values: Seq[Any]): DataFrame =
    lookupValues(index, "element", values).distinct()

  /** `array_contains_all(arr, vs)`: ids whose element set covers every
    * probed value. Postings are per-(distinct id, element), so a plain
    * count over the probed buckets IS the coverage count.
    */
  def lookupElementsAll(index: DataFrame, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "need at least one value")
    val vs = values.distinct
    index.filter(col("element").isin(vs: _*))
      .select(explode(col("postings")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === vs.size)
      .select(col("id"))
  }

  /** JSON-path index (reference: index/JsonFlatIndex.cpp + json_stats/):
    * a value index over one extracted JSON path, so path-equality
    * filters become index lookups instead of per-row JSON parsing.
    */
  def buildJsonPathIndex(df: DataFrame, idCol: String, jsonCol: String,
      path: String): DataFrame =
    buildValueIndex(
      df.withColumn("_jv", get_json_object(col(jsonCol), path)), idCol, "_jv")
      .withColumnRenamed("_jv", "value")

  /** Typed JSON-path index with index-type dispatch (reference MEP
    * 20260410-json_path_index_multi_type.md: JSON path indexes support
    * STL_SORT / BITMAP / HYBRID / AUTOINDEX beyond INVERTED, with a
    * `json_cast_type` — sort indexes serve ranges on numeric keys,
    * bitmaps serve equality/IN on low-cardinality keys, HYBRID picks by
    * cardinality like regular scalar columns). Rows where the path is
    * missing or fails the cast are EXCLUDED from the index, matching
    * the reference's per-type null handling; queries must treat
    * index-miss as no-match, not scan-fallback. Returns (chosenType,
    * (value, cnt, postings) index with `value` of `castType`).
    */
  def buildJsonPathIndexTyped(df: DataFrame, idCol: String, jsonCol: String,
      path: String, castType: org.apache.spark.sql.types.DataType,
      indexType: String = "AUTOINDEX",
      bitmapCardinalityCap: Long = 1000L): (String, DataFrame) = {
    val projected = df
      .select(col(idCol),
        get_json_object(col(jsonCol), path).try_cast(castType).as("value"))
      .filter(col("value").isNotNull)
    // ONE build regardless of the requested type: every resolved kind
    // shares the (value, cnt, postings) table shape, and kind resolution
    // reads cardinality off the built index (its row count IS the
    // distinct-value count) — never a second full JSON parse of `df`.
    // Persisted so kind resolution and subsequent lookups share one
    // materialization of the parse.
    val index = buildValueIndex(projected, idCol, "value").persist()
    val kind = indexType.toUpperCase match {
      case t @ ("INVERTED" | "STL_SORT" | "BITMAP") => t
      case "HYBRID" =>
        if (index.count() <= bitmapCardinalityCap) "BITMAP" else "INVERTED"
      case "AUTOINDEX" =>
        val t = autoIndexTypeOf(castType, index.count(), bitmapCardinalityCap)
        // TRIE resolution only applies to whole string columns; JSON
        // string paths resolve to the postings form like the reference
        if (t == "TRIE") "INVERTED" else t
      case other => throw new IllegalArgumentException(
        s"json path index type $other not supported (INVERTED|STL_SORT|BITMAP|HYBRID|AUTOINDEX)")
    }
    (kind, index)
  }

  /** HYBRID index dispatch (reference: index/HybridScalarIndex.cpp —
    * picks a bitmap for low-cardinality columns, falls back to inverted
    * postings above the cardinality cap). Both re-expressions share the
    * (value, cnt, postings) table shape; the tag records which physical
    * form a native engine would have chosen and lets callers route
    * lookups / storage layout accordingly.
    */
  def buildHybridIndex(df: DataFrame, idCol: String, valueCol: String,
      bitmapCardinalityCap: Long = 1000L,
      knownCard: Option[Long] = None): (String, DataFrame) = {
    val card = knownCard.getOrElse(
      df.agg(count_distinct(col(valueCol))).head().getLong(0))
    val kind = if (card <= bitmapCardinalityCap) "BITMAP" else "INVERTED"
    (kind, buildValueIndex(df, idCol, valueCol))
  }

  /** AUTOINDEX selection (reference: indexparamcheck AUTOINDEX — the
    * engine picks the scalar index type from dtype + cardinality).
    * `knownCard` lets callers batch cardinality measurement into one
    * multi-aggregate job instead of one driver-blocking action per
    * column (the q_hybrid_dispatch serial-actions fix).
    */
  def autoIndexType(df: DataFrame, valueCol: String,
      bitmapCardinalityCap: Long = 1000L,
      knownCard: Option[Long] = None): String = {
    lazy val card = knownCard.getOrElse(
      df.agg(count_distinct(col(valueCol))).head().getLong(0))
    autoIndexTypeOf(df.schema(valueCol).dataType, card, bitmapCardinalityCap)
  }

  /** The pure dtype+cardinality → index-type rule behind AUTOINDEX.
    * `card` is by-name: string columns over the cap resolve without
    * ever measuring cardinality when the caller already knows the type.
    */
  def autoIndexTypeOf(dt: org.apache.spark.sql.types.DataType, card: => Long,
      bitmapCardinalityCap: Long): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType if card <= bitmapCardinalityCap => "BITMAP"
      case StringType => "TRIE"
      case _: NumericType | DateType | TimestampType if card <= bitmapCardinalityCap => "BITMAP"
      case _: NumericType | DateType | TimestampType => "STL_SORT"
      case _ => "INVERTED"
    }
  }

  /** Term lookup via the index: ids of rows containing ALL query terms
    * (posting-list intersection — the index-side fast path the reference
    * takes for `text_match` when an inverted index exists).
    *
    * Intersection = explode postings → count per id == nTerms. Stays a
    * partial+final hash aggregation: a frequent term's billion-id posting
    * list spreads across tasks instead of funneling into one reducer row
    * (the collect_list+array_intersect formulation would hold every
    * matched posting list in a single aggregate buffer).
    */
  def lookupAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val nTerms = terms.distinct.size
    index
      .filter(col("term").isin(terms: _*))
      .select(explode(col("postings")).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === nTerms)
      .select(col("id"))
  }
}
