package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Partition-key collections (reference: `is_partition_key` in
  * pkg/util/typeutil/schema.go — rows are hashed on the partition-key
  * field into one of N physical partitions at insert
  * (proxy/repack_func.go), and a `key == value` filter routes the query
  * to exactly that partition, skipping the rest; tests
  * tests/python_client + materialized-view integration suite).
  *
  * Spark-first shape: the physical partition is a real directory
  * partition (`partitionBy(_part)`), so routing is Catalyst partition
  * pruning — directory-level, visible in the scan's `PartitionFilters`,
  * stronger than row-group stats. At 100 TB, an equality query on the
  * partition key touches 1/N of the files before a single row is read.
  */
object PartitionKey {

  /** Deterministic partition id for a key value (mirrors the
    * reference's hash-to-channel repack: hash(key) % num).
    */
  def partitionId(key: Column, numPartitions: Int): Column =
    pmod(xxhash64(key), lit(numPartitions.toLong))

  /** Write `df` hash-partitioned on `keyCol` into `numPartitions`
    * directory partitions at `path`. Rows are shuffled onto their
    * target partition first (`filesPerPartition` tasks per directory)
    * so the layout is `numPartitions × filesPerPartition` right-sized
    * files — without this, every input task writes a sliver into every
    * directory (tasks × partitions small files, the classic dynamic-
    * partition-write explosion at scale).
    */
  def write(df: DataFrame, keyCol: String, numPartitions: Int, path: String,
      filesPerPartition: Int = 1): Unit =
    df.withColumn("_part", partitionId(col(keyCol), numPartitions))
      .withColumn("_subfile", pmod(xxhash64(col(keyCol), lit(17)), lit(filesPerPartition.toLong)))
      .repartition(numPartitions * filesPerPartition, col("_part"), col("_subfile"))
      .drop("_subfile")
      .write.partitionBy("_part").mode("overwrite").parquet(path)

  /** Read with partition-key routing: `keyCol == value` becomes a
    * directory-pruning `_part` filter AND the exact key predicate (the
    * reference applies both: route to the partition, then filter within).
    */
  def readKeyEquals(spark: SparkSession, path: String, keyCol: String,
      value: Column, numPartitions: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("_part") === partitionId(value, numPartitions) &&
        col(keyCol) === value)
      .drop("_part")

  /** Partition-key isolation (reference: the `partitionkey.isolation`
    * collection property — proxy-side expr validation + per-key
    * isolated indexes, test_milvus_client_partition_key_isolation.py):
    * with isolation ON, every filter MUST pin the partition key with a
    * single top-level `key == value` equality conjunct; a missing key,
    * an OR anywhere above the key equality, `in` lists, or inequalities
    * on the key are rejected — each key value's data (and index) is
    * served in isolation, so a query that could span keys has no
    * isolated execution. Returns the pinned value's literal node.
    *
    * The walk accepts `key == v [AND anything...]` and rejects
    * everything else, exactly the reference's CheckPartitionKeyIsolation
    * rule (equality only, no OR, no NOT above it).
    */
  def isolationKeyEquality(filterExpr: String, keyCol: String): graft.expr.Node = {
    import graft.expr._
    val ast = Parser.parse(filterExpr)
    // equality conjuncts reachable without crossing OR/NOT
    def keyEqs(n: Node): Seq[Node] = n match {
      case Binary(BinOp.And, l, r) => keyEqs(l) ++ keyEqs(r)
      case Binary(BinOp.Eq, Ident(`keyCol`), v) => Seq(v)
      case Binary(BinOp.Eq, v, Ident(`keyCol`)) => Seq(v)
      case _ => Nil
    }
    // any reference to the key under OR/NOT/non-equality disqualifies
    def badKeyUse(n: Node, underOrNot: Boolean): Boolean = n match {
      case Binary(BinOp.And, l, r) => badKeyUse(l, underOrNot) || badKeyUse(r, underOrNot)
      case Binary(BinOp.Or, l, r) => badKeyUse(l, underOrNot = true) || badKeyUse(r, underOrNot = true)
      case Unary(UnaryOp.Not, c) => badKeyUse(c, underOrNot = true)
      case Binary(BinOp.Eq, Ident(`keyCol`), _) | Binary(BinOp.Eq, _, Ident(`keyCol`)) => underOrNot
      case Binary(_, l, r) => mentions(l) || mentions(r)
      case In(t, vs, _) => mentions(t) || mentions(vs)
      case other => mentions(other)
    }
    def mentions(n: Node): Boolean = n match {
      case Ident(`keyCol`) => true
      case Binary(_, l, r) => mentions(l) || mentions(r)
      case Unary(_, c) => mentions(c)
      case In(t, vs, _) => mentions(t) || mentions(vs)
      case Like(t, _) => mentions(t)
      case RegexMatch(t, p, _) => mentions(t) || mentions(p)
      case IsNull(t, _) => mentions(t)
      case _ => false
    }
    val eqs = keyEqs(ast)
    if (eqs.isEmpty) throw new IllegalArgumentException(
      s"partition key isolation is on: the filter must contain a top-level " +
        s"'$keyCol == <value>' equality conjunct")
    if (eqs.size > 1) throw new IllegalArgumentException(
      s"partition key isolation is on: exactly ONE '$keyCol == <value>' " +
        s"equality is allowed, found ${eqs.size}")
    if (badKeyUse(ast, underOrNot = false)) throw new IllegalArgumentException(
      s"partition key isolation is on: '$keyCol' may only appear as a " +
        "top-level equality conjunct (no OR/NOT branches, no ranges, no IN)")
    eqs.head
  }
}
