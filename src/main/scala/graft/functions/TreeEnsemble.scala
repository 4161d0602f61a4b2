package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gradient-boosted-tree INFERENCE as Catalyst expressions (reference:
  * design doc 20260708-xgboost-function-chain.md — an `xgboost`
  * FunctionChain expression reranks recalled candidates with a tree
  * model over scalar entity features, keeping recall + learned rerank
  * in one request).
  *
  * Spark-first shape: a trained tree is pure arithmetic, so instead of
  * an external predictor call per batch (a UDF boundary), each tree
  * compiles to a nested `when/otherwise` Column and the ensemble to
  * their sum — whole-stage-codegen'd, pushdown-transparent, executor-
  * local, nothing to load or cache. Model TRAINING stays outside the
  * engine (as in the reference — models arrive as artifacts; here the
  * artifact is this tiny tree AST, e.g. parsed from an xgboost dump).
  *
  * Semantics match xgboost's UBJ evaluation: missing feature values
  * (nulls) follow the node's `missingLeft` default direction;
  * `output=raw` is the margin sum (+ base score), `output=default`
  * applies the binary-logistic transform.
  */
object TreeEnsemble {

  sealed trait Node
  final case class Leaf(value: Double) extends Node
  /** Split on `feature < threshold`; nulls go left iff `missingLeft`. */
  final case class Split(feature: String, threshold: Double,
      left: Node, right: Node, missingLeft: Boolean = true) extends Node

  final case class Model(trees: Seq[Node], baseScore: Double = 0.0)

  private def compile(node: Node): Column = node match {
    case Leaf(v) => lit(v)
    case Split(f, t, l, r, missingLeft) =>
      val miss = if (missingLeft) compile(l) else compile(r)
      when(col(f).isNull, miss)
        .when(col(f) < t, compile(l))
        .otherwise(compile(r))
  }

  /** Raw margin: Σ tree outputs + base score (output=raw). */
  def rawScore(model: Model): Column =
    model.trees.map(compile).reduce(_ + _) + lit(model.baseScore)

  /** Binary-logistic probability (output=default for binary models). */
  def probability(model: Model): Column =
    lit(1.0) / (lit(1.0) + exp(-rawScore(model)))

  /** Rerank hits: append `_rerank` and re-rank per query by it, keeping
    * the original columns (the FunctionChain L0-rerank shape).
    */
  def rerank(hits: org.apache.spark.sql.DataFrame, model: Model, qidCol: String,
      k: Int, raw: Boolean = true, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scoreCol = if (raw) rawScore(model) else probability(model)
    hits
      .withColumn("_rerank", round(scoreCol, roundTo))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("_rerank").desc, col("rank").asc)))
      .filter(col("rank") <= k)
  }
}
