package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Contains, EqualTo, Expression, Like, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.NgramIndex

/** Automatic index-vs-scan choice for inner-wildcard LIKE — the
  * reference decides per-expression whether a filter runs on an index
  * or the raw column (SURVEY §4: the `SupportIndex` paths under
  * `exec/expression/`,
  * `index/NgramInvertedIndex.cpp`, fused conjunctions
  * `LikeConjunctExpr.cpp:110`); here that decision is a Catalyst
  * optimizer [[Rule]]: a `Filter` whose condition conjuncts
  * `col CONTAINS 'pat'` / `col LIKE '%pat%'` over a table with a
  * registered ngram index gains a LEFT SEMI join against the index's
  * candidate ids, keeping the original predicate as the exact refine.
  *
  * The rewrite preserves semantics unconditionally (candidates are a
  * superset: lowercased grams; the refine stays), prunes the scan from
  * |corpus| to |candidates| before a row of text is materialized, and
  * fuses ALL indexable patterns of the conjunction into ONE index probe
  * (the LikeConjunct shape). Patterns shorter than the gram width
  * simply don't contribute to pruning.
  *
  * Scale note: the injected subplan is pre-optimized (gram filter
  * pushed to the index scan) and carries no broadcast hint — AQE
  * broadcasts the candidate set iff it turns out small, exactly like
  * the hand-written [[NgramIndex.likeSearch]].
  *
  * Activate per session via `spark.experimental.extraOptimizations ++=
  * Seq(NgramRewrite.RewriteRule)` (works on any session, no extension
  * jar wiring needed) and register indexes with [[register]].
  */
object NgramRewrite {

  final case class Registration(dataPath: String, idCol: String, textCol: String,
      indexPath: String, n: Int)

  /** (normalized data path, text column) -> registration. */
  private val registry = TrieMap.empty[(String, String), Registration]

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  def register(dataPath: String, idCol: String, textCol: String,
      indexPath: String, n: Int = 3): Unit =
    registry.put((norm(dataPath), textCol), Registration(dataPath, idCol, textCol, indexPath, n))

  def clear(): Unit = registry.clear()

  /** Install the rule on `spark` (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRule

  object RewriteRule extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case f @ Filter(cond, rel: LogicalRelation) =>
          lookup(rel).view
            .map(reg => (reg,
              innerPatterns(cond, reg.textCol)
                .flatMap(NgramIndex.patternGrams(_, reg.n)).distinct))
            .collectFirst { case (reg, grams) if grams.nonEmpty =>
              rewrite(f, rel, reg, grams)
            }
            .getOrElse(f)
      }

    /** Registrations for a file relation, matched on its root path. */
    private def lookup(rel: LogicalRelation): Seq[Registration] =
      rel.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths
            .flatMap { p =>
              val key = norm(p.toString)
              registry.collect {
                case ((dp, _), reg) if key == dp || key.startsWith(dp + "/") => reg
              }
            }
            .filter(reg => rel.output.exists(_.name == reg.idCol) &&
              rel.output.exists(_.name == reg.textCol))
            .toSeq
        case _ => None.toSeq
      }

    /** Literal inner-substring patterns conjunctively required of
      * `textCol`: `Contains(col, lit)` and `col LIKE '%lit%'` (no
      * interior wildcards). Disjunctions don't qualify — a row matching
      * the OTHER branch must survive, so OR trees are left alone.
      */
    private def innerPatterns(cond: Expression, textCol: String): Seq[String] = {
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case other     => Seq(other)
      }
      // the probed side must be the BARE column: an expression over it
      // (reverse(text), substring(text), …) changes which grams the
      // matched bytes produce, and a rewrite there would DROP rows
      def isTextAttr(e: Expression): Boolean = e match {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.name == textCol
        case _ => false
      }
      conjuncts(cond).flatMap {
        case Contains(a, Literal(s: UTF8String, _)) if isTextAttr(a) =>
          Some(s.toString)
        case Like(a, Literal(s: UTF8String, _), escape) if isTextAttr(a) =>
          val p = s.toString
          val inner = p.length > 2 && p.startsWith("%") && p.endsWith("%") &&
            !p.substring(1, p.length - 1).exists(c => c == '%' || c == '_' || c == escape)
          if (inner) Some(p.substring(1, p.length - 1)) else None
        case _ => None
      }
    }

    private def rewrite(f: Filter, rel: LogicalRelation, reg: Registration,
        grams: Seq[String]): LogicalPlan = {
      val spark = SparkSession.active
      // candidate ids: one fused probe over all patterns' grams; the
      // subplan is pre-optimized so the gram IN-filter is already pushed
      // into the index scan
      val cand = spark.read.parquet(reg.indexPath)
        .filter(col("term").isin(grams: _*))
        .groupBy(col("id"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("_hits"))
        .filter(col("_hits") === grams.size)
        .select(col("id"))
      val candPlan = cand.queryExecution.optimizedPlan
      val leftId = rel.output.find(_.name == reg.idCol).get
      val rightId = candPlan.output.head
      val join = Join(rel, candPlan, LeftSemi,
        Some(EqualTo(leftId, rightId)), JoinHint.NONE)
      Filter(f.condition, join)
    }
  }
}
