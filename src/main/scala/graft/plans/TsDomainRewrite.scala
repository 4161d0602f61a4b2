package graft.plans

import java.time.{ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Restores parquet pushdown for MVCC ts-domain predicates.
  *
  * [[graft.GraftSession.normalizeTs]] converts timestamp-typed `ts`
  * columns to epoch-nanos Long at the load boundary
  * (`unix_micros(cast(ts as timestamp)) * 1000`), so the whole MVCC /
  * TTL / truncate machinery works in one int64 domain — the reference's
  * TIMESTAMPTZ-as-int64 boundary conversion (`Types.h:70-102`). The
  * cost: a visibility filter like `ts <= read_ts` then compares a
  * *derived* expression, which the parquet source cannot push down —
  * at 100 TB that turns the hottest filter of the engine (every read
  * applies it) into a full post-scan evaluation with no row-group
  * zone-map pruning.
  *
  * This rule rewrites comparisons of the normalized expression against
  * Long literals back into plain comparisons on the underlying
  * timestamp column:
  *
  * {{{ unix_micros(cast(ts)) * 1000 [± c] <= N   ⇒   ts <= micros-literal }}}
  *
  * The rewritten predicate is attribute-vs-literal, so the normal
  * datasource strategy pushes it into the scan (`PushedFilters`) and
  * parquet prunes whole row groups by min/max stats — the Spark
  * analogue of the reference's zone-map skipping on its int64 ts field.
  * Bounds use floor/ceil division so sub-microsecond literal values
  * round in the direction that preserves the predicate exactly:
  * `us*1000 > N ⟺ us > floor(N/1000)`, `us*1000 ≥ N ⟺ us ≥ ceil(N/1000)`.
  *
  * The NTZ→TZ cast inside the pattern is only instant-preserving under
  * a fixed-offset UTC zone, so the rewrite is gated on the cast's
  * resolved timezone (GraftSession pins the session to UTC). Equality
  * is rewritten only when the literal is microsecond-aligned; the
  * calendar-interval path (`timestamp_micros(... div 1000) + months`)
  * is left alone — it is value-dependent and not pushdown-eligible by
  * construction.
  */
object TsDomainRewrite extends Rule[LogicalPlan] {

  private def isUtc(tz: Option[String]): Boolean = tz.exists { z =>
    try ZoneId.of(z).normalized() == ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }
  }

  /** Unwrap `unix_micros(ts-col) * 1000 (± longLit)*` → (attr, shift):
    * the expression equals `micros(attr) * 1000 + shift`.
    */
  private def nsOf(e: Expression): Option[(Attribute, Long)] = e match {
    case Multiply(UnixMicros(t), Literal(1000L, LongType), _) => attrOf(t).map((_, 0L))
    case Multiply(Literal(1000L, LongType), UnixMicros(t), _) => attrOf(t).map((_, 0L))
    case Add(x, Literal(c: Long, LongType), _) => nsOf(x).map { case (a, s) => (a, s + c) }
    case Add(Literal(c: Long, LongType), x, _) => nsOf(x).map { case (a, s) => (a, s + c) }
    case Subtract(x, Literal(c: Long, LongType), _) => nsOf(x).map { case (a, s) => (a, s - c) }
    case _ => None
  }

  private def attrOf(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == TimestampType => Some(a)
    case Cast(a: Attribute, TimestampType, _, _) if a.dataType == TimestampType => Some(a)
    case Cast(a: Attribute, TimestampType, tz, _)
        if a.dataType == TimestampNTZType && isUtc(tz) => Some(a)
    case _ => None
  }

  /** Microsecond literal in the attribute's own timestamp flavor. */
  private def usLit(a: Attribute, us: Long): Literal = Literal(us, a.dataType)

  private def floorUs(n: Long): Long = Math.floorDiv(n, 1000L)
  private def ceilUs(n: Long): Long = -Math.floorDiv(-n, 1000L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // ns-expression on the left, Long literal on the right
    case c @ GreaterThan(l, Literal(n: Long, LongType)) =>
      nsOf(l).fold(c: Expression) { case (a, s) => GreaterThan(a, usLit(a, floorUs(n - s))) }
    case c @ GreaterThanOrEqual(l, Literal(n: Long, LongType)) =>
      nsOf(l).fold(c: Expression) { case (a, s) => GreaterThanOrEqual(a, usLit(a, ceilUs(n - s))) }
    case c @ LessThan(l, Literal(n: Long, LongType)) =>
      nsOf(l).fold(c: Expression) { case (a, s) => LessThan(a, usLit(a, ceilUs(n - s))) }
    case c @ LessThanOrEqual(l, Literal(n: Long, LongType)) =>
      nsOf(l).fold(c: Expression) { case (a, s) => LessThanOrEqual(a, usLit(a, floorUs(n - s))) }
    case c @ EqualTo(l, Literal(n: Long, LongType)) =>
      nsOf(l) match {
        case Some((a, s)) if (n - s) % 1000 == 0 => EqualTo(a, usLit(a, (n - s) / 1000))
        case _ => c
      }
    // Long literal on the left (each ⟺ the mirrored bound above)
    case c @ GreaterThan(Literal(n: Long, LongType), r) =>
      nsOf(r).fold(c: Expression) { case (a, s) => GreaterThan(usLit(a, ceilUs(n - s)), a) }
    case c @ GreaterThanOrEqual(Literal(n: Long, LongType), r) =>
      nsOf(r).fold(c: Expression) { case (a, s) => GreaterThanOrEqual(usLit(a, floorUs(n - s)), a) }
    case c @ LessThan(Literal(n: Long, LongType), r) =>
      nsOf(r).fold(c: Expression) { case (a, s) => LessThan(usLit(a, floorUs(n - s)), a) }
    case c @ LessThanOrEqual(Literal(n: Long, LongType), r) =>
      nsOf(r).fold(c: Expression) { case (a, s) => LessThanOrEqual(usLit(a, ceilUs(n - s)), a) }
    case c @ EqualTo(Literal(n: Long, LongType), r) =>
      nsOf(r) match {
        case Some((a, s)) if (n - s) % 1000 == 0 => EqualTo(usLit(a, (n - s) / 1000), a)
        case _ => c
      }
  }
}
