package graft.operators

import graft.expr._

/** File-level primary-key segment pruning (reference: MEP
  * `20260324-segment_filter_pk_predicate_pruning.md` — the delegator
  * drops whole segments from the search/query dispatch list via pk
  * min/max + bloom before any kernel runs).
  *
  * Spark already prunes ROW GROUPS inside one file from parquet footer
  * stats, but a collection serving many sealed segment directories
  * still opens every footer. At 100 TB that is the difference between
  * listing/opening thousands of files and opening one — so the facade
  * keeps a per-segment pk [min,max] registry and, for pk-anchored
  * filters, unions only the overlapping segment directories.
  *
  * This object is the pure half: extract a conservative pk DOMAIN from
  * a parsed filter AST, and decide interval overlap against a segment's
  * [min,max]. "Conservative" means: when in doubt return no domain
  * (scan everything) — pruning may only ever REMOVE provably-empty
  * segments. Because every version of a pk value lies inside the pk
  * range of the segment that holds it, pruning by [min,max] can never
  * drop a row version, tombstone join keys, or patch-overlay matches
  * for a surviving pk.
  */
object PkPruning {

  /** The set of pk values a filter can possibly match. */
  sealed trait Domain
  /** A finite point set (pk == v, pk IN [..]). */
  final case class Points(vs: Seq[Any]) extends Domain
  /** A one- or two-sided interval; bounds carry inclusivity. */
  final case class Interval(lo: Option[(Any, Boolean)],
      hi: Option[(Any, Boolean)]) extends Domain

  /** Above this many IN-list points a point set is collapsed AT
    * CONSTRUCTION to the points' [min,max] envelope interval — pruning
    * power decays gracefully instead of the driver walking a huge list
    * per segment. Public: [[graft.Collection]] uses the same cap to
    * bound its per-segment bloom consult.
    */
  val MaxPoints = 1024

  /** Normalizing Points constructor: oversized sets collapse to their
    * envelope (one interval-overlap test per segment instead of
    * O(points)); a set with incomparable members yields no domain.
    */
  def points(vs: Seq[Any]): Option[Domain] =
    if (vs.isEmpty) Some(Points(Nil))
    else if (vs.size <= MaxPoints) Some(Points(vs))
    else {
      val sorted = scala.util.Try(vs.sortWith((a, b) =>
        cmp(a, b).getOrElse(throw new IllegalArgumentException) < 0)).toOption
      sorted.map(s => Interval(Some((s.head, true)), Some((s.last, true))))
    }

  private def litValue(n: Node): Option[Any] = n match {
    case IntLit(v)    => Some(v)
    case StringLit(v) => Some(v)
    case _            => None // floats/bools/templates never type a pk
  }

  /** Total order over comparable pk literals. Long pks may meet the
    * parser's IntLit; varchar pks meet StringLit. A type mismatch means
    * "cannot compare" → caller must not prune.
    */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _                      => None
  }

  /** Extract the pk domain implied by `node`, or None when the filter
    * does not pin the pk. Only top-level AND conjuncts contribute: a
    * single pk-anchored conjunct is sufficient (the match set is a
    * subset of each conjunct's domain); multiple conjuncts intersect.
    */
  def domainOf(node: Node, pkField: String): Option[Domain] = node match {
    case Binary(BinOp.And, l, r) =>
      (domainOf(l, pkField), domainOf(r, pkField)) match {
        case (Some(a), Some(b)) => Some(intersect(a, b).getOrElse(a))
        case (a, b)             => a.orElse(b)
      }
    case Binary(BinOp.Eq, Ident(f), v) if f == pkField =>
      litValue(v).map(x => Points(Seq(x)))
    case Binary(BinOp.Eq, v, Ident(f)) if f == pkField =>
      litValue(v).map(x => Points(Seq(x)))
    case In(Ident(f), ArrayLit(items), false) if f == pkField =>
      val vs = items.map(litValue)
      if (vs.nonEmpty && vs.forall(_.isDefined)) points(vs.flatten)
      else None
    case Binary(op, Ident(f), v) if f == pkField =>
      litValue(v).flatMap(x => oneSided(op, x, flipped = false))
    case Binary(op, v, Ident(f)) if f == pkField =>
      litValue(v).flatMap(x => oneSided(op, x, flipped = true))
    case RangeCmp(lo, loInc, Ident(f), hiInc, hi) if f == pkField =>
      (litValue(lo), litValue(hi)) match {
        case (Some(a), Some(b)) =>
          Some(Interval(Some((a, loInc)), Some((b, hiInc))))
        case _ => None
      }
    case _ => None // OR / NOT / non-literal / non-pk: no safe domain
  }

  /** `pk OP lit` (or `lit OP pk` when flipped) as an interval. */
  private def oneSided(op: BinOp, v: Any, flipped: Boolean): Option[Domain] = {
    val effective = if (!flipped) op else op match {
      case BinOp.Lt => BinOp.Gt
      case BinOp.Le => BinOp.Ge
      case BinOp.Gt => BinOp.Lt
      case BinOp.Ge => BinOp.Le
      case other    => other
    }
    effective match {
      case BinOp.Lt => Some(Interval(None, Some((v, false))))
      case BinOp.Le => Some(Interval(None, Some((v, true))))
      case BinOp.Gt => Some(Interval(Some((v, false)), None))
      case BinOp.Ge => Some(Interval(Some((v, true)), None))
      case _        => None
    }
  }

  /** Public intersection for callers composing domains (e.g. a filter
    * domain with an iterator cursor bound).
    */
  def intersectDomains(a: Domain, b: Domain): Option[Domain] = intersect(a, b)

  /** Intersect two domains when their value types compare; None keeps
    * the caller on the wider of the two (still sound).
    */
  private def intersect(a: Domain, b: Domain): Option[Domain] = (a, b) match {
    case (Points(xs), Points(ys)) =>
      val set = ys.toSet
      Some(Points(xs.filter(set.contains)))
    case (Points(xs), i: Interval) => pointsIn(xs, i)
    case (i: Interval, Points(xs)) => pointsIn(xs, i)
    case (Interval(lo1, hi1), Interval(lo2, hi2)) =>
      val lo = tighter(lo1, lo2, takeMax = true)
      val hi = tighter(hi1, hi2, takeMax = false)
      if (lo.isEmpty && (lo1.nonEmpty || lo2.nonEmpty)) None
      else if (hi.isEmpty && (hi1.nonEmpty || hi2.nonEmpty)) None
      else Some(Interval(lo, hi))
  }

  private def pointsIn(xs: Seq[Any], i: Interval): Option[Domain] = {
    val kept = xs.filter { x =>
      val okLo = i.lo.forall { case (b, inc) =>
        cmp(x, b).forall(c => if (inc) c >= 0 else c > 0) }
      val okHi = i.hi.forall { case (b, inc) =>
        cmp(x, b).forall(c => if (inc) c <= 0 else c < 0) }
      okLo && okHi
    }
    Some(Points(kept))
  }

  /** The tighter of two optional bounds (max of lows, min of highs);
    * None when the bounds do not compare.
    */
  private def tighter(x: Option[(Any, Boolean)], y: Option[(Any, Boolean)],
      takeMax: Boolean): Option[(Any, Boolean)] = (x, y) match {
    case (None, b) => b
    case (a, None) => a
    case (Some((av, ai)), Some((bv, bi))) =>
      cmp(av, bv) match {
        case Some(0)          => Some((av, ai && bi))
        case Some(c) if c > 0 => if (takeMax) x else y
        case Some(_)          => if (takeMax) y else x
        case None             => None
      }
  }

  /** Could a segment with pk range [mn, mx] hold any row in `d`?
    * Incomparable values answer true (never prune on doubt).
    */
  def overlaps(d: Domain, mn: Any, mx: Any): Boolean = d match {
    case Points(vs) if vs.isEmpty => false
    case Points(vs) => // ≤ MaxPoints by construction; short-circuits
      vs.exists { v =>
        (cmp(v, mn), cmp(v, mx)) match {
          case (Some(a), Some(b)) => a >= 0 && b <= 0
          case _                  => true
        }
      }
    case Interval(lo, hi) =>
      val loOk = lo.forall { case (b, inc) =>
        cmp(mx, b) match { // segment max must reach the lower bound
          case Some(c) => if (inc) c >= 0 else c > 0
          case None    => true
        }
      }
      val hiOk = hi.forall { case (b, inc) =>
        cmp(mn, b) match { // segment min must sit under the upper bound
          case Some(c) => if (inc) c <= 0 else c < 0
          case None    => true
        }
      }
      loOk && hiOk
  }
}
