package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.io.{WKBReader, WKTReader}

/** Geo predicates over WKT (string) or WKB (binary) geometry columns,
  * backed by JTS (reference semantics: internal/core/src/exec/expression/
  * GISFunctionFilterExpr.cpp — ST_Equals/Touches/Overlaps/Crosses/
  * Contains/Intersects/Within + ST_DWithin, ST_IsValid over a
  * GEOMETRY(WKT/WKB) field).
  *
  * Scale note (reference design doc: gis_filter_coarse_refine_split —
  * coarse RTree + exact refine): when a geo predicate is conjoined with
  * a cheap bbox pre-filter on indexed x/y min/max columns, Parquet
  * zone-maps prune row groups before the exact JTS refine runs. See
  * [[GeoFunctions.bboxPrefilter]].
  */
object GeoOps {
  def parse(v: Any): Geometry = v match {
    case s: UTF8String => new WKTReader().read(s.toString)
    case b: Array[Byte] => new WKBReader().read(b)
    case s: String => new WKTReader().read(s)
    case other => throw new IllegalArgumentException(s"not a geometry: $other")
  }

  def eval(pred: String, a: Geometry, b: Geometry): Boolean = pred match {
    case "st_equals"     => a.equalsTopo(b)
    case "st_touches"    => a.touches(b)
    case "st_overlaps"   => a.overlaps(b)
    case "st_crosses"    => a.crosses(b)
    case "st_contains"   => a.contains(b)
    case "st_intersects" => a.intersects(b)
    case "st_within"     => a.within(b)
    case other           => throw new IllegalArgumentException(s"unknown geo predicate $other")
  }
}

/** `predicate(geomCol, queryGeom)` — boolean geo relation. */
case class GeoPredicate(left: Expression, right: Expression, predicate: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = predicate
  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess

  // query geometry is almost always a literal — parse once
  @transient private lazy val rightGeom: Option[Geometry] = right match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      Some(GeoOps.parse(v))
    case _ => None
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = GeoOps.parse(l)
    val b = rightGeom.getOrElse(GeoOps.parse(r))
    GeoOps.eval(predicate, a, b)
  }

  override protected def withNewChildrenInternal(nl: Expression, nr: Expression): Expression =
    copy(left = nl, right = nr)
}

/** `st_dwithin(geomCol, queryGeom, distance)` */
case class GeoDWithin(left: Expression, right: Expression, distance: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_dwithin"
  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess

  @transient private lazy val rightGeom: Option[Geometry] = right match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      Some(GeoOps.parse(v))
    case _ => None
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = GeoOps.parse(l)
    val b = rightGeom.getOrElse(GeoOps.parse(r))
    a.isWithinDistance(b, distance)
  }

  override protected def withNewChildrenInternal(nl: Expression, nr: Expression): Expression =
    copy(left = nl, right = nr)
}

/** `st_isvalid(geomCol)` */
case class GeoIsValid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_isvalid"

  override def nullSafeEval(v: Any): Any =
    try { GeoOps.parse(v).isValid } catch { case _: Exception => false }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object GeoFunctions {
  import graft.expr.{Call, Ident, StringLit, IntLit, FloatLit, Node}
  import graft.expr.ExprCompiler.{CompileError, Ctx}

  def stPredicate(pred: String, geom: Column, query: Column): Column =
    ColumnBridge.column(GeoPredicate(
      ColumnBridge.expression(geom), ColumnBridge.expression(query), pred))

  def stDWithin(geom: Column, query: Column, distance: Double): Column =
    ColumnBridge.column(GeoDWithin(
      ColumnBridge.expression(geom), ColumnBridge.expression(query), distance))

  def stIsValid(geom: Column): Column =
    ColumnBridge.column(GeoIsValid(ColumnBridge.expression(geom)))

  /** Coarse bbox pre-filter for pushdown: given materialized envelope
    * columns (xmin/xmax/ymin/ymax) and a query WKT, returns the zone-map-
    * prunable envelope-intersection predicate to AND in front of the
    * exact JTS refine.
    */
  def bboxPrefilter(xmin: Column, xmax: Column, ymin: Column, ymax: Column,
      queryWkt: String): Column = {
    val env = new WKTReader().read(queryWkt).getEnvelopeInternal
    xmin <= env.getMaxX && xmax >= env.getMinX &&
      ymin <= env.getMaxY && ymax >= env.getMinY
  }

  private[graft] def compileCall(call: Call, ctx: Ctx): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    def geomCol: Column = call.args.head match {
      case Ident(f) => col(f)
      case other    => throw CompileError(s"${call.name} requires a geometry field, got $other")
    }
    def wktArg(i: Int): Column = call.args(i) match {
      case StringLit(s) => lit(s)
      case other        => throw CompileError(s"${call.name} requires WKT string, got $other")
    }
    call.name match {
      case "st_isvalid" => stIsValid(geomCol)
      case "st_dwithin" =>
        val d = call.args(2) match {
          case FloatLit(v) => v
          case IntLit(v)   => v.toDouble
          case other       => throw CompileError(s"st_dwithin distance must be number, got $other")
        }
        stDWithin(geomCol, wktArg(1), d)
      case p @ ("st_equals" | "st_touches" | "st_overlaps" | "st_crosses" |
                "st_contains" | "st_intersects" | "st_within") =>
        stPredicate(p, geomCol, wktArg(1))
      case other => throw CompileError(s"unknown geo function $other")
    }
  }
}
