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

/** `st_envelope(geomCol)` → struct(xmin,ymin,xmax,ymax) — one JTS parse
  * per row at INGEST, so query-time coarse filters are plain double
  * comparisons (codegen'd, zone-map prunable) instead of geometry ops.
  * Reference: docs/design_docs/gis_filter_coarse_refine_split_fusion.md
  * (coarse RTree probe + exact refine); the Spark analogue of the RTree
  * is Parquet min/max stats over materialized envelope columns.
  */
case class GeoEnvelope(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
  override def prettyName: String = "st_envelope"

  override def nullSafeEval(v: Any): Any = {
    val env = GeoOps.parse(v).getEnvelopeInternal
    org.apache.spark.sql.catalyst.InternalRow(
      env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `st_aswkb(geomCol)` — normalize WKT (or WKB) to WKB binary once at
  * ingest; WKB parse at query time is ~10× cheaper than re-lexing WKT
  * per row per predicate.
  */
case class GeoToWkb(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_aswkb"

  override def nullSafeEval(v: Any): Any =
    new org.locationtech.jts.io.WKBWriter().write(GeoOps.parse(v))

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

  def stEnvelope(geom: Column): Column =
    ColumnBridge.column(GeoEnvelope(ColumnBridge.expression(geom)))

  def stAsWkb(geom: Column): Column =
    ColumnBridge.column(GeoToWkb(ColumnBridge.expression(geom)))

  /** Ingest-time geometry preparation (run ONCE, before writing the
    * table): re-encodes `geomCol` WKT→WKB and materializes the four
    * envelope columns `<geom>_xmin/_ymin/_xmax/_ymax` that
    * [[compileCall]] auto-detects to inject a coarse pre-filter ahead of
    * the exact JTS refine. Written to Parquet, the envelope doubles get
    * row-group min/max stats — the distributed analogue of the
    * reference's RTree coarse probe (RTreeIndex.cpp).
    */
  def prepareGeometry(df: org.apache.spark.sql.DataFrame, geomCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val env = s"${geomCol}_env"
    df.withColumn(env, stEnvelope(col(geomCol)))
      .withColumn(geomCol, stAsWkb(col(geomCol)))
      .withColumn(s"${geomCol}_xmin", col(s"$env.xmin"))
      .withColumn(s"${geomCol}_ymin", col(s"$env.ymin"))
      .withColumn(s"${geomCol}_xmax", col(s"$env.xmax"))
      .withColumn(s"${geomCol}_ymax", col(s"$env.ymax"))
      .drop(env)
  }

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

  /** The envelope-level NECESSARY condition for `pred` over the
    * materialized `<field>_{xmin,ymin,xmax,ymax}` columns — a superset
    * filter, so ANDing it ahead of the exact refine never changes the
    * result, only prunes rows (and, on Parquet, whole row groups) before
    * the expensive JTS evaluation.
    */
  private def coarseFilter(field: String, pred: String, queryWkt: String,
      dist: Double = 0.0): Option[Column] = {
    import org.apache.spark.sql.functions.col
    val (xmin, ymin) = (col(s"${field}_xmin"), col(s"${field}_ymin"))
    val (xmax, ymax) = (col(s"${field}_xmax"), col(s"${field}_ymax"))
    val e = new WKTReader().read(queryWkt).getEnvelopeInternal
    pred match {
      // relation implies envelope intersection
      case "st_intersects" | "st_equals" | "st_touches" | "st_overlaps" | "st_crosses" =>
        Some(xmin <= e.getMaxX && xmax >= e.getMinX &&
             ymin <= e.getMaxY && ymax >= e.getMinY)
      // geom within query ⇒ geom's envelope inside query's envelope
      case "st_within" =>
        Some(xmin >= e.getMinX && xmax <= e.getMaxX &&
             ymin >= e.getMinY && ymax <= e.getMaxY)
      // geom contains query ⇒ geom's envelope covers query's envelope
      case "st_contains" =>
        Some(xmin <= e.getMinX && xmax >= e.getMaxX &&
             ymin <= e.getMinY && ymax >= e.getMaxY)
      // within distance d ⇒ envelopes within d on each axis
      case "st_dwithin" =>
        Some(xmin <= e.getMaxX + dist && xmax >= e.getMinX - dist &&
             ymin <= e.getMaxY + dist && ymax >= e.getMinY - dist)
      case _ => None
    }
  }

  /** True when prepareGeometry's envelope columns exist for `field`. */
  private def hasEnvelope(ctx: Ctx, field: String): Boolean =
    Seq("_xmin", "_ymin", "_xmax", "_ymax")
      .forall(s => ctx.fieldType(field + s).contains(DoubleType))

  private[graft] def compileCall(call: Call, ctx: Ctx): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    def geomField: String = call.args.head match {
      case Ident(f) => f
      case other    => throw CompileError(s"${call.name} requires a geometry field, got $other")
    }
    def wktArg(i: Int): String = call.args(i) match {
      case StringLit(s) => s
      case other        => throw CompileError(s"${call.name} requires WKT string, got $other")
    }
    /** coarse bbox AND exact JTS — coarse only when envelope columns exist. */
    def coarseRefine(pred: String, exact: Column, wkt: String, dist: Double = 0.0): Column =
      if (hasEnvelope(ctx, geomField))
        coarseFilter(geomField, pred, wkt, dist).map(_ && exact).getOrElse(exact)
      else exact
    call.name match {
      case "st_isvalid" => stIsValid(col(geomField))
      case "st_dwithin" =>
        val d = call.args(2) match {
          case FloatLit(v) => v
          case IntLit(v)   => v.toDouble
          case other       => throw CompileError(s"st_dwithin distance must be number, got $other")
        }
        val wkt = wktArg(1)
        coarseRefine("st_dwithin", stDWithin(col(geomField), lit(wkt), d), wkt, d)
      case p @ ("st_equals" | "st_touches" | "st_overlaps" | "st_crosses" |
                "st_contains" | "st_intersects" | "st_within") =>
        val wkt = wktArg(1)
        coarseRefine(p, stPredicate(p, col(geomField), lit(wkt)), wkt)
      case other => throw CompileError(s"unknown geo function $other")
    }
  }
}
