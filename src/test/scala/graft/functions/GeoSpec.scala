package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.expr.ExprCompiler

/** Geo coarse→refine: prepared envelope columns + WKB must (a) give
  * byte-identical results to the raw-WKT path, (b) inject the coarse
  * bbox predicate into the compiled filter, and (c) push the envelope
  * comparisons down to the Parquet scan when the prepared table is
  * written out (reference design doc:
  * gis_filter_coarse_refine_split_fusion.md — coarse RTree + exact
  * refine; here the "RTree" is Parquet row-group min/max stats).
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (1L, "POINT(5 5)"), (2L, "POINT(50 50)"), (3L, "POINT(95 20)"),
    (4L, "LINESTRING(0 0, 100 100)"), (5L, "POLYGON((20 20, 30 20, 30 30, 20 30, 20 20))"),
    (6L, "POINT(50 59.999)")
  ).toDF("id", "geom")

  private val poly = "POLYGON((10 10, 90 10, 90 60, 10 60, 10 10))"

  test("prepared geometry path equals raw WKT path for every predicate") {
    val prepared = GeoFunctions.prepareGeometry(pts, "geom")
    for (expr <- Seq(
        s"st_within(geom, '$poly')",
        s"st_intersects(geom, '$poly')",
        s"st_contains(geom, 'POINT(25 25)')",
        "st_dwithin(geom, 'POINT(50 50)', 20.0)")) {
      val raw = pts.filter(ExprCompiler.compile(expr, pts))
        .select("id").as[Long].collect().toSet
      val fast = prepared.filter(ExprCompiler.compile(expr, prepared))
        .select("id").as[Long].collect().toSet
      assert(fast == raw, s"coarse+refine diverged for $expr")
    }
  }

  test("envelope columns and WKB are materialized correctly") {
    val prepared = GeoFunctions.prepareGeometry(pts, "geom")
    val row = prepared.filter($"id" === 5L)
      .select("geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax")
      .as[(Double, Double, Double, Double)].head()
    assert(row == ((20.0, 20.0, 30.0, 30.0)))
    // geom is now WKB binary, still readable by the predicates
    assert(prepared.schema("geom").dataType.typeName == "binary")
    val hit = prepared.filter(ExprCompiler.compile(s"st_within(geom, '$poly')", prepared))
      .select("id").as[Long].collect().toSet
    assert(hit == Set(2L, 5L, 6L))
  }

  test("coarse bbox filter reaches the parquet scan as a pushed filter") {
    val dir = java.nio.file.Files.createTempDirectory("geo-prep").toString
    GeoFunctions.prepareGeometry(pts, "geom").write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val q = table.filter(ExprCompiler.compile(s"st_within(geom, '$poly')", table))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(geom_xmin,10.0") &&
      plan.contains("LessThanOrEqual(geom_xmax,90.0"),
      s"expected envelope pushdown in plan:\n$plan")
    assert(q.select("id").as[Long].collect().toSet == Set(2L, 5L, 6L))
  }
}
