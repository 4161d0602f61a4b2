package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchAggTreeSpec extends SparkSpec {
  import spark.implicits._

  // hits fixture: (id, category, brand, price, score)
  private lazy val hits = Seq(
    (1L, "elec", "acme", 10.0, 0.9), (2L, "elec", "acme", 30.0, 0.8),
    (3L, "elec", "bolt", 20.0, 0.7), (4L, "elec", "bolt", 40.0, 0.6),
    (5L, "elec", "cove", 90.0, 0.5),
    (6L, "home", "acme", 15.0, 0.95), (7L, "home", "dune", 25.0, 0.85),
    (8L, "toys", "bolt", 5.0, 0.99)
  ).toDF("id", "cat", "brand", "price", "score")

  test("single level: bucket ordering by metric alias selects buckets (R7)") {
    val out = SearchAgg.groupTree(hits,
      SearchAgg.GroupBy(Seq("cat"), topGroups = 2,
        metrics = Map("sum_price" -> sum($"price")),
        orderBy = Seq(col("sum_price").desc)),
      idCol = "id")
    val got = out.select($"cat", $"sum_price").as[(String, Double)].collect().toMap
    // elec=190, home=40, toys=5 → top-2 by revenue
    assert(got == Map("elec" -> 190.0, "home" -> 40.0))
  }

  test("nested grouping with per-group metrics and in-bucket sort (R4/R5/R6)") {
    val spec = SearchAgg.GroupBy(Seq("cat"), topGroups = 2,
      metrics = Map("sum_price" -> sum($"price")),
      orderBy = Seq(col("sum_price").desc),
      subGroup = Some(SearchAgg.GroupBy(Seq("brand"), topGroups = 2,
        metrics = Map("avg_price" -> avg($"price")),
        orderBy = Seq(col("avg_price").asc), // cheapest brands first
        topHits = Some(SearchAgg.TopHits(1, col("price"), ascending = true,
          payloadCols = Seq("id", "price"))))))
    val out = SearchAgg.groupTree(hits, spec, idCol = "id")
    val rows = out
      .select($"cat", $"brand", $"avg_price", $"sum_price_l0",
        element_at($"_hits", 1).getField("id").as("cheapest"))
      .as[(String, String, Double, Double, Long)].collect().toSet
    // elec: brands by avg price asc → acme(20), bolt(30) [cove 90 dropped];
    // home: acme(15), dune(25). leaf rows carry the parent metric.
    assert(rows == Set(
      ("elec", "acme", 20.0, 190.0, 1L),
      ("elec", "bolt", 30.0, 190.0, 3L),
      ("home", "acme", 15.0, 40.0, 6L),
      ("home", "dune", 25.0, 40.0, 7L)))
  }

  test("children of dropped buckets are never emitted") {
    val spec = SearchAgg.GroupBy(Seq("cat"), topGroups = 1,
      orderBy = Seq(col("_count").desc),
      subGroup = Some(SearchAgg.GroupBy(Seq("brand"), topGroups = 10)))
    val out = SearchAgg.groupTree(hits, spec, idCol = "id")
    assert(out.select($"cat").distinct().as[String].collect().toList == List("elec"))
  }
}
