package graft

import org.apache.spark.sql.functions._

/** Resource-group RPC contract (impl.go:5832-6200 +
  * resource_manager.go:131-395,1107-1170) and the Spark scheduler-pool
  * binding. Not DuckDB-expressible (pure metadata + scheduling), so
  * ScalaTest-gated like the other registry surfaces.
  */
class ResourceGroupsSpec extends SparkSpec {
  import ResourceGroups._

  test("default group exists, is listed, and is not deletable") {
    val r = new Registry(totalNodes = 4)
    assert(r.list == Seq(DefaultName))
    val d = r.describe(DefaultName)
    assert(d.nodes == 4 && d.config.requests == 0)
    val e = intercept[IllegalArgumentException](r.drop(DefaultName))
    assert(e.getMessage.contains("default resource group is not deletable"))
  }

  test("create: idempotent on the same config, named error on a different one") {
    val r = new Registry
    r.create("rg1", Config(1, 2))
    r.create("rg1", Config(1, 2)) // the CheckIfResourceGroupAddable ignored promise
    val e = intercept[IllegalArgumentException](r.create("rg1", Config(1, 3)))
    assert(e.getMessage.contains(
      "resource group already exist, but create with different config"))
  }

  test("config validation: negatives, limits<requests, transfer self/missing") {
    val r = new Registry
    def illegal(cfg: Config): String =
      intercept[IllegalArgumentException](r.create("bad", cfg)).getMessage
    assert(illegal(Config(-1, 2)).contains("should not less than 0"))
    assert(illegal(Config(3, 2)).contains(
      "limits node num should not less than requests node num"))
    assert(illegal(Config(1, 2, transferFrom = Seq("bad")))
      .contains("should not be itself"))
    assert(illegal(Config(1, 2, transferTo = Seq("ghost"))).contains("not exist"))
    // name contract (proxy/util.go:271-293)
    assert(intercept[IllegalArgumentException](r.create("1abc", Config(0, 0)))
      .getMessage.contains("must be an underscore or letter"))
    assert(intercept[IllegalArgumentException](r.create("a-b", Config(0, 0)))
      .getMessage.contains("can only contain numbers, letters and underscores"))
    assert(intercept[IllegalArgumentException](r.create("", Config(0, 0)))
      .getMessage.contains("couldn't be empty"))
  }

  test("group count cap is the quota default") {
    val r = new Registry
    (1 until MaxGroups).foreach(i => r.create(s"rg$i", Config(0, 0)))
    val e = intercept[IllegalArgumentException](r.create("one_more", Config(0, 0)))
    assert(e.getMessage.contains("resource group num reach limit"))
  }

  test("drop: only a drained group; transfer edges and placements block it") {
    val r = new Registry
    r.create("rg1", Config(1, 2))
    val e1 = intercept[IllegalArgumentException](r.drop("rg1"))
    assert(e1.getMessage.contains("limits node num is not 0"))
    r.update(Map("rg1" -> Config(0, 0)))
    r.create("rg2", Config(0, 0, transferFrom = Seq("rg1")))
    val e2 = intercept[IllegalArgumentException](r.drop("rg1"))
    assert(e2.getMessage.contains("`TransferFrom`"))
    r.update(Map("rg2" -> Config(0, 0)))
    r.drop("rg1")
    r.drop("rg1") // idempotent
    assert(r.list == Seq(DefaultName, "rg2"))
    // update of a missing group is the named not-found
    val e3 = intercept[IllegalArgumentException](r.update(Map("rg1" -> Config(0, 0))))
    assert(e3.getMessage.contains("resource group not found"))
  }

  test("transferNode rewrites both configs like the compatibility path") {
    val r = new Registry(totalNodes = 4)
    r.create("rg1", Config(0, 0))
    r.transferNode(DefaultName, "rg1", 3)
    val d = r.describe(DefaultName); val g = r.describe("rg1")
    assert(d.nodes == 1 && g.nodes == 3)
    // default group's limits never shrink; target's limits grow to requests
    assert(d.config.limits == Int.MaxValue && d.config.requests == 0)
    assert(g.config.requests == 3 && g.config.limits == 3)
    // not enough nodes is the named error
    val e = intercept[IllegalArgumentException](r.transferNode(DefaultName, "rg1", 5))
    assert(e.getMessage.contains("resource group node not enough"))
    assert(intercept[IllegalArgumentException](
      r.transferNode("rg1", "rg1", 1)).getMessage.contains("should not be the same"))
    assert(intercept[IllegalArgumentException](
      r.transferNode("rg1", DefaultName, 0)).getMessage.contains("invalid NumNode"))
    // and back
    r.transferNode("rg1", DefaultName, 3)
    assert(r.describe(DefaultName).nodes == 4 && r.describe("rg1").nodes == 0)
  }

  test("transferReplica moves a loaded collection between groups") {
    val r = new Registry
    r.create("rg1", Config(1, 1))
    r.loadCollection("docs") // default group
    assert(r.describe(DefaultName).loadedCollections == Seq("docs"))
    r.transferReplica(DefaultName, "rg1", "docs")
    assert(r.describe("rg1").loadedCollections == Seq("docs"))
    assert(r.describe(DefaultName).loadedCollections.isEmpty)
    val e = intercept[IllegalArgumentException](
      r.transferReplica(DefaultName, "rg1", "docs"))
    assert(e.getMessage.contains("is not loaded in resource group"))
    assert(intercept[IllegalArgumentException](
      r.transferReplica("rg1", "ghost", "docs")).getMessage
      .contains("resource group not found"))
    r.releaseCollection("docs")
    assert(intercept[IllegalArgumentException](
      r.transferReplica("rg1", DefaultName, "docs")).getMessage
      .contains("is not loaded"))
  }

  test("withPool submits the block's jobs under the group's scheduler pool") {
    val r = new Registry
    r.create("tenant_a", Config(0, 0))
    val sc = spark.sparkContext
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
    val (poolInside, n) = r.withPool(spark, "tenant_a") {
      val p = sc.getLocalProperty("spark.scheduler.pool")
      // a real job runs under the pool
      (p, spark.range(100).filter(col("id") % 2 === 0).count())
    }
    assert(poolInside == "tenant_a" && n == 50L)
    assert(sc.getLocalProperty("spark.scheduler.pool") == null) // restored
    // unknown group is the named not-found BEFORE any job is planned
    val e = intercept[IllegalArgumentException](r.withPool(spark, "ghost") { 1 })
    assert(e.getMessage.contains("resource group not found"))
  }
}
