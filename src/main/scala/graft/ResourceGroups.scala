package graft

import org.apache.spark.sql.SparkSession

/** Resource groups — the reference's query-node pooling surface
  * (proxy impl.go:5832-6200 Create/Update/Drop/Describe/List
  * ResourceGroup + TransferNode/TransferReplica; the config/validation
  * contract lives in querycoordv2/meta/resource_manager.go:131-395,
  * 1107-1170; names validated per proxy/util.go:271-293; default group
  * `__default_resource_group` per pkg/common/common.go:200; the group
  * count is capped by quotaAndLimits.limits.maxResourceGroupNumOfQueryNode,
  * default 1024, quota_param.go:1511-1515).
  *
  * Spark-first re-expression: the reference partitions QUERY NODES into
  * groups and routes a loaded collection's replicas to its group's
  * nodes. A single Spark application has no per-node placement — its
  * isolation device is the scheduler pool: jobs submitted under
  * different FAIR pools share the cluster by weight instead of
  * colliding head-of-line. So a resource group here is (a) the
  * reference's full declarative config/validation registry (requests/
  * limits "node" slots, transfer_from/transfer_to edges, the named
  * error strings), and (b) a binding that runs a block's Spark jobs
  * under the group's scheduler pool ([[Registry.withPool]] — the
  * local-property mechanism Spark documents for multi-tenant fairness).
  * Node counts are bookkept capacity slots, exactly as the RPCs
  * exchange them; nothing here pins CPUs, and the scaladoc says so.
  */
object ResourceGroups {

  /** pkg/common/common.go:200 */
  val DefaultName = "__default_resource_group"

  /** quota_param.go:1515 default */
  val MaxGroups = 1024

  /** rgpb.ResourceGroupConfig: requests/limits node counts plus the
    * declarative transfer edges (node sources/sinks for auto-recover).
    */
  final case class Config(
      requests: Int,
      limits: Int,
      transferFrom: Seq[String] = Nil,
      transferTo: Seq[String] = Nil)

  final case class GroupInfo(name: String, config: Config, nodes: Int,
      loadedCollections: Seq[String])

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** ValidateResourceGroupName (proxy/util.go:271-293): non-empty,
    * leading underscore/letter, then letters/digits/underscores only.
    */
  def validateName(name: String): Unit = {
    if (name.isEmpty) fail("resource group name couldn't be empty")
    val invalid = s"Invalid resource group name $name."
    val first = name.head
    if (first != '_' && !first.isLetter) fail(
      s"$invalid the first character of a resource group name must be an underscore or letter")
    if (!name.tail.forall(c => c == '_' || c.isLetterOrDigit)) fail(
      s"$invalid resource group name can only contain numbers, letters and underscores")
  }

  /** The resource-group registry of one deployment. `totalNodes` is the
    * capacity pool the default group starts holding (the reference's
    * default group absorbs every registered query node on startup).
    */
  final class Registry(totalNodes: Int = 1) {
    private val lock = new Object

    // default group: requests 0, unbounded limits (resource_manager.go
    // newResourceGroup for the default rg), holding all capacity
    private var groups: Map[String, Config] =
      Map(DefaultName -> Config(0, Int.MaxValue))
    private var nodes: Map[String, Int] = Map(DefaultName -> totalNodes)
    // collection replica placement (TransferReplica's subject)
    private var placements: Map[String, String] = Map.empty

    /** validateResourceGroupConfig (resource_manager.go:1107-1138). */
    private def validateConfig(name: String, cfg: Config): Unit = {
      def illegal(reason: String): Nothing =
        fail(s"resource group illegal config: $name, $reason")
      if (cfg.requests < 0 || cfg.limits < 0)
        illegal("node num in `requests` or `limits` should not less than 0")
      if (cfg.limits < cfg.requests)
        illegal("limits node num should not less than requests node num")
      (cfg.transferFrom ++ cfg.transferTo).foreach(validateName)
      cfg.transferFrom.foreach { g =>
        if (g == name) illegal(s"resource group in `TransferFrom` $name should not be itself")
        if (!groups.contains(g)) illegal(s"resource group in `TransferFrom` $g not exist")
      }
      cfg.transferTo.foreach { g =>
        if (g == name) illegal(s"resource group in `TransferTo` $name should not be itself")
        if (!groups.contains(g)) illegal(s"resource group in `TransferTo` $g not exist")
      }
    }

    /** CreateResourceGroup: idempotent when the config is identical
      * (CheckIfResourceGroupAddable's "ignored" promise); the same name
      * with a DIFFERENT config is the named already-exist error.
      */
    def create(name: String, cfg: Config): Unit = lock.synchronized {
      validateName(name)
      groups.get(name) match {
        case Some(existing) =>
          if (existing == cfg) () // idempotent no-op
          else fail(
            s"resource group already exist, but create with different config: $name")
        case None =>
          if (groups.size >= MaxGroups)
            fail(s"resource group num reach limit: $name, limit: $MaxGroups")
          validateConfig(name, cfg)
          groups += name -> cfg
          nodes += name -> 0
      }
    }

    /** UpdateResourceGroups: every named group must exist and every new
      * config must validate BEFORE any is applied (the declarative
      * alter is all-or-nothing).
      */
    def update(rgs: Map[String, Config]): Unit = lock.synchronized {
      rgs.foreach { case (name, cfg) =>
        if (!groups.contains(name)) fail(s"resource group not found: $name")
        validateConfig(name, cfg)
      }
      groups ++= rgs
    }

    /** DropResourceGroup (validateResourceGroupIsDeletable
      * resource_manager.go:1140-1170): never the default group; only a
      * group drained to limits=0 with no nodes and no transfer edge
      * pointing at it. Dropping a missing group is the reference's
      * idempotent success.
      */
    def drop(name: String): Unit = lock.synchronized {
      if (name == DefaultName) fail("default resource group is not deletable")
      if (!groups.contains(name)) return // idempotent
      if (groups(name).limits != 0)
        fail(s"resource group's limits node num is not 0: $name")
      if (nodes.getOrElse(name, 0) != 0)
        fail(s"node is still in the resource group: $name")
      groups.foreach { case (g, cfg) =>
        if (cfg.transferFrom.contains(name)) fail(
          s"resource group $name is used by $g's `TransferFrom`, remove that configuration first")
        if (cfg.transferTo.contains(name)) fail(
          s"resource group $name is used by $g's `TransferTo`, remove that configuration first")
      }
      if (placements.values.exists(_ == name))
        fail(s"resource group $name still serves loaded collections")
      groups -= name
      nodes -= name
    }

    def list: Seq[String] = lock.synchronized(groups.keys.toSeq.sorted)

    def describe(name: String): GroupInfo = lock.synchronized {
      val cfg = groups.getOrElse(name, fail(s"resource group not found: $name"))
      GroupInfo(name, cfg, nodes.getOrElse(name, 0),
        placements.collect { case (c, g) if g == name => c }.toSeq.sorted)
    }

    /** TransferNode (CheckIfTransferNode resource_manager.go:340-389):
      * moves capacity slots and rewrites both configs exactly as the
      * compatibility path does — source requests (and limits, unless
      * source is the default group) shrink clamped at 0; target
      * requests grow and push its limits up when they would cross.
      */
    def transferNode(source: String, target: String, num: Int): Unit =
      lock.synchronized {
        validateName(source); validateName(target)
        if (source == target) fail(
          s"source resource group and target resource group should not be the same, resource group: $source")
        if (num <= 0) fail(s"invalid NumNode $num")
        val srcCfg = groups.getOrElse(source, fail(s"resource group not found: $source"))
        val tgtCfg = groups.getOrElse(target, fail(s"resource group not found: $target"))
        val have = nodes.getOrElse(source, 0)
        if (have < num) fail(
          s"resource group node not enough: $source, has: $have, need: $num")
        val newSrc = srcCfg.copy(
          requests = math.max(0, srcCfg.requests - num),
          limits =
            if (source == DefaultName) srcCfg.limits
            else math.max(0, srcCfg.limits - num))
        val grownReq = tgtCfg.requests + num
        val newTgt = tgtCfg.copy(requests = grownReq,
          limits = math.max(tgtCfg.limits, grownReq))
        groups += source -> newSrc
        groups += target -> newTgt
        nodes += source -> (have - num)
        nodes += target -> (nodes.getOrElse(target, 0) + num)
      }

    /** Record a collection load into a group (LoadCollection's
      * resource_groups argument).
      */
    def loadCollection(collection: String, group: String = DefaultName): Unit =
      lock.synchronized {
        if (!groups.contains(group)) fail(s"resource group not found: $group")
        placements += collection -> group
      }

    def releaseCollection(collection: String): Unit =
      lock.synchronized { placements -= collection }

    /** TransferReplica (impl.go:6044-6101): both names validate, both
      * groups exist, and the collection must currently be served by the
      * source group.
      */
    def transferReplica(source: String, target: String,
        collection: String): Unit = lock.synchronized {
      validateName(source); validateName(target)
      if (!groups.contains(source)) fail(s"resource group not found: $source")
      if (!groups.contains(target)) fail(s"resource group not found: $target")
      placements.get(collection) match {
        case Some(g) if g == source => placements += collection -> target
        case Some(g) => fail(
          s"collection $collection is not loaded in resource group $source (in $g)")
        case None => fail(s"collection $collection is not loaded")
      }
    }

    /** Run `body` with this group's scheduler pool as the job-submit
      * context: every Spark job the block triggers lands in the pool
      * named after the group (under FAIR scheduling, pools share the
      * cluster by weight — the single-application analogue of the
      * reference's per-group node placement). The previous pool is
      * restored afterwards, nesting-safe.
      */
    def withPool[T](spark: SparkSession, group: String)(body: => T): T = {
      lock.synchronized {
        if (!groups.contains(group)) fail(s"resource group not found: $group")
      }
      val sc = spark.sparkContext
      val prev = sc.getLocalProperty("spark.scheduler.pool")
      sc.setLocalProperty("spark.scheduler.pool", group)
      try body
      finally sc.setLocalProperty("spark.scheduler.pool", prev)
    }
  }
}
