package graft.controlplane

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.KeyedTuple

class KeygroupRouterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("explicit keygroup assignment controls partition placement") {
    import spark.implicits._
    val data = (0 until 1000).map(i => KeyedTuple(s"K$i", i.toLong))
    val ds = spark.createDataset(data)
    // all keygroups to partition 0 except keygroup 0 → partition 1
    val assignment = Vector.tabulate(128)(kg => if (kg == 0) 1 else 0)
    val routed = KeygroupRouter.route[KeyedTuple](ds, _.key, assignment, 2)
    val inv = KeygroupRouter.partitionInventory[KeyedTuple](routed, _.key)
    assert(inv.getOrElse(1, Set.empty).subsetOf(Set(0)))
    assert(!inv.getOrElse(0, Set.empty).contains(0))
    // no rows lost in routing
    assert(routed.count() === 1000)
  }

  test("over-range assignment clamps crash-free AND counts each clamp") {
    // stale post-scale-in plans clamp silently-but-visibly: the
    // partitioner must keep the shuffle alive (last partition) while
    // the accumulator records every clamp so a PERSISTENTLY mis-built
    // assignment can't hide behind the scale-in tolerance
    val acc = spark.sparkContext.longAccumulator("test.clamps")
    val part = new KeygroupRouter.AssignedKeygroupPartitioner(
      Array(0, 5, 1, 7), numPartitions = 2, clampCount = Some(acc))
    assert(part.getPartition(0) === 0) // in range: untouched, uncounted
    assert(part.getPartition(1) === 1) // 5 >= 2 -> clamp
    assert(part.getPartition(2) === 1) // in range (== last partition)
    assert(part.getPartition(3) === 1) // 7 >= 2 -> clamp
    assert(acc.value === 2L, "only genuine clamps may count")
    // outside the assignment range stays a loud error
    intercept[IllegalArgumentException](part.getPartition(4))
  }

  test("round-robin remap balances keygroups (PerformanceEvaluator policy)") {
    val rr = KeygroupRouter.roundRobin(128, 4)
    assert(rr.toSet === Set(0, 1, 2, 3))
    assert(rr.count(_ == 0) === 32)
  }

  test("load-balance controller remaps on skew") {
    // task 0 carries keygroups 0..63 with heavy load; expect a remap
    val desc = OperatorDescriptor.contiguous("op", 2, "countV1", 128)
    val plan = QueryPlanDescriptor(128, Map("op" -> desc))
    var staged: Vector[Int] = desc.keygroupAssignment
    var executed = false
    val exec = new ReconfigurationExecutor {
      def getPlan: QueryPlanDescriptor = plan
      def assignExecutionLogic(o: String, u: String): Unit = ()
      def assignResources(o: String, p: Int): Unit = ()
      def assignWorkload(o: String, a: Vector[Int]): Unit = { staged = a }
      def execute(reason: String): ReconfigReport = {
        executed = true
        ReconfigReport(reason, Map.empty, plan, plan)
      }
    }
    val ctl = new LoadBalanceController("op")
    // keygroup 0 is hot: 1000 rows; everything else 1 row
    val load = Map(0 -> 1000L) ++ (1 until 128).map(_ -> 1L).toMap
    val r = ctl.onBatch(exec, 0L, load)
    assert(r.isDefined && executed)
    // hot keygroup isolated: the other task takes most cold groups
    val hotTask = staged(0)
    val coldOnHot = (1 until 128).count(kg => staged(kg) == hotTask)
    assert(coldOnHot < 32, s"hot task still carries $coldOnHot cold groups")
  }
}
