package graft.controlplane

import org.scalatest.funsuite.AnyFunSuite

/** Pure policy tests for the built-in controller set (the streaming
  * wiring is covered by ControlLoopSpec / ReconfigurationSpec). */
class ControllerPoliciesSpec extends AnyFunSuite {

  private final class FakeExecutor(initialParallelism: Int)
    extends ReconfigurationExecutor {
    var plan: QueryPlanDescriptor = QueryPlanDescriptor(128, Map("op" ->
      OperatorDescriptor.contiguous("op", initialParallelism, "countV1", 128)))
    var executed: List[String] = Nil
    def getPlan: QueryPlanDescriptor = plan
    def assignExecutionLogic(o: String, u: String): Unit =
      plan = plan.withOperator(plan.operators(o).copy(udfName = u))
    def assignResources(o: String, p: Int): Unit =
      plan = plan.withOperator(
        OperatorDescriptor.contiguous(o, p, plan.operators(o).udfName, 128))
    def assignWorkload(o: String, a: Vector[Int]): Unit =
      plan = plan.withOperator(plan.operators(o).copy(keygroupAssignment = a))
    def execute(reason: String): ReconfigReport = {
      executed ::= reason
      ReconfigReport(reason, Map.empty, plan, plan)
    }
  }

  test("periodic controller fires every N batches with round-robin remap") {
    val ex = new FakeExecutor(4)
    val ctl = new PeriodicReconfigController("op", everyNBatches = 3)
    assert(ctl.onBatch(ex, 0, Map.empty).isEmpty) // never at batch 0
    assert(ctl.onBatch(ex, 2, Map.empty).isDefined) // -1 -> 2 ≥ 3? 2-(-1)=3 ✓
    assert(ctl.onBatch(ex, 3, Map.empty).isEmpty) // only 1 since last
    assert(ctl.onBatch(ex, 5, Map.empty).isDefined)
    assert(ex.plan.operators("op").keygroupAssignment ===
      KeygroupRouter.roundRobin(128, 4))
  }

  test("scaling controller scales out on high load, in on low") {
    val ex = new FakeExecutor(2)
    val ctl = new ScalingController("op",
      highRowsPerTask = 100, lowRowsPerTask = 10)
    // 300 rows over 2 tasks = 150/task > 100 → scale out to 3
    val up = ctl.onBatch(ex, 1, Map(0 -> 300L))
    assert(up.isDefined && ex.plan.operators("op").parallelism === 3)
    // 15 rows over 3 tasks = 5/task < 10 → scale in to 2
    val down = ctl.onBatch(ex, 2, Map(0 -> 15L))
    assert(down.isDefined && ex.plan.operators("op").parallelism === 2)
    // steady load: no action
    assert(ctl.onBatch(ex, 3, Map(0 -> 100L)).isEmpty)
    // empty metrics: no action
    assert(ctl.onBatch(ex, 4, Map.empty).isEmpty)
  }
}
