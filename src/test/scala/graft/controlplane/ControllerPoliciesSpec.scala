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
    // the controller keeps its own monotonic observed-batch clock —
    // one onBatch call per progress — because Spark batch ids RESTART
    // at 0 after every non-routing reconfig
    assert(ctl.onBatch(ex, 0, Map.empty).isEmpty) // 1 observed
    assert(ctl.onBatch(ex, 1, Map.empty).isEmpty) // 2 observed
    assert(ctl.onBatch(ex, 2, Map.empty).isDefined) // 3 observed: fires
    // batch ids restart after the reconfig (new generation, new
    // checkpoint): the period must stay N, never stall for the
    // pre-restart id range
    assert(ctl.onBatch(ex, 0, Map.empty).isEmpty)
    assert(ctl.onBatch(ex, 1, Map.empty).isEmpty)
    assert(ctl.onBatch(ex, 2, Map.empty).isDefined)
    assert(ex.plan.operators("op").keygroupAssignment ===
      KeygroupRouter.roundRobin(128, 4))
  }

  private def progress(batchId: Long, kgRows: Map[Int, Long],
      durationMs: Long = 1000) =
    graft.streaming.Metrics.BatchProgress(batchId,
      kgRows.values.sum, kgRows.values.sum.toDouble, durationMs, kgRows)

  test("stream-switch migrates when repacking meets the target utilization") {
    val ex = new FakeExecutor(2)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 120,
      emaAlpha = 1.0)
    // contiguous(2): kg<64 → task0. λ(task0)=90+20+20=130 → util 1.08;
    // greedy repack bounds the bottleneck at 90 → util 0.75 ≤ 0.8.
    // 1.08 is MODERATE pressure (≤ severeOverloadUtil 1.1), so the
    // restart-costing action needs scaleOutConsecutive (=2) pressured
    // windows — one transient window buys no restart in either
    // direction
    val win = progress(1, Map(0 -> 90L, 1 -> 20L, 2 -> 20L, 64 -> 20L))
    assert(ctl.onProgress(ex, win).isEmpty)
    val r = ctl.onProgress(ex,
      progress(2, Map(0 -> 90L, 1 -> 20L, 2 -> 20L, 64 -> 20L)))
    assert(r.isDefined && r.get.reason.contains("migrate"))
    val a = ex.plan.operators("op").keygroupAssignment
    assert(ex.plan.operators("op").parallelism === 2)
    // the hot keygroup sits alone; the three warm ones share the other task
    assert(a(1) != a(0) && a(2) != a(0) && a(64) != a(0))
  }

  test("stream-switch scales out when migration cannot meet the target") {
    val ex = new FakeExecutor(2)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0)
    // four 60 rows/s groups: any pack with fewer than 4 tasks doubles
    // a task up to ≥120 (util 1.2 > 0.8) — the smallest FEASIBLE
    // parallelism is 4 (one group per task, util 0.6), and the policy
    // must jump there in ONE decision, not walk 2→3→4 through two
    // stop/restart cycles
    val r = ctl.onProgress(ex,
      progress(1, Map(0 -> 60L, 1 -> 60L, 2 -> 60L, 64 -> 60L)))
    assert(r.isDefined && r.get.reason.contains("scale-out 2->4"))
    assert(ex.plan.operators("op").parallelism === 4)
  }

  test("stream-switch scales in when the load fits fewer tasks") {
    val ex = new FakeExecutor(4)
    // settleBatches = 0: this test exercises consecutive POLICY
    // decisions on clean steady-state windows (no restart between them)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0, settleBatches = 0)
    // 20 rows/s total over 3 remaining tasks → util 0.07 < 0.5; the
    // smallest feasible parallelism (20 rows/s packs onto one task at
    // util 0.2 ≤ 0.8) is 1 — the policy jumps straight there instead
    // of draining one restart per interval. But shrinking is
    // HYSTERESIS-gated (scaleInConsecutive = 3 by default): one
    // transient low window must NOT release resources — a live load
    // run measured a single 0.49 dip that shrank 22→14 and was
    // reversed two windows later, costing two restarts for nothing.
    val low = Map(0 -> 10L, 64 -> 10L)
    assert(ctl.onProgress(ex, progress(1, low)).isEmpty)
    assert(ctl.onProgress(ex, progress(2, low)).isEmpty)
    assert(ex.plan.operators("op").parallelism === 4)
    val r = ctl.onProgress(ex, progress(3, low))
    assert(r.isDefined && r.get.reason.contains("scale-in 4->1"))
    assert(ex.plan.operators("op").parallelism === 1)
    // and holds there: p=1 cannot shrink further
    val r2 = ctl.onProgress(ex, progress(4, low))
    assert(r2.isEmpty && ex.plan.operators("op").parallelism === 1)
    // a healthy-band window resets the streak: after it, two more low
    // windows are again not enough... (p=1 can't shrink, so assert via
    // a fresh controller at p=4)
    val ex2 = new FakeExecutor(4)
    val ctl2 = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0, settleBatches = 0)
    assert(ctl2.onProgress(ex2, progress(1, low)).isEmpty)
    assert(ctl2.onProgress(ex2, progress(2, low)).isEmpty)
    // util 140/300 = 0.47 < 0.5 over p-1? No: healthy window — rates
    // jump to 70/70, mean over 3 tasks = 140/300 ≈ 0.467 — still low;
    // use a genuinely in-band load (maxUtil ≤ 0.8, mean ≥ 0.5):
    assert(ctl2.onProgress(ex2,
      progress(3, Map(0 -> 80L, 64 -> 80L))).isEmpty)
    assert(ctl2.onProgress(ex2, progress(4, low)).isEmpty)
    assert(ctl2.onProgress(ex2, progress(5, low)).isEmpty)
    assert(ex2.plan.operators("op").parallelism === 4)
    assert(ctl2.onProgress(ex2, progress(6, low)).isDefined)
  }

  test("stream-switch never scales in when the shrunk pack would breach target") {
    // 10 keygroups at 44 rows/s, one per task at p=10: maxUtil 0.44 ≤
    // 0.8 (no migrate), mean over p−1=9 tasks is 440/900 ≈ 0.489 < 0.5
    // — the mean-only rule would shrink. But any 9-task pack of 10
    // equal groups doubles one task up: bottleneck 88 → util 0.88 >
    // 0.8, which next interval would force scale-out right back
    // (stop/restart oscillation every metrics interval). The packed-
    // bottleneck gate must refuse the shrink and hold the plan still.
    val ex = new FakeExecutor(10)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0)
    val load = (0 until 10).map(i => i * 13 -> 44L).toMap
    // run PAST the scale-in hysteresis (3 consecutive low windows) so
    // the refusal under test is the packed-bottleneck gate itself, not
    // the streak counter
    for (b <- 1 to 5) {
      val r = ctl.onProgress(ex, progress(b, load))
      assert(r.isEmpty, s"batch $b")
      assert(ex.plan.operators("op").parallelism === 10, s"batch $b")
    }
  }

  test("stream-switch holds steady inside the utilization band") {
    val ex = new FakeExecutor(2)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0)
    // λ = [70, 70]: util 0.7 ≤ 0.8, and 140/(100·1) = 1.4 ≥ 0.5
    assert(ctl.onProgress(ex,
      progress(1, Map(0 -> 70L, 64 -> 70L))).isEmpty)
    assert(ex.plan.operators("op").parallelism === 2)
  }

  test("stream-switch discards the post-restart catch-up window") {
    val ex = new FakeExecutor(2)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0)
    val steady = Map(0 -> 60L, 1 -> 60L, 2 -> 60L, 64 -> 60L)
    // overload at p=2: jump to the smallest feasible parallelism (4)
    assert(ctl.onProgress(ex, progress(1, steady)).isDefined)
    assert(ex.plan.operators("op").parallelism === 4)
    // the restart replays the downtime backlog: a 10× burst window.
    // The naive estimator read this as demand — walking the live loop
    // to 24 tasks where 15 was optimal — so a post-action window must
    // be DISCARDED outright: no decision, no plan change, and the
    // burst never enters the EMA.
    val burst = steady.view.mapValues(_ * 10).toMap
    assert(ctl.onProgress(ex, progress(2, burst)).isEmpty)
    assert(ex.plan.operators("op").parallelism === 4)
    // converged: 60 per task at p=4 is util 0.6 ≤ 0.8 and the load
    // does not fit 3 tasks under the scale-in bar — the plan holds,
    // with no residue of the burst
    assert(ctl.onProgress(ex, progress(3, steady)).isEmpty)
    assert(ex.plan.operators("op").parallelism === 4)
    // and the steady load keeps holding the plan still
    assert(ctl.onProgress(ex, progress(4, steady)).isEmpty)
    assert(ex.plan.operators("op").parallelism === 4)
  }

  test("control loop applies at most one action per tick") {
    val ex = new FakeExecutor(2)
    val ctl = new StreamSwitchController("op", serviceRatePerTask = 100,
      emaAlpha = 1.0, settleBatches = 0)
    val loop = new ControlLoop(ex, ctl,
      new graft.streaming.Metrics.ProgressCollector)
    val overload = Map(0 -> 60L, 1 -> 60L, 2 -> 60L, 64 -> 60L)
    // three overloaded windows drained in ONE tick: all measured under
    // the p=2 plan — acting on each would chain three stale-data
    // scale-outs. Exactly one may apply.
    val r = loop.offer(List(
      progress(1, overload), progress(2, overload), progress(3, overload)))
    assert(r.isDefined)
    assert(ex.plan.operators("op").parallelism === 4)
    assert(loop.reports.size === 1)
  }

  test("fraud-detection controller escalates logic on load spike, " +
    "de-escalates after cooldown") {
    val ex = new FakeExecutor(2)
    val ctl = new FraudDetectionController("op",
      triggerRowsPerBatch = 1000, baseUdf = "countV1",
      escalatedUdf = "strictV2", cooldownBatches = 2)
    // below trigger: nothing
    assert(ctl.onBatch(ex, 1, Map(0 -> 500L)).isEmpty)
    // spike: escalate exactly once
    assert(ctl.onBatch(ex, 2, Map(0 -> 1500L)).isDefined)
    assert(ex.plan.operators("op").udfName === "strictV2")
    assert(ctl.onBatch(ex, 3, Map(0 -> 2000L)).isEmpty)
    // one quiet batch: still escalated (cooldown not reached)
    assert(ctl.onBatch(ex, 4, Map(0 -> 100L)).isEmpty)
    assert(ex.plan.operators("op").udfName === "strictV2")
    // a new spike resets the cooldown counter
    assert(ctl.onBatch(ex, 5, Map(0 -> 1500L)).isEmpty)
    assert(ctl.onBatch(ex, 6, Map(0 -> 100L)).isEmpty)
    // second consecutive quiet batch: de-escalate
    assert(ctl.onBatch(ex, 7, Map(0 -> 100L)).isDefined)
    assert(ex.plan.operators("op").udfName === "countV1")
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
