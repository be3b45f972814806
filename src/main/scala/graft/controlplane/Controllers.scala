package graft.controlplane

import scala.collection.mutable

/** Built-in controllers — the counterparts of the reference's
  * controller set (reference udm/: DummyController, TestingController
  * :59-230 scripted scale in/out/rebalance, PerformanceEvaluator
  * :40-62 periodic remap/rescale/logic tests, StreamSwitch
  * controlplane/rescale/streamswitch/StreamSwitch.java:22-218
  * metrics-driven scaling).
  *
  * A controller observes per-batch metrics and drives the
  * [[ReconfigurationExecutor]]. It runs driver-side; `onBatch` is
  * invoked from the progress listener between micro-batches.
  */
trait Controller {
  def name: String
  def onBatch(executor: ReconfigurationExecutor, batchId: Long,
      rowsPerKeygroup: Map[Int, Long]): Option[ReconfigReport]
}

/** Never reconfigures (DummyController). */
final class DummyController extends Controller {
  val name = "dummy"
  def onBatch(e: ReconfigurationExecutor, b: Long,
      m: Map[Int, Long]): Option[ReconfigReport] = None
}

/** Scripted reconfiguration scenarios — TestingController: a list of
  * (afterBatch, action) pairs applied in order. */
final class TestingController(
    script: Seq[(Long, ReconfigurationExecutor => Unit)])
  extends Controller {
  val name = "testing"
  private val pending = mutable.Queue(script.sortBy(_._1): _*)

  def onBatch(executor: ReconfigurationExecutor, batchId: Long,
      m: Map[Int, Long]): Option[ReconfigReport] = {
    if (pending.nonEmpty && batchId >= pending.head._1) {
      val (_, action) = pending.dequeue()
      action(executor)
      Some(executor.execute(s"$name@batch$batchId"))
    } else None
  }
}

/** Periodic reconfiguration exerciser — the PerformanceEvaluator
  * (reference udm/PerformanceEvaluator.java:40-62: fires a remap /
  * rescale / logic test every interval; round-robin remap policy at
  * :149-176). Used to measure reconfiguration cost under load. */
final class PeriodicReconfigController(operator: String,
    everyNBatches: Long, maxParallelism: Int = 128)
  extends Controller {
  val name = "performance-evaluator"
  private var last = -1L

  def onBatch(executor: ReconfigurationExecutor, batchId: Long,
      m: Map[Int, Long]): Option[ReconfigReport] = {
    if (batchId == 0 || batchId - last < everyNBatches) return None
    last = batchId
    val p = executor.getPlan.operators(operator).parallelism
    executor.assignWorkload(operator,
      KeygroupRouter.roundRobin(maxParallelism, p))
    Some(executor.execute(s"$name@batch$batchId round-robin remap"))
  }
}

/** ±1 scaling on sustained load change — the StockController policy
  * (reference udm/StockController.java:41-78: rebalance-all or scale
  * by one task when per-task load crosses thresholds). */
final class ScalingController(operator: String,
    highRowsPerTask: Long, lowRowsPerTask: Long,
    maxParallelismTasks: Int = 32)
  extends Controller {
  val name = "scaling"

  def onBatch(executor: ReconfigurationExecutor, batchId: Long,
      rowsPerKeygroup: Map[Int, Long]): Option[ReconfigReport] = {
    val total = rowsPerKeygroup.values.sum
    if (total == 0) return None
    val desc = executor.getPlan.operators(operator)
    val perTask = total.toDouble / desc.parallelism
    val target =
      if (perTask > highRowsPerTask && desc.parallelism < maxParallelismTasks)
        desc.parallelism + 1
      else if (perTask < lowRowsPerTask && desc.parallelism > 1)
        desc.parallelism - 1
      else desc.parallelism
    if (target == desc.parallelism) return None
    executor.assignResources(operator, target)
    Some(executor.execute(
      s"$name@batch$batchId ${desc.parallelism} -> $target (perTask=$perTask)"))
  }
}

/** Load-balancing policy in the spirit of StreamSwitch: if the hottest
  * task carries more than `imbalanceFactor` × the mean keygroup load,
  * remap keygroups to tasks by greedy bin packing of observed rates. */
final class LoadBalanceController(operator: String, parallelism: Int,
    maxParallelism: Int = 128, imbalanceFactor: Double = 1.5)
  extends Controller {
  val name = "load-balance"

  def onBatch(executor: ReconfigurationExecutor, batchId: Long,
      rowsPerKeygroup: Map[Int, Long]): Option[ReconfigReport] = {
    if (rowsPerKeygroup.isEmpty) return None
    val plan = executor.getPlan
    val desc = plan.operators(operator)
    val perTask = desc.keygroupAssignment.zipWithIndex
      .groupBy(_._1)
      .view.mapValues(_.map { case (_, kg) =>
        rowsPerKeygroup.getOrElse(kg, 0L) }.sum)
      .toMap
    val total = perTask.values.sum.toDouble
    if (total == 0) return None
    val mean = total / desc.parallelism
    val hottest = perTask.values.maxOption.getOrElse(0L)
    if (hottest <= imbalanceFactor * mean) return None

    // greedy rebalance: sort keygroups by observed load desc, assign
    // each to the currently lightest task
    val loads = Array.fill(parallelism)(0L)
    val newAssign = new Array[Int](maxParallelism)
    val byLoad = (0 until maxParallelism)
      .sortBy(kg => -rowsPerKeygroup.getOrElse(kg, 0L))
    byLoad.foreach { kg =>
      val task = loads.zipWithIndex.minBy(_._1)._2
      newAssign(kg) = task
      loads(task) += rowsPerKeygroup.getOrElse(kg, 0L)
    }
    executor.assignWorkload(operator, newAssign.toVector)
    Some(executor.execute(s"$name@batch$batchId imbalance=${hottest / mean}"))
  }
}
