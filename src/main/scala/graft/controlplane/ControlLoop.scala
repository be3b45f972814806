package graft.controlplane

import graft.streaming.Metrics.ProgressCollector

/** The closed control loop: per-batch metrics (from the `observe()`
  * channel) feed a [[Controller]], whose decisions drive the
  * [[ReconfigurationExecutor]] — the Spark realization of the
  * reference's StreamSwitch loop (reference
  * controlplane/rescale/streamswitch/StreamSwitch.java:22-218:
  * retrieve per-keygroup rates each interval, decide scale/migration).
  *
  * `tick()` drains new batch progress records and offers each to the
  * controller; reconfigurations apply between micro-batches (the
  * executor's sync barrier), so the loop is safe to run from any
  * driver-side cadence (a timer thread, or after processAllAvailable
  * in tests).
  */
final class ControlLoop(
    executor: ReconfigurationExecutor,
    controller: Controller,
    collector: ProgressCollector) {

  private var consumed = 0
  private val reportsBuf = List.newBuilder[ReconfigReport]

  /** Offer unseen batch metrics to the controller; returns any
    * reconfiguration applied during this tick. */
  def tick(): Option[ReconfigReport] = {
    val ps = collector.progresses
    val fresh = ps.drop(consumed)
    consumed = ps.size
    val applied = fresh.flatMap { p =>
      controller.onProgress(executor, p)
    }
    applied.foreach(reportsBuf += _)
    applied.lastOption
  }

  def reports: List[ReconfigReport] = reportsBuf.result()
}
