package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared test helpers. The suites run against ONE JVM-wide session
  * (SparkTestSession), so conf hygiene and plan walking must exist
  * exactly once — each hand-rolled copy of the save/set/restore
  * pattern is a chance to forget the unset branch and leak a conf
  * into later suites, and each copy of the AQE walker must track new
  * adaptive node types in lockstep. */
object SparkTestUtil {

  /** Set `key` for the body's duration and restore the previous value
    * — including UNSET when there was none (the branch ad-hoc copies
    * forget, poisoning the shared session for every later suite). */
  def withConf[T](spark: SparkSession, key: String, value: String)(
      body: => T): T =
    withConfs(spark, Map(key -> value))(body)

  /** Multi-key form of [[withConf]]. */
  def withConfs[T](spark: SparkSession, confs: Map[String, String])(
      body: => T): T = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** EXECUTED-plan walker that descends into AQE wrapper nodes
    * (AdaptiveSparkPlanExec, query stages) but NOT into a reused
    * exchange's subtree — a reused stage is shared work that runs
    * once, so collecting scans/joins over this walk counts each
    * physical operator exactly as many times as it executes. */
  def walkPlan(pl: SparkPlan): Seq[SparkPlan] = pl match {
    case a: AdaptiveSparkPlanExec => a +: walkPlan(a.executedPlan)
    case q: QueryStageExec => q +: walkPlan(q.plan)
    case r: ReusedExchangeExec => Seq(r)
    case o => o +: o.children.flatMap(walkPlan)
  }
}
