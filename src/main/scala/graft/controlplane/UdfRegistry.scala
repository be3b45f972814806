package graft.controlplane

import scala.collection.concurrent.TrieMap

/** Versioned registry of named execution logic — the Spark-side
  * change-of-logic mechanism (reference `assignExecutionLogic`,
  * TriskImpl.java:163-176 and task-side swap
  * StreamJobGraphUpdater.java:67-100).
  *
  * A live UDF-object swap is impossible in Spark (closures are
  * serialized into the running query), so — per SURVEY §3.2 — the
  * semantic equivalent is: stop trigger, rebind name → new impl here,
  * restart from checkpoint. State survives as long as the state schema
  * is unchanged, the same constraint the reference imposes.
  *
  * Count logic signature: (key, previousCount, batchRows) ⇒ newCount.
  */
object UdfRegistry {
  type CountLogic = (String, Long, Long) => Long

  private val fns = TrieMap[String, CountLogic](
    // v1: plain running count (StatefulWordCount semantics)
    "countV1" -> ((_, prev, n) => prev + n),
    // v2: double-weighted count (the reference hot-swaps e.g.
    // IncreaseComputationOverheadMap variants,
    // flinkapp/StatefulDemoLongRun.java:125-160)
    "countV2" -> ((_, prev, n) => prev + 2 * n))

  def register(name: String, fn: CountLogic): Unit = fns.put(name, fn)
  def apply(name: String): CountLogic = fns(name)
  def names: Set[String] = fns.keySet.toSet
}
