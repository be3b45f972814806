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

  /** Resolve by name. On a registry miss, fall back to the SHIPPED
    * form of runtime-compiled logic: [[DynamicCompiler]]'s jar path
    * compiles a submission into class
    * `graft.dynamic.CountLogicGen_<name>` and ships the jar with
    * `SparkContext.addJar` — on an executor JVM the in-memory registry
    * is empty, but the class IS on the task's context classloader
    * (Spark's mutable URL classloader includes shipped jars), so it is
    * instantiated once here and cached. Names that resolve neither way
    * fail fast with the registry's unknown-name error, as before. */
  def apply(name: String): CountLogic =
    fns.getOrElse(name, resolveShipped(name).getOrElse(fns(name)))

  def names: Set[String] = fns.keySet.toSet

  /** Fully-qualified class prefix of jar-shipped compiled logic —
    * shared convention with [[DynamicCompiler.compileCountLogicJar]]. */
  val ShippedClassPrefix = "graft.dynamic.CountLogicGen_"

  private def resolveShipped(name: String): Option[CountLogic] =
    if (!name.matches("[A-Za-z_][A-Za-z0-9_]*")) None
    else try {
      val loader = Option(Thread.currentThread.getContextClassLoader)
        .getOrElse(getClass.getClassLoader)
      val cls = Class.forName(ShippedClassPrefix + name, true, loader)
      val fn = cls.getDeclaredConstructor().newInstance()
        .asInstanceOf[() => CountLogic].apply()
      fns.putIfAbsent(name, fn)
      Some(fn)
    } catch { case _: ClassNotFoundException => None }
}
