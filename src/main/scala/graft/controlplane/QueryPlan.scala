package graft.controlplane

/** The job abstraction the control plane manipulates — the analog of
  * the reference's Trisk abstraction (reference
  * controlplane/streammanager/abstraction/TriskImpl.java:40-54 and
  * controlplane/abstraction/OperatorDescriptor.java:18-103): per
  * operator → parallelism, execution logic (UDF), key-group
  * distribution, and resource hints.
  */
case class OperatorDescriptor(
    name: String,
    parallelism: Int,
    udfName: String,
    /** keygroup → task(partition) assignment; contiguous ranges by
      * default, arbitrary after a remap
      * (AssignedKeyGroupStreamPartitioner.java:15-50). */
    keygroupAssignment: Vector[Int]) {
  def keygroupsOf(task: Int): Seq[Int] =
    keygroupAssignment.zipWithIndex.collect { case (t, kg) if t == task => kg }
}

object OperatorDescriptor {
  /** Default contiguous range assignment
    * (KeyGroupRangeAssignment.computeOperatorIndexForKeyGroup). */
  def contiguous(name: String, parallelism: Int, udfName: String,
      maxParallelism: Int): OperatorDescriptor =
    OperatorDescriptor(name, parallelism, udfName,
      Vector.tabulate(maxParallelism)(kg => kg * parallelism / maxParallelism))
}

case class QueryPlanDescriptor(
    maxParallelism: Int,
    operators: Map[String, OperatorDescriptor]) {
  def withOperator(op: OperatorDescriptor): QueryPlanDescriptor =
    copy(operators = operators + (op.name -> op))
}

/** Report of one applied reconfiguration (phase timings in ms) — the
  * ReconfigurationProfiler surface
  * (util/profiling/ReconfigurationProfiler.java:31-90). */
case class ReconfigReport(
    reason: String,
    phasesMs: Map[String, Double],
    planBefore: QueryPlanDescriptor,
    planAfter: QueryPlanDescriptor)
