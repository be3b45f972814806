package graft.sources

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.KeyedTuple

/** Oracle-embedding workload — the reference's invariance test pattern
  * (reference flinkapp/test/TestingWorkload.java:189-300: the source
  * emits `(key, expectedRunningCount)` and the stateful operator
  * compares its own state against the embedded oracle, so any state
  * loss/duplication across a reconfiguration surfaces as a mismatch).
  */
object OracleWorkload {

  /** Deterministic tuples: the i-th occurrence of a key carries i
    * (1-based) as the expected running count, round-robin over keys —
    * the shape of the reference's MySource. */
  def tuples(nKeys: Int, rounds: Int): Seq[KeyedTuple] =
    (1 to rounds).flatMap(r => (0 until nKeys).map(k =>
      KeyedTuple(s"A$k", r.toLong)))

  /** Stateful verifier: counts per key and emits one mismatch line per
    * tuple whose embedded expectation disagrees with the state. An
    * empty output stream is a passing run. */
  def verify(in: Dataset[KeyedTuple]): Dataset[String] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[Long, String](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = List.newBuilder[String]
          // within a batch, apply in embedded-order (the oracle value)
          rows.toSeq.sortBy(_.value).foreach { t =>
            n += 1
            if (t.value != n)
              out += s"MISMATCH key=$key expected=${t.value} state=$n"
          }
          state.update(n)
          out.result().iterator
      }
  }
}
