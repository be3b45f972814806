package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

import graft.model.KeyedTuple

/** Operators on Spark 4's `transformWithState` API — the direct
  * analog of the reference's RichFunction/ProcessFunction surface (typed
  * per-key ValueState/ListState/MapState with timers, SURVEY §2.11).
  *
  * `flatMapGroupsWithState` (used by the other operators) carries one
  * state object per key; `transformWithState` exposes the reference's
  * *named multi-state* model (MyStatefulMap's MapState,
  * ProcessorFunction's counter, the order book's dual pools map
  * naturally onto named state variables). Requires the RocksDB state
  * store provider.
  */
object TransformWithStateOps {

  /** Per-key running count — CountWords on the TWS API
    * (reference StatefulWordCount.java:102-133). */
  final class RunningCountProcessor
    extends StatefulProcessor[String, KeyedTuple, KeyedTuple] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedTuple],
        timerValues: TimerValues): Iterator[KeyedTuple] = {
      val prev = if (count.exists()) count.get() else 0L
      val next = prev + rows.size
      count.update(next)
      Iterator.single(KeyedTuple(key, next))
    }
  }

  def runningCount(tuples: Dataset[KeyedTuple]): Dataset[KeyedTuple] = {
    val spark = tuples.sparkSession
    import spark.implicits._
    tuples.groupByKey(_.key)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Spark conf required by transformWithState. */
  val RocksDbProvider: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}
