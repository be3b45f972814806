package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.KeyedTuple

/** Keyed stateful operators mirroring the reference's per-key state
  * surface (SURVEY §2.5). */
object StatefulOps {

  /** State of the payload micro-bench operator. */
  case class Payload(count: Long, payload: Array[Byte])

  /** Count-window buffer. */
  case class Buf(count: Int, sum: Long)

  /** Per-key running count — the reference's `CountWords` ReducingState
    * (StatefulWordCount.java:102-133) / `sum(1)` rolling aggregate.
    * Emits the updated count for each key touched in the batch. */
  def runningCount(words: Dataset[String]): Dataset[KeyedTuple] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.groupByKey(identity)
      .flatMapGroupsWithState[Long, KeyedTuple](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single(KeyedTuple(key, n))
      }
  }

  /** Two-input word count — the reference's CoFlatMapFunction
    * tokenizer over two text streams feeding one running count
    * (TwoInputsWordCount.java:50-96): union the sources, tokenize,
    * count per word incrementally. */
  def twoInputWordCount(lines1: Dataset[String], lines2: Dataset[String])
      : Dataset[KeyedTuple] = {
    val spark = lines1.sparkSession
    import spark.implicits._
    val words = lines1.unionByName(lines2)
      .flatMap(_.toLowerCase.split("\\W+"))
      .filter(_.nonEmpty)
    runningCount(words)
  }

  /** Per-key payload state of configurable size — the reference's
    * `MyStatefulMap` micro-bench operator
    * (StatefulDemoLongRun.java:82-123): holds `perKeySize` bytes per
    * key, returns the per-key touch count. Used to measure
    * state-migration/scale-out cost. */
  def statefulPayload(tuples: Dataset[KeyedTuple], perKeyBytes: Int)
      : Dataset[KeyedTuple] = {
    val spark = tuples.sparkSession
    import spark.implicits._
    tuples.groupByKey(_.key)
      .flatMapGroupsWithState[Payload, KeyedTuple](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Payload]) =>
          val prev = state.getOption.getOrElse(
            Payload(0L, new Array[Byte](perKeyBytes)))
          val n = prev.count + rows.size
          state.update(Payload(n, prev.payload))
          Iterator.single(KeyedTuple(key, n))
      }
  }

  /** Count windows of size n with a reduce — reference
    * `countWindow(10).reduce` (TestingWorkload.java:109-117): buffer n
    * elements per key, emit the reduction when full. */
  def countWindowReduce(tuples: Dataset[KeyedTuple], n: Int)
      : Dataset[KeyedTuple] = {
    val spark = tuples.sparkSession
    import spark.implicits._
    tuples.groupByKey(_.key)
      .flatMapGroupsWithState[Buf, KeyedTuple](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Buf]) =>
          var buf = state.getOption.getOrElse(Buf(0, 0L))
          val out = List.newBuilder[KeyedTuple]
          rows.foreach { t =>
            buf = Buf(buf.count + 1, buf.sum + t.value)
            if (buf.count == n) {
              out += KeyedTuple(key, buf.sum)
              buf = Buf(0, 0L)
            }
          }
          state.update(buf)
          out.result().iterator
      }
  }

  /** Timestamped event for session windowing. */
  case class TimedEvent(key: Long, ts: Timestamp)

  case class SessionOut(key: Long, count: Long, isFinal: Boolean)

  /** Hand-rolled session state (public: Catalyst codegen must be able
    * to reach the constructor when (de)serializing state rows). */
  case class SessionState(start: Long, lastTs: Long, count: Long,
      sinceFire: Long)

  /** Per-key state: ALL concurrently-open sessions. A single-session
    * state mishandles in-horizon out-of-order events — an event more
    * than `gap` BEFORE the open session's span must open its own
    * session (and may later be bridged into a merge), not be absorbed
    * into the newer one. The list is bounded by the watermark horizon:
    * a session closes as soon as `lastTs + gap` falls at/behind the
    * watermark, so at most ~(watermark delay / gap) + 1 sessions are
    * ever open per key. */
  case class SessionList(sessions: List[SessionState])

  /** Session window (gap-based) with count-based early firing —
    * Nexmark Q11's `EventTimeSessionWindows.withGap` +
    * `MaxLogEventsTrigger` (reference Query11.java:72-144): the session
    * aggregate fires early every `maxEvents` events (FIRE) and fires
    * and purges at session end (event-time timeout past gap).
    *
    * Structured Streaming's built-in `session_window` cannot fire
    * early, so this is a faithful hand-rolled session over
    * flatMapGroupsWithState with EventTimeTimeout. Requires a watermark
    * on `ts` upstream.
    */
  def sessionWithEarlyFire(events: Dataset[TimedEvent], gapMs: Long,
      maxEvents: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionList, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessionList]) =>
          val out = List.newBuilder[SessionOut]
          var sessions: List[SessionState] =
            state.getOption.map(_.sessions).getOrElse(Nil)
          // a session is final once no admissible future event can
          // extend it: events at/below the watermark are dropped
          // upstream, so lastTs + gap <= watermark seals it. This is
          // the ONLY close rule — the old code also closed eagerly on
          // an intra-batch gap, which mis-finalized sessions a later
          // in-horizon event could still bridge.
          def closeSealed(): Unit = {
            val wm = state.getCurrentWatermarkMs()
            val (dead, live) = sessions.partition(_.lastTs + gapMs <= wm)
            dead.sortBy(_.start)
              .foreach(s => out += SessionOut(key, s.count, true))
            sessions = live
          }
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              // the event extends every session within gap of its
              // span — touching two sessions BRIDGES them (Flink's
              // merging session windows, the reference's Q11 shape)
              val (touched, rest) = sessions.partition(s =>
                t >= s.start - gapMs && t <= s.lastTs + gapMs)
              var cur = touched match {
                case Nil => SessionState(t, t, 1L, 1L)
                case ss => SessionState(
                  math.min(ss.map(_.start).min, t),
                  math.max(ss.map(_.lastTs).max, t),
                  ss.map(_.count).sum + 1,
                  ss.map(_.sinceFire).sum + 1)
              }
              if (cur.sinceFire >= maxEvents) {
                out += SessionOut(key, cur.count, false) // early FIRE
                cur = cur.copy(sinceFire = 0L)
              }
              sessions = cur :: rest
            }
          }
          closeSealed()
          if (sessions.isEmpty) state.remove()
          else {
            state.update(SessionList(sessions))
            // earliest seal point among open sessions; closeSealed
            // just guaranteed every survivor is strictly above the
            // watermark, which setTimeoutTimestamp requires
            state.setTimeoutTimestamp(
              sessions.map(_.lastTs + gapMs).min)
          }
          out.result().iterator
      }
  }
}
