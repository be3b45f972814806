package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel stage state for [[FunnelStream.funnelStages]] —
  * top-level case class: keyed state must survive the state store's
  * serde round-trip (immutable, public). */
case class FunnelState(mv: Option[Long], mc: Option[Long], mp: Option[Long])

/** Streaming form of the ordered funnel (BehaviorQueries.funnel): a
  * per-user stage machine in keyed state — the reference computes the
  * same thing as a keyed ProcessorFunction holding per-key progress.
  *
  * Within each micro-batch the group's events are sorted by event
  * time before the stage machine runs, so results equal the batch
  * window form whenever a user's funnel-relevant events arrive in the
  * same micro-batch or in event-time order across batches (the file
  * replay used in tests delivers one batch; a production deployment
  * would put a watermark-sized sort buffer in front, which is what
  * the reference's event-time timers amount to). */
object FunnelStream {

  /** (user_id, first view, first click after, first purchase after)
    * as epoch-µs, updated per micro-batch. */
  def funnelStages(events: DataFrame): Dataset[(Long, Option[Long],
      Option[Long], Option[Long])] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, String, Long)],
            state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          it.toSeq.sortBy(_._3).foreach { case (_, typ, ts) =>
            if (typ == "view" && st.mv.isEmpty)
              st = st.copy(mv = Some(ts))
            else if (typ == "click" && st.mc.isEmpty && st.mv.exists(ts > _))
              st = st.copy(mc = Some(ts))
            else if (typ == "purchase" && st.mp.isEmpty && st.mc.exists(ts > _))
              st = st.copy(mp = Some(ts))
          }
          state.update(st)
          Iterator((uid, st.mv, st.mc, st.mp))
        })
  }
}
