package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ONE definition of each windowed event query's semantics, applied by
  * BOTH execution modes: the batch twins (EventQueries, oracle-gated)
  * call these on `Tables.events` and add their total ORDER BY; the
  * streaming twins (graft.streaming.EventStream) call them on the
  * replayed stream with watermarks attached via the `prep` hooks.
  *
  * This object exists because the two modes previously carried
  * hand-copied expression trees that had already drifted (the
  * streaming tumbling query silently lost the `total` sum the batch
  * twin computes, and the parity spec had to `.drop("total")` to
  * compare). With the core shared, a semantics change lands on both
  * sides by construction and the parity suite compares full rows.
  */
object EventSemantics {

  private val dec = "decimal(18,2)"

  /** Q5 analog — tumbling hourly counts + value total per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** Q11 analog — built-in session windows (30 min gap) per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"))

  /** Q3 analog — filtered events ⋈ broadcast customer dim. */
  def dimJoin(events: DataFrame, customer: DataFrame): DataFrame = {
    val c = customer.filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    events.filter(col("event_type") === "purchase")
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"))
  }

  /** Q8 analog — signups ⋈ purchases in the same tumbling hour. `prep`
    * readies each side for its mode (streaming: attach the watermark;
    * batch: identity) — it runs BEFORE the window/join expressions so
    * the join semantics themselves stay mode-independent. */
  def windowJoin(events: DataFrame,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    val signups = prep(events.filter(col("event_type") === "signup"))
      .select(col("user_id").as("su_user"), col("ts").as("su_ts"),
        window(col("ts"), "1 hour").getField("start").as("su_win"),
        col("event_id").as("su_event"))
    val purchases = prep(events.filter(col("event_type") === "purchase"))
      .select(col("user_id").as("pu_user"), col("ts").as("pu_ts"),
        window(col("ts"), "1 hour").getField("start").as("pu_win"),
        col("event_id").as("pu_event"))
    signups.join(purchases,
        col("su_user") === col("pu_user") && col("su_win") === col("pu_win"))
      .select(col("su_user").as("user_id"),
        date_format(col("su_win"), "yyyy-MM-dd HH:00").as("hour"),
        col("su_event"), col("pu_event"))
  }

  /** Interval-join analog — purchases within 30 min after a click by
    * the same user; the bound doubles as the streaming state-eviction
    * constraint. */
  def intervalJoin(events: DataFrame,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    val clicks = prep(events.filter(col("event_type") === "click"))
      .select(col("user_id").as("cu"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = prep(events.filter(col("event_type") === "purchase"))
      .select(col("user_id").as("pu"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(purchases,
        col("cu") === col("pu") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("cu").as("user_id"), col("click_id"), col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("purchase_ts"),
        col("value"))
  }
}
