package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Replay of the driver's `events` table through Structured Streaming,
  * plus the streaming forms of the windowed event queries (SURVEY §2.6).
  * The transforms are the same DataFrame expressions as the batch twins
  * in EventQueries — one definition of query semantics, two execution
  * modes.
  */
object EventStream {

  /** Streaming read of the events table (file-replay source — the
    * analog of the reference's SSERealRateSourceFunction file replay,
    * stock/sources/SSERealRateSourceFunctionKV.java:14-100).
    *
    * Schema-adaptive like Tables.events: a batch peek at the file
    * supplies the streaming schema, and the ns→µs shim is applied only
    * when the file's `ts` loads as long (old TIMESTAMP(NANOS)
    * testdata); current timestamp[us] files stream through untouched. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(fileSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ReplayStaging.stage(s"$dir/events.parquet"))
    // ONE shim for both readers: the batch loader and this streaming
    // reader must stay vintage-for-vintage identical or the
    // batch/stream parity tests compare different instants
    graft.Tables.tsShim(raw)
  }

  /** Streaming hourly tumbling counts (Q5 analog) with a watermark;
    * same aggregation expression as EventQueries.e5TumblingHourly. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"))

  /** Streaming session windows per user (Q11 built-in variant). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"))

  /** Windowed stream-stream join (Q8 analog): signups ⋈ purchases in
    * the same hour, with watermarks on both sides (built-in SS
    * stream-stream join; reference Query8.java:101-120). */
  def windowJoin(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("su_user"), col("ts").as("su_ts"),
        window(col("ts"), "1 hour").getField("start").as("su_win"),
        col("event_id").as("su_event"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("pu_user"), col("ts").as("pu_ts"),
        window(col("ts"), "1 hour").getField("start").as("pu_win"),
        col("event_id").as("pu_event"))
    signups.join(purchases,
      col("su_user") === col("pu_user") && col("su_win") === col("pu_win"))
      .select(col("su_user").as("user_id"),
        date_format(col("su_win"), "yyyy-MM-dd HH:00").as("hour"),
        col("su_event"), col("pu_event"))
  }

  /** Stream-static dimension join (Nexmark Q3 as stream⋈table): the
    * static customer dim is broadcast into every micro-batch — no
    * state, no watermark needed; the streaming twin of
    * EventQueries.e3JoinDim. At scale the dim re-broadcasts per
    * batch; a slowly-changing dim would swap in via the per-batch
    * supplier pattern (DynamicRules.streaming). */
  def dimJoin(events: DataFrame, spark: SparkSession,
      dir: String): DataFrame = {
    val c = graft.Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    events.filter(col("event_type") === "purchase")
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"))
  }

  /** Time-interval stream-stream join (Flink interval-join analog):
    * purchases within 30 minutes after a click by the same user. The
    * time bound doubles as the state-eviction constraint — each
    * side's buffered rows are dropped once the other side's watermark
    * passes the interval, so join state is bounded by rate × 30 min,
    * not by history. Batch twin: EventQueries.eIntervalJoin. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("pu"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(purchases,
        col("cu") === col("pu") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("cu").as("user_id"), col("click_id"), col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("value"))
  }
}
