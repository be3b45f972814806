package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal) join: for each left row, the right row with the
  * greatest right-time ≤ left-time on the same key — the standard
  * enrich-with-latest-state operator of temporal analytics.
  *
  * Spark has no built-in as-of join; the scalable formulation here is
  * union-and-sweep: tag both sides, sort within each key by
  * (time, right-before-left-on-ties), and carry the latest right
  * payload forward with `last(..., ignoreNulls)` over a running
  * window. ONE shuffle on the key, a per-partition sort, no point
  * range-probing — the plan that survives a 100× scale-up (vs. the
  * naive inequality join, which explodes to a range cross product).
  */
object AsofJoin {

  /** Concrete instance over the test tables: the latest order at or
    * before each event, per user (left-outer semantics). */
  def asofLatestOrder(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"))

    val left = e.select(col("user_id").as("k"), col("ts").as("t"),
      col("event_id"),
      lit(null).cast("timestamp").as("rdate"), lit(0).as("is_right"))
    val right = o.select(col("o_custkey").as("k"),
      col("o_orderdate").as("t"),
      lit(null).cast("long").as("event_id"),
      col("o_orderdate").as("rdate"), lit(1).as("is_right"))

    // rights sort before lefts at equal time ⇒ "at or before" inclusive
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    left.unionByName(right)
      .withColumn("matched", last(col("rdate"), ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("event_id"), col("k").as("user_id"),
        unix_millis(col("matched")).as("last_order_ms"))
      .orderBy(col("event_id"))
  }

  /** Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofLatestOrderSql: String =
    """SELECT e.event_id, e.user_id, epoch_ms(o.o_orderdate) AS last_order_ms
      |FROM events e ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_latest_order" -> (asofLatestOrder _))

  val oracles: Map[String, String] = Map(
    "asof_latest_order" -> asofLatestOrderSql)
}
