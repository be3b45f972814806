package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Order, SecurityBook}
import graft.operators.OrderBook

/** Order-book state bootstrap — the reference's `StateLoader` job
  * (stock/StateLoader.java:25-128): persist a warm matcher state to a
  * file and start a new stream from it instead of replaying the whole
  * day. Spark-first shape: the snapshot is a parquet table of
  * [[SecurityBook]] rows (one per security, distributed write/read —
  * no driver materialization), and restore rides `transformWithState`'s
  * initial-state channel, so the books land exactly on the state-store
  * partitions that will own their keys.
  *
  * Usage: `snapshotFromReplay` (or any upstream job) produces the
  * state table → `save` → later `load` + [[TransformWithStateOps
  * .orderBookWarm]].
  */
object StateLoader {

  /** Deterministic book state after replaying `orders`: per security,
    * fold the time-sorted orders through the matcher and keep what
    * rests. Same fold as [[OrderBook.batch]], keeping the book instead
    * of the trades. */
  def snapshotFromReplay(orders: Dataset[Order]): Dataset[SecurityBook] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .filter(o => o.tranMaintCode != "X" && o.tranMaintCode.nonEmpty)
      .groupByKey(_.secCode)
      .mapGroups { (sec, os) =>
        val sorted = os.toSeq.sortBy(o =>
          (Order.hhmmss(o.lastUpdTime), o.orderNo.length, o.orderNo))
        val (st, _) = OrderBook.processAll(sorted.iterator)
        val snap = st.snapshot
        SecurityBook(sec, snap.buys, snap.sells)
      }
  }

  /** Persist a snapshot (the reference's state file). */
  def save(snapshot: Dataset[SecurityBook], path: String): Unit =
    snapshot.write.mode("overwrite").parquet(path)

  /** Load a persisted snapshot. */
  def load(spark: SparkSession, path: String): Dataset[SecurityBook] = {
    import spark.implicits._
    spark.read.parquet(path).as[SecurityBook]
  }
}
