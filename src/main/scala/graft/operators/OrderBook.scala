package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Order, Trade}

/** Per-security limit-order-book matching — the reference's hardest
  * stateful operator (`MatchMaker`,
  * reference stock/InAppStatefulStockExchange.java:99-459 with pools
  * stock/OrderPool.java:1-39).
  *
  * Semantics reproduced:
  *  - `Tran_Maint_Code` "X"/"" rows are dropped (filter :143-145),
  *    "D" deletes the referenced order from its side's pool (:297-345),
  *    anything else is an add;
  *  - rows with HHMMSS < 92500 only build the book (pre-open);
  *    later rows trigger continuous matching (:211-290);
  *  - matching crosses buy ≥ sell, FIFO within a price level, partial
  *    fills update the resting order in place; the trade prices at the
  *    resting order's price.
  *
  * The book state holds plain immutable maps (price → FIFO list) and
  * picks the best crossing price at match time: mutable sorted
  * collections do NOT survive the state store's Kryo round-trip (they
  * deserialize as plain HashMaps and crash on the SortedMap
  * interface), and per-security price-level counts are small enough
  * that an O(levels) min/max beats maintaining a sorted structure.
  *
  * The core is a pure per-key fold (`OrderBookState.process`), so the
  * same logic backs (a) the streaming operator
  * (`flatMapGroupsWithState` keyed by secCode — state moves with the
  * shuffle partition, so rescaling Spark-side re-distributes books
  * automatically) and (b) a deterministic batch twin (groupByKey +
  * flatMapGroups over time-sorted orders).
  */
object OrderBook {

  /** One side of the book: price → FIFO queue of resting orders. */
  type Side = Map[Int, List[Order]]

  case class BookSnapshot(buys: List[Order], sells: List[Order])

  final class OrderBookState extends Serializable {
    var buyPool: Side = Map.empty
    var sellPool: Side = Map.empty

    private def getSide(dir: String): Side =
      if (dir == "B") buyPool else sellPool

    private def setSide(dir: String, s: Side): Unit =
      if (dir == "B") buyPool = s else sellPool = s

    private def insert(o: Order): Unit = {
      val p = getSide(o.tradeDir)
      setSide(o.tradeDir,
        p.updated(o.orderPriceCents,
          p.getOrElse(o.orderPriceCents, Nil) :+ o))
    }

    private def removeFrom(s: Side, price: Int, orderNo: String): Side = {
      s.get(price) match {
        case Some(q) =>
          val trimmed = {
            val i = q.indexWhere(_.orderNo == orderNo)
            if (i < 0) q else q.patch(i, Nil, 1)
          }
          if (trimmed.isEmpty) s - price else s.updated(price, trimmed)
        case None => s
      }
    }

    private def delete(o: Order): Unit = {
      var p = removeFrom(getSide(o.tradeDir), o.orderPriceCents, o.orderNo)
      // reference falls back to scanning the whole side when the
      // delete row carries no/odd price (Order_Price 0)
      if (o.orderPriceCents == 0)
        p.keys.toList.foreach { price =>
          p = removeFrom(p, price, o.orderNo)
        }
      setSide(o.tradeDir, p)
    }

    /** Match an incoming order against the opposite side; returns the
      * trades and leaves any residual volume resting in the book. */
    private def matchOrder(incoming: Order): List[Trade] = {
      val trades = mutable.ListBuffer.empty[Trade]
      var remaining = incoming.orderVol - incoming.orderExecVol
      val isBuy = incoming.tradeDir == "B"
      val ts = Order.hhmmss(incoming.lastUpdTime)

      def bestCrossing: Option[Int] = {
        val opposite = if (isBuy) sellPool else buyPool
        val crossing =
          if (isBuy) opposite.keysIterator.filter(_ <= incoming.orderPriceCents)
          else opposite.keysIterator.filter(_ >= incoming.orderPriceCents)
        if (!crossing.hasNext) None
        else Some(if (isBuy) crossing.min else crossing.max)
      }

      var done = false
      while (remaining > 0 && !done) {
        bestCrossing match {
          case None => done = true
          case Some(price) =>
            val opposite = if (isBuy) sellPool else buyPool
            val queue = opposite(price)
            val resting = queue.head
            val restingVol = resting.orderVol - resting.orderExecVol
            val vol = math.min(remaining, restingVol)
            trades += Trade(incoming.secCode,
              buyNo = if (isBuy) incoming.orderNo else resting.orderNo,
              sellNo = if (isBuy) resting.orderNo else incoming.orderNo,
              priceCents = price, volume = vol, tsHHMMSS = ts)
            remaining -= vol
            val newQueue =
              if (vol == restingVol) queue.tail
              else resting.copy(orderExecVol = resting.orderExecVol + vol) ::
                queue.tail
            val newSide =
              if (newQueue.isEmpty) opposite - price
              else opposite.updated(price, newQueue)
            if (isBuy) sellPool = newSide else buyPool = newSide
        }
      }
      if (remaining > 0)
        insert(incoming.copy(orderExecVol = incoming.orderVol - remaining))
      trades.toList
    }

    /** Process one order; returns emitted trades. */
    def process(o: Order): List[Trade] = o.tranMaintCode match {
      case "X" | "" => Nil // filtered upstream too; defensive
      case "D" => delete(o); Nil
      case _ =>
        if (Order.hhmmss(o.lastUpdTime) < Order.ContinuousOpenHHMMSS) {
          // pre-open: book build only. A fully-executed row
          // (exec >= vol — real SSE feeds carry them) has no open
          // volume and must NOT rest: a later crossing order would
          // match it for a zero/negative-volume trade, and the
          // negative case INFLATES the incoming side's remaining
          // (remaining -= vol with vol < 0), corrupting the book. The
          // post-open path already drops such rows via its
          // remaining > 0 guard — this makes the two phases agree.
          if (o.orderVol - o.orderExecVol > 0) insert(o)
          Nil
        } else matchOrder(o)
    }

    def snapshot: BookSnapshot = BookSnapshot(
      buyPool.toList.sortBy(-_._1).flatMap(_._2),
      sellPool.toList.sortBy(_._1).flatMap(_._2))
  }

  /** Fold a time-ordered sequence of orders through a fresh book. */
  def processAll(orders: Iterator[Order]): (OrderBookState, List[Trade]) = {
    val st = new OrderBookState
    val trades = orders.flatMap(st.process).toList
    (st, trades)
  }

  /** Batch form: per-security matching over time-sorted orders. */
  def batch(orders: Dataset[Order]): Dataset[Trade] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .filter(o => o.tranMaintCode != "X" && o.tranMaintCode.nonEmpty)
      .groupByKey(_.secCode)
      .flatMapGroups { (_, os) =>
        val sorted = os.toSeq.sortBy(o =>
          (Order.hhmmss(o.lastUpdTime), o.orderNo.length, o.orderNo))
        processAll(sorted.iterator)._2
      }
  }

  /** Streaming form: keyed state per security, matching incrementally
    * across micro-batches. Within a batch, orders are applied in
    * event-time order (the reference relies on Kafka per-key ordering;
    * the sort keeps replay deterministic). */
  def streaming(orders: Dataset[Order]): Dataset[Trade] = {
    val spark = orders.sparkSession
    import spark.implicits._
    implicit val stateEnc = org.apache.spark.sql.Encoders.kryo[OrderBookState]
    orders
      .filter(o => o.tranMaintCode != "X" && o.tranMaintCode.nonEmpty)
      .groupByKey(_.secCode)
      .flatMapGroupsWithState[OrderBookState, Trade](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, os, state: GroupState[OrderBookState]) =>
          val st = state.getOption.getOrElse(new OrderBookState)
          val sorted = os.toSeq.sortBy(o =>
            (Order.hhmmss(o.lastUpdTime), o.orderNo.length, o.orderNo))
          val trades = sorted.flatMap(st.process)
          state.update(st)
          trades.iterator
      }
  }
}
