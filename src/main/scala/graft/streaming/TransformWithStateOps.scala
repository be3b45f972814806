package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues,
  ValueState}

import graft.model.{KeyedTuple, Order, SecurityBook, Trade}

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

  /** One price level of one book side: the FIFO queue of resting
    * orders (MapState value; a bare List needs no product encoder). */
  case class PriceLevel(orders: List[Order])

  /** The MatchMaker on `transformWithState`: the reference keeps TWO
    * `MapState<price, pool>` per security (pendingBuyPool /
    * pendingSellPool, InAppStatefulStockExchange.java:99-133) so an
    * order only touches its own price level's state. The
    * flatMapGroupsWithState form ([[graft.operators.OrderBook
    * .streaming]]) serializes the WHOLE book per key per batch; here
    * each side is a named MapState keyed by price in cents, and only
    * the levels an order inserts into / matches against are written
    * back — per-price granular updates, the reference's exact state
    * shape. Matching semantics are identical to
    * [[graft.operators.OrderBook.OrderBookState]] (same filter, D
    * delete with price-0 side scan, pre-open book build, best-crossing
    * FIFO fills priced at the resting order).
    */
  /** The matcher logic shared by [[OrderBookProcessor]] (cold start)
    * and [[BootstrappedOrderBookProcessor]] (file-bootstrapped state —
    * the reference's StateLoader restore path): one implementation of
    * insert/delete/match over the two per-price MapState pools. */
  sealed trait TwsBookLogic { this: StatefulProcessor[String, Order, Trade] =>
    @transient protected var buyPool: MapState[Int, PriceLevel] = _
    @transient protected var sellPool: MapState[Int, PriceLevel] = _

    protected def initPools(): Unit = {
      buyPool = getHandle.getMapState[Int, PriceLevel]("buyPool",
        Encoders.scalaInt, Encoders.product[PriceLevel], TTLConfig.NONE)
      sellPool = getHandle.getMapState[Int, PriceLevel]("sellPool",
        Encoders.scalaInt, Encoders.product[PriceLevel], TTLConfig.NONE)
    }

    protected def side(dir: String): MapState[Int, PriceLevel] =
      if (dir == "B") buyPool else sellPool

    private def queueAt(s: MapState[Int, PriceLevel], p: Int): List[Order] =
      if (s.containsKey(p)) s.getValue(p).orders else Nil

    private def putQueue(s: MapState[Int, PriceLevel], p: Int,
        q: List[Order]): Unit =
      if (q.isEmpty) s.removeKey(p) else s.updateValue(p, PriceLevel(q))

    protected def insert(o: Order): Unit = {
      val s = side(o.tradeDir)
      putQueue(s, o.orderPriceCents, queueAt(s, o.orderPriceCents) :+ o)
    }

    private def removeAt(s: MapState[Int, PriceLevel], price: Int,
        orderNo: String): Unit = {
      val q = queueAt(s, price)
      val i = q.indexWhere(_.orderNo == orderNo)
      if (i >= 0) putQueue(s, price, q.patch(i, Nil, 1))
    }

    private def delete(o: Order): Unit = {
      val s = side(o.tradeDir)
      removeAt(s, o.orderPriceCents, o.orderNo)
      // reference falls back to scanning the whole side when the
      // delete row carries no/odd price (Order_Price 0)
      if (o.orderPriceCents == 0) {
        val prices = { // materialize: removeAt mutates under the iterator
          val b = List.newBuilder[Int]
          val it = s.keys()
          while (it.hasNext) b += it.next()
          b.result()
        }
        prices.foreach(p => removeAt(s, p, o.orderNo))
      }
    }

    private def bestCrossing(opposite: MapState[Int, PriceLevel],
        isBuy: Boolean, limit: Int): Option[Int] = {
      var best = -1
      val it = opposite.keys()
      while (it.hasNext) {
        val p = it.next()
        if (isBuy) { if (p <= limit && (best < 0 || p < best)) best = p }
        else if (p >= limit && (best < 0 || p > best)) best = p
      }
      if (best < 0) None else Some(best)
    }

    private def matchOrder(incoming: Order): List[Trade] = {
      val trades = scala.collection.mutable.ListBuffer.empty[Trade]
      var remaining = incoming.orderVol - incoming.orderExecVol
      val isBuy = incoming.tradeDir == "B"
      val opposite = if (isBuy) sellPool else buyPool
      val ts = Order.hhmmss(incoming.lastUpdTime)
      var done = false
      while (remaining > 0 && !done) {
        bestCrossing(opposite, isBuy, incoming.orderPriceCents) match {
          case None => done = true
          case Some(price) =>
            val queue = queueAt(opposite, price)
            val resting = queue.head
            val restingVol = resting.orderVol - resting.orderExecVol
            val vol = math.min(remaining, restingVol)
            trades += Trade(incoming.secCode,
              buyNo = if (isBuy) incoming.orderNo else resting.orderNo,
              sellNo = if (isBuy) resting.orderNo else incoming.orderNo,
              priceCents = price, volume = vol, tsHHMMSS = ts)
            remaining -= vol
            putQueue(opposite, price,
              if (vol == restingVol) queue.tail
              else resting.copy(orderExecVol = resting.orderExecVol + vol) ::
                queue.tail)
        }
      }
      if (remaining > 0)
        insert(incoming.copy(orderExecVol = incoming.orderVol - remaining))
      trades.toList
    }

    private def process(o: Order): List[Trade] = o.tranMaintCode match {
      case "X" | "" => Nil
      case "D" => delete(o); Nil
      case _ =>
        if (Order.hhmmss(o.lastUpdTime) < Order.ContinuousOpenHHMMSS) {
          // same no-open-volume guard as the OrderBookState twin: a
          // fully-executed pre-open row must not rest (zero/negative
          // trades + remaining inflation on a later cross)
          if (o.orderVol - o.orderExecVol > 0) insert(o)
          Nil
        } else matchOrder(o)
    }

    override def handleInputRows(key: String, rows: Iterator[Order],
        timerValues: TimerValues): Iterator[Trade] = {
      val sorted = rows.toSeq.sortBy(o =>
        (Order.hhmmss(o.lastUpdTime), o.orderNo.length, o.orderNo))
      sorted.flatMap(process).iterator
    }
  }

  /** Cold-start matcher: the book begins empty. */
  final class OrderBookProcessor
    extends StatefulProcessor[String, Order, Trade] with TwsBookLogic {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initPools()
  }

  /** Warm-start matcher: before the first batch, each security's book
    * is rebuilt from a [[graft.model.SecurityBook]] snapshot row — the
    * reference's StateLoader restore semantics (stock/StateLoader.java:
    * 100-128 reloads the MapState before consuming the live stream).
    * Snapshot lists preserve price-level FIFO order, so re-inserting
    * them in sequence reconstructs the exact queues. */
  final class BootstrappedOrderBookProcessor
    extends StatefulProcessorWithInitialState[String, Order, Trade,
      SecurityBook] with TwsBookLogic {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initPools()

    override def handleInitialState(key: String, snap: SecurityBook,
        timerValues: TimerValues): Unit = {
      snap.buys.foreach(insert)
      snap.sells.foreach(insert)
    }
  }

  /** Streaming order-book matching on the TWS MapState form. */
  def orderBook(orders: Dataset[Order]): Dataset[Trade] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .filter(o => o.tranMaintCode != "X" && o.tranMaintCode.nonEmpty)
      .groupByKey(_.secCode)
      .transformWithState(new OrderBookProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming order-book matching warm-started from a state snapshot
    * (the StateLoader path): `initial` carries one row per security
    * with that security's resting orders. */
  def orderBookWarm(orders: Dataset[Order],
      initial: Dataset[SecurityBook]): Dataset[Trade] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .filter(o => o.tranMaintCode != "X" && o.tranMaintCode.nonEmpty)
      .groupByKey(_.secCode)
      .transformWithState(new BootstrappedOrderBookProcessor,
        TimeMode.None(), OutputMode.Append(),
        initial.groupByKey(_.secCode))
  }

  /** Spark conf required by transformWithState. */
  val RocksDbProvider: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}
