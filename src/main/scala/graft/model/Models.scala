package graft.model

import java.sql.Timestamp

/** Typed data model of the engine's streaming surface.
  *
  * Nexmark entities mirror the reference's vendored Beam model
  * (reference: examples/src/main/java/Nexmark/sources/generator/model/
  * BidGenerator.java:45-72, PersonGenerator.java:58-67,
  * AuctionGenerator.java); the stock `Order` mirrors
  * stock/Order.java:10-66 (prices as int cents, volumes truncated to
  * int); `KeyedTuple` mirrors the test sources of
  * flinkapp/StatefulDemoLongRun.java:162-230.
  */
case class Bid(auction: Long, bidder: Long, price: Long,
    dateTime: Timestamp, extra: String)

case class Person(id: Long, name: String, emailAddress: String,
    creditCard: String, city: String, state: String,
    dateTime: Timestamp, extra: String)

case class Auction(id: Long, itemName: String, description: String,
    initialBid: Long, reserve: Long, dateTime: Timestamp,
    expires: Timestamp, seller: Long, category: Long, extra: String)

/** Stock-exchange order (pipe-separated SSE line; field indices per
  * reference stock/InAppStatefulStockExchange.java:31-38; parse
  * semantics per stock/Order.java:32-46 EXCEPT the price: the
  * reference truncates ×100 to int cents, which loses one cent on
  * every 2-decimal price whose double product rounds down
  * ("10.97" → 1096) — parse() deliberately ROUNDS instead (see the
  * comment in [[Order.parse]]); volumes truncate like the
  * reference. */
case class Order(orderNo: String, tranMaintCode: String,
    lastUpdTime: String, orderPriceCents: Int, orderExecVol: Int,
    orderVol: Int, secCode: String, tradeDir: String)

object Order {
  /** Parse one pipe-separated SSE line. */
  def parse(line: String): Order = {
    val f = line.split("\\|", -1)
    Order(
      orderNo = f(0),
      tranMaintCode = f(1),
      lastUpdTime = f(2),
      // round, don't truncate: decimal price strings are not exactly
      // representable as doubles ("10.97".toDouble * 100 =
      // 1096.999…, truncating to 1096 — one cent off the written
      // price); rounding recovers the intended cents for every
      // 2-decimal string. Empty field → 0, the same guard the volume
      // fields need (real SSE rows carry empty numerics on
      // delete/cancel lines).
      orderPriceCents =
        if (f(3).isEmpty) 0 else math.round(f(3).toDouble * 100).toInt,
      orderExecVol = if (f(4).isEmpty) 0 else f(4).toDouble.toInt,
      orderVol = if (f(5).isEmpty) 0 else f(5).toDouble.toInt,
      secCode = f(6),
      tradeDir = f(7))
  }

  /** Continuous-auction open: HHMMSS 09:25:00 (rows before it only
    * build the book; reference InAppStatefulStockExchange.java:143-160). */
  val ContinuousOpenHHMMSS = 92500

  def hhmmss(t: String): Int = t.replace(":", "").toInt
}

/** A matched trade emitted by the order-book operator. */
case class Trade(secCode: String, buyNo: String, sellNo: String,
    priceCents: Int, volume: Int, tsHHMMSS: Int)

/** One security's persisted book snapshot — the state-file row of the
  * order-book bootstrap (reference stock/StateLoader.java:100-128
  * warm-loads the matcher's MapState before consuming the stream).
  * `buys`/`sells` hold the resting orders with their partial-fill
  * progress, best-price-first, FIFO within a price level. */
case class SecurityBook(secCode: String, buys: List[Order],
    sells: List[Order])

/** Oracle-embedding keyed tuple (key, expected running count) used by
  * the invariance-under-reconfiguration tests (reference
  * flinkapp/test/TestingWorkload.java:228-290). */
case class KeyedTuple(key: String, value: Long)

/** Dynamic-rule model (reference
  * megaphone/dynamicrules/ControlMessage.java:33-122). */
case class Rule(ruleId: Int, ruleState: String,
    groupingKeyNames: Seq[String], aggregateFieldName: String,
    aggregatorFunctionType: String, limitOperatorType: String,
    limit: BigDecimal, windowMinutes: Int)

case class Alert(ruleId: Int, key: String, triggeringValue: BigDecimal)

/** Thrown by operators that REFUSE an input by design (e.g. the exact
  * all-pairs form past its row cap, where the LSH-bucketed sibling is
  * the scale path). Distinct from genuine failures so the bench can
  * report "skipped by design" instead of an error sentinel. */
class DesignedSkip(msg: String) extends RuntimeException(msg)
