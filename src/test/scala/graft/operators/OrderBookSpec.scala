package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Order, Trade}

/** Golden tests for the order-book matcher (pure core). */
class OrderBookSpec extends AnyFunSuite {

  private def o(no: String, code: String, time: String, price: Int,
      vol: Int, dir: String, sec: String = "S1", exec: Int = 0): Order =
    Order(no, code, time, price, exec, vol, sec, dir)

  test("continuous matching: cross, FIFO, partial fill, delete") {
    val orders = Seq(
      o("B1", "A", "09:30:00", 10000, 100, "B"),
      o("S1", "A", "09:30:01", 9900, 60, "S"), // crosses B1 at 100.00
      o("S2", "A", "09:30:02", 10100, 50, "S"), // rests
      o("B2", "A", "09:30:03", 10200, 80, "B"), // takes S2, rests 30
      o("B1", "D", "09:30:04", 10000, 40, "B")) // delete B1 residual
    val (st, trades) = OrderBook.processAll(orders.iterator)
    assert(trades === List(
      Trade("S1", "B1", "S1", 10000, 60, 93001),
      Trade("S1", "B2", "S2", 10100, 50, 93003)))
    val snap = st.snapshot
    assert(snap.sells.isEmpty)
    assert(snap.buys.map(b => (b.orderNo, b.orderVol - b.orderExecVol)) ===
      List(("B2", 30)))
  }

  test("FIFO within a price level") {
    val orders = Seq(
      o("B1", "A", "09:30:00", 10000, 30, "B"),
      o("B2", "A", "09:30:01", 10000, 30, "B"),
      o("S1", "A", "09:30:02", 9900, 40, "S"))
    val (_, trades) = OrderBook.processAll(orders.iterator)
    // B1 fully filled first, then B2 partially
    assert(trades === List(
      Trade("S1", "B1", "S1", 10000, 30, 93002),
      Trade("S1", "B2", "S1", 10000, 10, 93002)))
  }

  test("pre-open builds book without matching") {
    val orders = Seq(
      o("B1", "A", "09:10:00", 10000, 50, "B"),
      o("S1", "A", "09:11:00", 9900, 50, "S")) // would cross, but pre-open
    val (st, trades) = OrderBook.processAll(orders.iterator)
    assert(trades.isEmpty)
    assert(st.snapshot.buys.size === 1 && st.snapshot.sells.size === 1)
  }

  test("X and empty maintenance codes are ignored") {
    val orders = Seq(
      o("B1", "A", "09:30:00", 10000, 50, "B"),
      o("S1", "X", "09:30:01", 9900, 50, "S"),
      o("S2", "", "09:30:02", 9900, 50, "S"))
    val (_, trades) = OrderBook.processAll(orders.iterator)
    assert(trades.isEmpty)
  }

  test("batch operator matches pure fold per security") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val orders = Seq(
      o("B1", "A", "09:30:00", 10000, 100, "B"),
      o("S1", "A", "09:30:01", 9900, 60, "S"),
      o("B9", "A", "09:30:00", 5000, 10, "B", sec = "S2"),
      o("S9", "A", "09:30:01", 5000, 10, "S", sec = "S2"))
    val got = OrderBook.batch(spark.createDataset(orders))
      .collect().sortBy(_.secCode).toList
    assert(got === List(
      Trade("S1", "B1", "S1", 10000, 60, 93001),
      Trade("S2", "B9", "S9", 5000, 10, 93001)))
  }
}
