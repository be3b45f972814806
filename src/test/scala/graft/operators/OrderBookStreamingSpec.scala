package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Trade
import graft.sources.OrderReplaySource

/** End-to-end order-book pipeline: synthetic SSE-style order file →
  * streaming replay → stateful matching; must equal the batch twin. */
class OrderBookStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming order book over file replay == batch twin") {
    val dir = Files.createTempDirectory("orders").toString
    OrderReplaySource.writeSyntheticOrders(s"$dir/orders.txt",
      Seq("S1", "S2", "S3"), ordersPerSec = 120)

    val batchTrades = OrderBook
      .batch(OrderReplaySource.readFile(spark, s"$dir/orders.txt"))
      .collect().sortBy(t => (t.secCode, t.tsHHMMSS, t.buyNo, t.sellNo))

    assert(batchTrades.nonEmpty, "fixture produced no trades")

    val stream = OrderBook.streaming(
      OrderReplaySource.readStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("ob_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      val streamTrades = spark.table("ob_stream").as[Trade]
        .collect().sortBy(t => (t.secCode, t.tsHHMMSS, t.buyNo, t.sellNo))
      assert(streamTrades.toSeq === batchTrades.toSeq)
    } finally q.stop()
  }
}
