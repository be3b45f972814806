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

  test("order book resumes from checkpoint with book state intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orders-resume").toString
    val checkpoint = Files.createTempDirectory("orders-ckpt").toString
    // file 1: build the book (resting orders, no crossing yet)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part1.txt"),
      "B1|A|09:30:00|100.00|0|100|S1|B\n" +
        "S9|A|09:30:01|101.00|0|50|S1|S\n")

    // memory sink cannot recover from a checkpoint; foreachBatch can
    val trades = new java.util.concurrent.ConcurrentLinkedQueue[Trade]()
    def run() = OrderBook.streaming(
      OrderReplaySource.readStream(spark, dir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Trade], _: Long) =>
        batch.collect().foreach(trades.add)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()

    val q1 = run()
    q1.processAllAvailable()
    assert(trades.isEmpty) // book built, no trades
    q1.stop()

    // file 2 arrives while "down"; restart from the same checkpoint —
    // the sell must cross the RESTING buy from generation 1's state
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part2.txt"),
      "S2|A|09:31:00|99.00|0|60|S1|S\n")
    val q2 = run()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(trades.asScala.toList ===
        List(Trade("S1", "B1", "S2", 10000, 60, 93100)))
    } finally q2.stop()
  }

  /** The transformWithState port (per-price MapState, the reference's
    * exact dual-pool state shape) must produce the identical trade
    * stream. */
  test("TWS MapState order book over file replay == batch twin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orders-tws").toString
    OrderReplaySource.writeSyntheticOrders(s"$dir/orders.txt",
      Seq("S1", "S2", "S3"), ordersPerSec = 120)

    val batchTrades = OrderBook
      .batch(OrderReplaySource.readFile(spark, s"$dir/orders.txt"))
      .collect().sortBy(t => (t.secCode, t.tsHHMMSS, t.buyNo, t.sellNo))
    assert(batchTrades.nonEmpty, "fixture produced no trades")

    val (k, v) = graft.streaming.TransformWithStateOps.RocksDbProvider
    graft.SparkTestUtil.withConf(spark, k, v) {
      val stream = graft.streaming.TransformWithStateOps.orderBook(
        OrderReplaySource.readStream(spark, dir))
      val q = stream.writeStream.format("memory").queryName("ob_tws")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val twsTrades = spark.table("ob_tws").as[Trade]
          .collect().sortBy(t => (t.secCode, t.tsHHMMSS, t.buyNo, t.sellNo))
        assert(twsTrades.toSeq === batchTrades.toSeq)
      } finally q.stop()
    }
  }

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
