package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.{Order, Trade}
import graft.operators.OrderBook
import graft.sources.OrderReplaySource

/** StateLoader semantics (reference stock/StateLoader.java:25-128): a
  * matcher warm-started from a persisted book snapshot must emit the
  * same trades for the rest of the day as one that replayed from the
  * origin — the reference's StatefulStockExchange restore contract. */
class OrderBookWarmStartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sortKey(t: Trade) =
    (t.secCode, t.tsHHMMSS, t.buyNo, t.sellNo, t.priceCents, t.volume)

  test("warm-started book emits the same trades as replay-from-origin") {
    import spark.implicits._
    val root = Files.createTempDirectory("orders-warm").toString
    val fullFile = s"$root/full/orders.txt"
    OrderReplaySource.writeSyntheticOrders(fullFile, Seq("S1", "S2", "S3"),
      ordersPerSec = 120)

    // split the day at a mid-session cut: prefix is "already processed
    // before the restart", suffix is "the live stream after it"
    val cut = 93030
    val lines = Files.readAllLines(Paths.get(fullFile)).asScala.toList
      .filter(_.nonEmpty)
    val (pre, post) = lines.partition(l =>
      Order.hhmmss(l.split("\\|")(2)) < cut)
    assert(pre.nonEmpty && post.nonEmpty, "cut must split the fixture")
    val preFile = s"$root/pre/orders.txt"
    val postDir = s"$root/post"
    Files.createDirectories(Paths.get(s"$root/pre"))
    Files.createDirectories(Paths.get(postDir))
    Files.writeString(Paths.get(preFile), pre.mkString("\n") + "\n")
    Files.writeString(Paths.get(s"$postDir/orders.txt"),
      post.mkString("\n") + "\n")

    val fullTrades = OrderBook
      .batch(OrderReplaySource.readFile(spark, fullFile))
      .collect().sortBy(sortKey)
    val prefixTrades = OrderBook
      .batch(OrderReplaySource.readFile(spark, preFile))
      .collect().sortBy(sortKey)
    assert(fullTrades.length > prefixTrades.length,
      "suffix must produce trades or the test is vacuous")

    // persist the prefix book state (the reference's state file)...
    val statePath = s"$root/state"
    val snap = StateLoader.snapshotFromReplay(
      OrderReplaySource.readFile(spark, preFile))
    StateLoader.save(snap, statePath)
    val loaded = StateLoader.load(spark, statePath)
    assert(loaded.collect().exists(b => b.buys.nonEmpty || b.sells.nonEmpty),
      "prefix must leave resting orders or the warm start is untested")

    // ...and warm-start a stream over ONLY the suffix from it
    val (k, v) = TransformWithStateOps.RocksDbProvider
    graft.SparkTestUtil.withConf(spark, k, v) {
      val stream = TransformWithStateOps.orderBookWarm(
        OrderReplaySource.readStream(spark, postDir), loaded)
      val q = stream.writeStream.format("memory").queryName("ob_warm")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val warmTrades = spark.table("ob_warm").as[Trade]
          .collect().sortBy(sortKey)
        assert((prefixTrades ++ warmTrades).sortBy(sortKey).toSeq ===
          fullTrades.toSeq)
      } finally q.stop()
    }
  }
}
