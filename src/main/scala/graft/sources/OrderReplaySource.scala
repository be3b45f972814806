package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Order

/** Stock-order file replay — the analog of the reference's
  * SSE-order-file source (reference
  * stock/sources/SSERealRateSourceFunctionKV.java:14-100: replays a
  * pipe-separated order file keyed by Sec_Code).
  *
  * Batch form parses the file directly; streaming form drives the same
  * parse through the text file-stream source (one file = one replay;
  * `maxFilesPerTrigger` paces batches). The Kafka ingress of the
  * reference (topic `stock_sb` keyed by Sec_Code,
  * KafkaInAppStatefulStockExchange) maps to
  * `spark.readStream.format("kafka")` + the same parse — not compiled
  * here because Kafka connector jars are not in this environment.
  */
object OrderReplaySource {

  def parseLines(spark: SparkSession, lines: Dataset[String]): Dataset[Order] = {
    import spark.implicits._
    lines.filter(_.nonEmpty).map(Order.parse)
  }

  /** Batch read of a pipe-separated order file. */
  def readFile(spark: SparkSession, path: String): Dataset[Order] =
    parseLines(spark, spark.read.textFile(path))

  /** Streaming replay of a directory of order files. */
  def readStream(spark: SparkSession, dir: String,
      filesPerTrigger: Int = 1): Dataset[Order] =
    parseLines(spark,
      spark.readStream
        .option("maxFilesPerTrigger", filesPerTrigger)
        .textFile(dir))

  /** Deterministic synthetic order file (no SSE data ships with the
    * reference either — FIXTURES.md prescribes a synthetic fixture).
    * Orders alternate buy/sell around a mid price per security with a
    * pre-open phase, so the book exercises build, cross, partial-fill
    * and delete paths. */
  def writeSyntheticOrders(path: String, securities: Seq[String],
      ordersPerSec: Int): Unit = {
    // timestamps must be MONOTONIC in i within each phase: the replay
    // sorts by (hhmmss, orderNo) — a fixed minute with seconds = i%60
    // wrapped every 60 orders, so past 60 orders per phase a delete
    // row could sort a whole wrap-cycle BEFORE the add it targets and
    // silently no-op (defeating the delete-path coverage the fixture
    // exists for). Encode i as a full seconds offset instead; the
    // bound keeps the pre-open phase strictly before the 09:30 open.
    require(ordersPerSec <= 5000,
      s"ordersPerSec $ordersPerSec > 5000: the pre-open phase " +
        "(ordersPerSec/5 seconds from 09:10:00) would cross the " +
        "09:30 continuous open")
    def fmt(baseSec: Int, i: Int): String = {
      val t = baseSec + i
      f"${t / 3600}%02d:${t / 60 % 60}%02d:${t % 60}%02d"
    }
    val sb = new StringBuilder
    securities.zipWithIndex.foreach { case (sec, si) =>
      val mid = 1000 + si * 100 // dollars*0.01 → cents via parse
      (0 until ordersPerSec).foreach { i =>
        val pre = i < ordersPerSec / 5
        val time =
          if (pre) fmt(9 * 3600 + 10 * 60, i) else fmt(9 * 3600 + 30 * 60, i)
        val dir = if (i % 2 == 0) "B" else "S"
        // write cents as an exact 2-decimal string: a double division
        // (cents / 100.0) stringifies to values the cents conversion
        // in Order.parse could round differently than intended
        val cents = mid + (if (dir == "B") -(i % 7) else i % 5)
        val price = f"${cents / 100}.${cents % 100}%02d"
        val vol = 10 + (i % 9) * 10
        if (i % 17 == 0 && i > 0) {
          // delete the previous order (price 0 ⇒ full-side scan path)
          val j = i - 1
          val dirJ = if (j % 2 == 0) "B" else "S"
          sb.append(s"$sec-$j|D|$time|0|0|0|$sec|$dirJ\n")
        } else {
          sb.append(s"$sec-$i|A|$time|$price|0|$vol|$sec|$dir\n")
        }
      }
    }
    // a bare filename has a null parent — only create what exists
    Option(Paths.get(path).getParent).foreach(p => Files.createDirectories(p))
    Files.writeString(Paths.get(path), sb.toString)
  }
}
