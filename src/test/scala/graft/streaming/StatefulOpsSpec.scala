package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.KeyedTuple

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("runningCount accumulates across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val q = StatefulOps.runningCount(in.toDS())
      .writeStream.format("memory").queryName("rc")
      .outputMode("update").start()
    try {
      in.addData("a", "b", "a")
      q.processAllAvailable()
      in.addData("a", "c")
      q.processAllAvailable()
      val rows = spark.table("rc").as[KeyedTuple].collect()
      val last = rows.groupBy(_.key).map { case (k, v) =>
        k -> v.map(_.value).max }
      assert(last === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    } finally q.stop()
  }

  test("twoInputWordCount merges both streams into one running count") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in1 = MemoryStream[String]
    val in2 = MemoryStream[String]
    val q = StatefulOps.twoInputWordCount(in1.toDS(), in2.toDS())
      .writeStream.format("memory").queryName("twowc")
      .outputMode("update").start()
    try {
      in1.addData("spark streams data")
      in2.addData("data streams fast")
      q.processAllAvailable()
      val last = spark.table("twowc").as[KeyedTuple].collect()
        .groupBy(_.key).map { case (k, v) => k -> v.map(_.value).max }
      assert(last === Map("spark" -> 1L, "streams" -> 2L, "data" -> 2L,
        "fast" -> 1L))
    } finally q.stop()
  }

  test("countWindowReduce emits per full window of n") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedTuple]
    val q = StatefulOps.countWindowReduce(in.toDS(), 3)
      .writeStream.format("memory").queryName("cw")
      .outputMode("append").start()
    try {
      in.addData(KeyedTuple("k", 1), KeyedTuple("k", 2))
      q.processAllAvailable()
      assert(spark.table("cw").count() === 0)
      in.addData(KeyedTuple("k", 3), KeyedTuple("k", 10))
      q.processAllAvailable()
      val rows = spark.table("cw").as[KeyedTuple].collect().toList
      assert(rows === List(KeyedTuple("k", 6))) // 1+2+3; 10 buffered
    } finally q.stop()
  }

  test("sessionWithEarlyFire: early fire at maxEvents, final at gap") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StatefulOps.TimedEvent]
    def ev(key: Long, sec: Long) =
      StatefulOps.TimedEvent(key, new Timestamp(sec * 1000))
    val withWm = in.toDS().withWatermark("ts", "0 seconds")
    val q = StatefulOps.sessionWithEarlyFire(withWm, gapMs = 10000,
        maxEvents = 2)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // note: rows at/before the current watermark are dropped by the
      // stateful operator, so start strictly after epoch 0
      in.addData(ev(1, 100), ev(1, 101), ev(1, 102))
      q.processAllAvailable()
      // early fire after 2 events, no final yet
      val early = spark.table("sess").as[StatefulOps.SessionOut].collect()
      assert(early.toList === List(StatefulOps.SessionOut(1, 2, false)))
      // advance watermark far past key 1's session gap
      in.addData(ev(99, 200))
      q.processAllAvailable()
      in.addData(ev(98, 300))
      q.processAllAvailable()
      val all = spark.table("sess").as[StatefulOps.SessionOut].collect()
      assert(all.contains(StatefulOps.SessionOut(1, 3, true)))
    } finally q.stop()
  }

  test("sessionWithEarlyFire: in-horizon out-of-order event opens its own session") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StatefulOps.TimedEvent]
    def ev(key: Long, sec: Long) =
      StatefulOps.TimedEvent(key, new Timestamp(sec * 1000))
    // 60 s watermark slack: an event 20 s older than the open session
    // is still admissible — a single-session state would absorb it
    // (negative delta is never "> gap"), inflating the newer session
    // and losing a close; correct gap semantics give TWO sessions
    val withWm = in.toDS().withWatermark("ts", "60 seconds")
    val q = StatefulOps.sessionWithEarlyFire(withWm, gapMs = 10000,
        maxEvents = 100)
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 100))
      q.processAllAvailable()
      // 20 s BEFORE the open session's start, >gap away: own session
      in.addData(ev(1, 80))
      q.processAllAvailable()
      // advance the watermark far past both sessions' gaps
      in.addData(ev(99, 400))
      q.processAllAvailable()
      in.addData(ev(98, 500))
      q.processAllAvailable()
      val finals = spark.table("sess_ooo")
        .as[StatefulOps.SessionOut].collect().filter(_.key == 1L).toList
      assert(finals === List(StatefulOps.SessionOut(1, 1, true),
        StatefulOps.SessionOut(1, 1, true)),
        s"expected two single-event sessions, got $finals")
    } finally q.stop()
  }

  test("sessionWithEarlyFire: bridging event merges two open sessions") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StatefulOps.TimedEvent]
    def ev(key: Long, sec: Long) =
      StatefulOps.TimedEvent(key, new Timestamp(sec * 1000))
    val withWm = in.toDS().withWatermark("ts", "60 seconds")
    val q = StatefulOps.sessionWithEarlyFire(withWm, gapMs = 10000,
        maxEvents = 100)
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 100), ev(1, 118)) // two sessions 18 s apart
      q.processAllAvailable()
      in.addData(ev(1, 109)) // within gap of both spans: bridges them
      q.processAllAvailable()
      in.addData(ev(99, 400))
      q.processAllAvailable()
      in.addData(ev(98, 500))
      q.processAllAvailable()
      val finals = spark.table("sess_bridge")
        .as[StatefulOps.SessionOut].collect().filter(_.key == 1L).toList
      assert(finals === List(StatefulOps.SessionOut(1, 3, true)),
        s"expected one merged 3-event session, got $finals")
    } finally q.stop()
  }
}
