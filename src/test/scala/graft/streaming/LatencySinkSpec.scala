package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The latency-counting sink measures per-batch `now − max(event ts)`
  * — the DummyLatencyCountingSink analog. */
class LatencySinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  case class Ev(ts: Timestamp, v: Long)

  test("foreachBatch latency sink records per-batch samples") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = new Metrics.LatencySink("ts")
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink(df, id))
      .start()
    try {
      val emit = System.currentTimeMillis() - 1500 // emitted 1.5 s ago
      in.addData(Ev(new Timestamp(emit), 1), Ev(new Timestamp(emit - 100), 2))
      q.processAllAvailable()
      val samples = sink.all
      assert(samples.nonEmpty)
      val s = samples.head
      assert(s.rows === 2)
      // latency = now − max(ts): at least the 1.5 s age, and sane
      assert(s.latencyMs >= 1500 && s.latencyMs < 120000, s.toString)
    } finally q.stop()
  }

  /** The listener-side channel StreamBench's percentiles come from:
    * `observeSourceTs` attaches max(source ts) as an observed metric
    * and the ProgressCollector turns it into per-batch end-to-end
    * latency without touching the operator under test. */
  test("observeSourceTs feeds per-batch latency into BatchProgress") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val collector = new Metrics.ProgressCollector
    spark.streams.addListener(collector)
    val in = MemoryStream[Ev]
    val q = Metrics.observeSourceTs(in.toDF(), "ts")
      .writeStream.format("noop").outputMode("append").start()
    try {
      val emit = System.currentTimeMillis() - 2000 // emitted 2 s ago
      in.addData(Ev(new Timestamp(emit), 1), Ev(new Timestamp(emit - 500), 2))
      q.processAllAvailable()
      // listener events are async — wait for the progress to land
      val deadline = System.currentTimeMillis() + 10000
      def sample = collector.progresses.filter(_.numInputRows > 0)
        .flatMap(_.latencyMs).headOption
      while (sample.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val lat = sample.getOrElse(fail("no latency sample observed"))
      // latency = batch end − max(ts): at least the 2 s age, and sane
      assert(lat >= 2000 && lat < 120000, lat.toString)
    } finally {
      q.stop()
      spark.streams.removeListener(collector)
    }
  }
}
