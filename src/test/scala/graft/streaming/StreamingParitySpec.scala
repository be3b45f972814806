package graft.streaming

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.EventQueries

/** Streaming twins must produce the batch twins' results when the
  * finite events table is replayed through Structured Streaming —
  * the t2 parity strategy of SURVEY §5. */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(rows: Array[Row]): List[Seq[Any]] =
    rows.map(_.toSeq).toList.sortBy(_.mkString("|"))

  test("streaming tumbling hourly counts == batch twin") {
    val stream = EventStream.tumblingHourly(EventStream.readStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("twin_tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // FULL rows, `total` included: the twins share one expression
      // tree (EventSemantics) now, so the old .drop("total") escape
      // hatch — which existed because the streaming copy had silently
      // lost the column — must never come back
      val got = sortedRows(spark.table("twin_tumbling").collect())
      val want = sortedRows(EventQueries.e5TumblingHourly(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }

  test("streaming sessions == batch twin") {
    val stream = EventStream.sessions(EventStream.readStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("twin_sessions")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = sortedRows(spark.table("twin_sessions").collect())
      val want = sortedRows(EventQueries.e11Sessions(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }

  test("streaming dim join == batch twin") {
    val stream = EventStream.dimJoin(
      EventStream.readStream(spark, dir), spark, dir)
    val q = stream.writeStream.format("memory").queryName("twin_dim")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = sortedRows(spark.table("twin_dim").collect())
      val want = sortedRows(EventQueries.e3JoinDim(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }

  test("streaming interval join == batch twin") {
    val stream = EventStream.intervalJoin(EventStream.readStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("twin_ijoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = sortedRows(spark.table("twin_ijoin").collect())
      val want = sortedRows(EventQueries.eIntervalJoin(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }

  test("streaming funnel stage machine == batch window twin") {
    val stream = FunnelStream.funnelStages(EventStream.readStream(spark, dir))
    val q = stream.toDF("user_id", "mv", "mc", "mp")
      .writeStream.format("memory").queryName("twin_funnel")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = sortedRows(spark.table("twin_funnel").collect())
      val want = sortedRows(
        graft.operators.BehaviorQueries.funnelStages(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }

  test("streaming window join == batch twin") {
    val stream = EventStream.windowJoin(EventStream.readStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("twin_wjoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = sortedRows(spark.table("twin_wjoin").collect())
      val want = sortedRows(EventQueries.e8WindowJoin(spark, dir).collect())
      assert(got === want)
    } finally q.stop()
  }
}
