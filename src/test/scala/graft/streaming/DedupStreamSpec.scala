package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.DedupQueries

/** Streaming dedup must agree with the batch twin when the finite
  * documents table is replayed (same parity strategy as
  * StreamingParitySpec). */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming digest dedup emits exactly the batch digest set") {
    val q = DedupStream.dedupByDigest(DedupStream.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream").collect()
        .map(_.getString(1)).toSet
      val want = DedupQueries.exactDedup(spark, dir).collect()
        .map(_.getString(0)).toSet
      assert(got === want)
      // one emission per digest (first arrival wins)
      assert(spark.table("dedup_stream").count() === want.size)
    } finally q.stop()
  }

  test("streaming chunk dedup emits exactly the batch distinct-chunk set") {
    val q = DedupStream.chunkDedup(DedupStream.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("chunk_dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chunk_dedup_stream").collect()
        .map(_.getAs[String]("chunk_md5"))
      // one emission per distinct chunk digest, matching the batch
      // chunker's distinct set
      assert(got.length === got.toSet.size)
      val want = graft.operators.CurationQueries.chunkWindows(spark, dir)
        .select("chunk_md5").distinct().collect()
        .map(_.getString(0)).toSet
      assert(got.toSet === want)
    } finally q.stop()
  }

  test("watermark-bounded event dedup suppresses in-horizon duplicates") {
    val events = EventStream.readStream(spark, dir)
    val q = DedupStream.dedupEventsWithinWatermark(events, "1 hour")
      .writeStream.format("memory").queryName("dedup_events_wm")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_events_wm").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // the finite replay fits one horizon: output is exactly the
      // distinct key set, each emitted once
      assert(got.length === got.toSet.size)
      val want = graft.Tables.events(spark, dir)
        .select("user_id", "event_type").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got.toSet === want)
    } finally q.stop()
  }
}
