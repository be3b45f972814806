package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GraftFunctions
import graft.controlplane.KeygroupRouter

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sine rate follows base + (sin(2πt/cycle)+1)·rate") {
    assert(NexmarkSources.sineRate(100, 50, 60, 0) === 100 + 50)
    assert(NexmarkSources.sineRate(100, 50, 60, 15) === 100 + 100)
    assert(NexmarkSources.sineRate(100, 50, 60, 45) === 100)
  }

  test("bid generator is deterministic with hot-auction skew") {
    import spark.implicits._
    val bids = NexmarkSources.bids(spark, 1000).collect()
    assert(bids.length === 1000)
    assert(bids.toSeq === (0L until 1000L).map(NexmarkSources.bidAt(_)))
    // ~99% of bids hit the current hot auction
    val hot = bids.count(_.auction === 1000L)
    assert(hot > 900, s"hot-auction skew missing: $hot")
    // event time is monotonic in sequence number
    assert(bids.map(_.dateTime.getTime).toSeq === bids.map(_.dateTime.getTime).sorted.toSeq)
  }

  test("Nexmark Q1+Q2 pipeline over the streaming generator source") {
    val bids = NexmarkSources.bidStream(spark, rowsPerBatch = 500)
    // Q1 currency map + Q2 selection, as in the batch twins
    val out = bids.toDF()
      .select(col("auction"), floor(col("price") * 0.82).cast("long").as("eur"),
        col("bidder"), col("dateTime"))
      .filter(col("auction") % 5 === 0)
    val q = out.writeStream.format("memory").queryName("nex_q12")
      .outputMode("append").start()
    try {
      // rate-micro-batch is unbounded: let a few batches through, then
      // stop (processAllAvailable would chase the growing offset)
      val deadline = System.currentTimeMillis() + 20000
      while (q.recentProgress.length < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      q.stop()
      val rows = spark.table("nex_q12").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getLong(0) % 5 == 0))
    } finally if (q.isActive) q.stop()
  }

  test("oracle-embedded workload verifies state across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[graft.model.KeyedTuple]
    val q = OracleWorkload.verify(in.toDS())
      .writeStream.format("memory").queryName("oracle_wl")
      .outputMode("append").start()
    try {
      val all = OracleWorkload.tuples(nKeys = 20, rounds = 6)
      val (b1, rest) = all.splitAt(40)
      val (b2, b3) = rest.splitAt(40)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      assert(spark.table("oracle_wl").count() === 0,
        spark.table("oracle_wl").collect().mkString("; "))
    } finally q.stop()
  }

  test("sine-modulated stream emits sineRate(batchId) rows per batch") {
    import org.apache.spark.sql.Dataset
    val counts = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = NexmarkSources
      .bidStreamSine(spark, base = 100, rate = 50, cycleSec = 4)
      .writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[graft.model.Bid], id: Long) =>
        counts.put(id, df.count()); ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (counts.size < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.stop()
      assert(counts.size >= 5, s"only ${counts.size} batches")
      // per-batch counts trace Util.java's curve: 150, 200, 150, 100, 150…
      (0L until 4L).foreach { b =>
        assert(counts.get(b) ===
          NexmarkSources.sineRate(100, 50, 4, b).toLong, s"batch $b")
      }
    } finally if (q.isActive) q.stop()
  }

  test("keygroup column fn == scala-side router keygroup (murmur parity)") {
    import spark.implicits._
    val keys = (0 until 200).map(i => s"K$i")
    val df = keys.toDF("key")
      .withColumn("kg", GraftFunctions.keygroup(col("key")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      assert(got(k) === KeygroupRouter.keygroup(k, 128), s"key $k")
    }
  }
}
