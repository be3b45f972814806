package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Auction, Bid, Person}

/** Deterministic Nexmark-style generator sources.
  *
  * The reference drives its queries from generator SourceFunctions with
  * a sine-modulated rate: `base + (sin(2π·epoch/cycle)+1)·rate`
  * (reference: examples/src/main/java/Nexmark/sources/Util.java:14-28;
  * BidSourceFunction.java:33-140). In Spark the analog is a
  * `rate-micro-batch` streaming source mapped through the same
  * deterministic value→entity functions, with rows-per-batch following
  * the same sine curve; the batch form materializes the identical
  * entities from `spark.range` so batch twins and streams share one
  * generator.
  */
object NexmarkSources {

  /** Sine-wave rate (events/sec) at a given epoch second —
    * reference Util.java:14-20 (`changeRate`). */
  def sineRate(base: Int, rate: Int, cycleSec: Int, epochSec: Long): Int =
    base + ((math.sin(2 * math.Pi * epochSec / cycleSec) + 1) * rate).toInt

  /** The sine-prefix keep rule shared by every sine-modulated stream
    * (generator-time [[bidStreamSine]] and the wallclock
    * NexmarkStreamBench source): an epoch is generated at the curve's
    * peak, and element `idxInEpoch` survives iff it falls inside the
    * sine-sized prefix. One definition — the two sources must follow
    * the SAME offered curve for their measurements to be comparable,
    * and a second copy of the predicate could drift silently. */
  def sineKeep(base: Int, rate: Int, cycleSec: Int, epoch: Long,
      idxInEpoch: Long): Boolean =
    idxInEpoch < sineRate(base, rate, cycleSec, epoch)

  private val HotAuctionRatio = 100 // 1-1/ratio of bids hit the hot auction
  private val FirstAuctionId = 1000L
  private val FirstPersonId = 1000L

  /** Deterministic Bid from a sequence number (mirrors the shape of
    * BidGenerator.java:45-72: hot-auction skew, monotonic event time). */
  def bidAt(i: Long, baseMs: Long = 1704067200000L): Bid = {
    val hot = i % HotAuctionRatio != 0
    val auction =
      if (hot) FirstAuctionId + (i / 1000) // latest "hot" auction
      else FirstAuctionId + (i % 250)
    val bidder = FirstPersonId + (i % 500)
    val price = 100 + (i * 37) % 10000
    Bid(auction, bidder, price, new Timestamp(baseMs + i * 5), s"extra$i")
  }

  def personAt(i: Long, baseMs: Long = 1704067200000L): Person = {
    val states = Array("OR", "ID", "CA", "WA", "NV")
    val cities = Array("Portland", "Boise", "LA", "Seattle", "Reno")
    Person(FirstPersonId + i, s"person$i", s"p$i@mail.com", s"cc$i",
      cities((i % 5).toInt), states((i % 5).toInt),
      new Timestamp(baseMs + i * 10), s"extra$i")
  }

  def auctionAt(i: Long, baseMs: Long = 1704067200000L): Auction = {
    val ts = baseMs + i * 7
    Auction(FirstAuctionId + i, s"item$i", s"desc$i",
      initialBid = 100 + i % 1000, reserve = 200 + i % 2000,
      dateTime = new Timestamp(ts),
      expires = new Timestamp(ts + 60000),
      seller = FirstPersonId + (i % 500), category = i % 10,
      extra = s"extra$i")
  }

  /** Batch generator: n deterministic bids (shares the generator with
    * the streaming source). */
  def bids(spark: SparkSession, n: Long): Dataset[Bid] = {
    import spark.implicits._
    spark.range(n).map(i => bidAt(i))
  }

  def persons(spark: SparkSession, n: Long): Dataset[Person] = {
    import spark.implicits._
    spark.range(n).map(i => personAt(i))
  }

  def auctions(spark: SparkSession, n: Long): Dataset[Auction] = {
    import spark.implicits._
    spark.range(n).map(i => auctionAt(i))
  }

  /** Streaming bid source: rate-micro-batch (deterministic
    * rows-per-batch) mapped through the generator. `rowsPerBatch`
    * approximates the sine curve's mean; exact sine modulation is
    * applied by sizing batches with `sineRate` in the harness. */
  def bidStream(spark: SparkSession, rowsPerBatch: Int): Dataset[Bid] = {
    import spark.implicits._
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .load()
      .select(col("value"))
      .as[Long]
      .map(i => bidAt(i))
  }

  /** Streaming auction/person sources (same pattern;
    * reference AuctionSourceFunction/PersonSourceFunction). */
  def auctionStream(spark: SparkSession, rowsPerBatch: Int): Dataset[Auction] = {
    import spark.implicits._
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch).load()
      .select(col("value")).as[Long].map(i => auctionAt(i))
  }

  def personStream(spark: SparkSession, rowsPerBatch: Int): Dataset[Person] = {
    import spark.implicits._
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch).load()
      .select(col("value")).as[Long].map(i => personAt(i))
  }

  /** Keyed variant (reference sources/keyed/KeyedBidSourceFunction). */
  def keyedBidStream(spark: SparkSession, rowsPerBatch: Int): DataFrame =
    bidStream(spark, rowsPerBatch).toDF()
      .select(col("auction").as("key"), struct(col("*")).as("bid"))

  /** Streaming bid source whose per-batch row count follows the
    * reference sine curve *exactly*: micro-batch b carries
    * `sineRate(base, rate, cycleSec, b)` bids (Util.java:14-20 applied
    * per epoch as in BidSourceFunction.java:33-140). Implementation:
    * generate at the curve's peak rate (base + 2·rate per batch) and
    * keep the sine-sized prefix of each batch's value range — the
    * generator stays deterministic (same `bidAt` sequence numbers). */
  def bidStreamSine(spark: SparkSession, base: Int, rate: Int,
      cycleSec: Int): Dataset[Bid] = {
    import spark.implicits._
    val maxR = base + 2 * rate
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", maxR.toLong)
      .load()
      .select(col("value")).as[Long]
      .flatMap { i =>
        if (sineKeep(base, rate, cycleSec, i / maxR, i % maxR))
          Iterator.single(bidAt(i))
        else Iterator.empty
      }
  }
}
