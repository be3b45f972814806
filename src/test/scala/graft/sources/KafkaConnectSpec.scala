package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.{Bid, KeyedTuple}

/** The Kafka module compiles and its codec is exact in any
  * environment; the broker-facing path is env-gated (no connector
  * jars here) and must fail with Spark's standard classification, not
  * something cryptic. */
class KafkaConnectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("record codec round-trips bids exactly (incl. ms timestamps)") {
    import spark.implicits._
    val in = NexmarkSources.bids(spark, 200)
    val out = KafkaConnect.decode[Bid](KafkaConnect.encode(in)).collect()
    assert(out.toSet === in.collect().toSet)
  }

  test("record codec is entity-generic") {
    import spark.implicits._
    val in = (0 until 50).map(i => KeyedTuple(s"K$i", i.toLong))
    val out = KafkaConnect
      .decode[KeyedTuple](KafkaConnect.encode(in.toDS())).collect()
    assert(out.toSet === in.toSet)
  }

  test("availability is detected; absent connector fails with the standard error") {
    assume(!KafkaConnect.isAvailable, "connector present — skip env gate")
    val e = intercept[Exception] {
      KafkaConnect.bidStream(spark, "localhost:9092", "bids")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
