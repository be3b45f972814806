package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.model.Bid

/** Kafka ingress/egress (reference: the Nexmark jobs consume from and
  * produce to Kafka — examples/src/main/java/Nexmark/ queries wire
  * FlinkKafkaConsumer/Producer; the SSE testbed feeds orders through a
  * Kafka topic).
  *
  * Spark resolves the `kafka` data source BY NAME at runtime, so this
  * module compiles with no connector dependency; in environments
  * without `spark-sql-kafka-0-10` on the classpath [[isAvailable]] is
  * false and building a reader/writer fails with Spark's standard
  * "Failed to find data source: kafka" error. The record codec
  * (entity ⇄ JSON value bytes) is pure Spark SQL and is tested in any
  * environment; the file-replay source covers the ingress semantics
  * where Kafka itself is absent.
  *
  * Timestamp format is pinned so encode→decode round-trips millisecond
  * event times exactly.
  */
object KafkaConnect {

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** True when the Kafka connector is on the classpath. */
  def isAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Entity → one JSON `value` column (the Kafka record payload). */
  def encode[T](ds: Dataset[T]): DataFrame =
    ds.select(to_json(struct(col("*")),
      java.util.Map.of("timestampFormat", TsFormat)).as("value"))

  /** Kafka `value` payload → typed entities (schema from the encoder). */
  def decode[T: Encoder](raw: DataFrame): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    raw
      .select(from_json(col("value").cast("string"), enc.schema,
        java.util.Map.of("timestampFormat", TsFormat)).as("r"))
      .select(col("r.*"))
      .as[T]
  }

  /** Streaming Bid consumer (FlinkKafkaConsumer analog). */
  def bidStream(spark: SparkSession, bootstrapServers: String,
      topic: String): Dataset[Bid] = {
    import spark.implicits._
    decode[Bid](
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load())
  }

  /** Streaming producer (FlinkKafkaProducer analog). */
  def writer[T](ds: Dataset[T], bootstrapServers: String, topic: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    encode(ds).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}
