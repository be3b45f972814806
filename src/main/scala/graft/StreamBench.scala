package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.KeyedTuple
import graft.streaming.{Metrics, StatefulOps}

/** Streaming micro-bench mirroring the reference's configuration
  * (reference scripts/trisk_reconfig/micro-bench.sh:74-117: aggregate
  * rate 60 000 ev/s over 10 000 keys with 1 KiB state per key,
  * 100 s runtime).
  *
  * Drives the payload-state operator from a rate source at the target
  * rate and reports per-batch throughput (rows/s) and batch duration
  * from the StreamingQueryListener — the MetricsManager surface.
  *
  * Usage: runMain graft.StreamBench [ratePerSec] [nKeys] [perKeyBytes] [seconds] [outFile]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(60000)
    val nKeys = args.lift(1).map(_.toInt).getOrElse(10000)
    val perKeyBytes = args.lift(2).map(_.toInt).getOrElse(1024)
    val seconds = args.lift(3).map(_.toInt).getOrElse(30)
    val outFile = args.lift(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val collector = new Metrics.ProgressCollector
    spark.streams.addListener(collector)

    val tuples = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rate)
      .load()
      .select(col("value"))
      .as[Long]
      .map(v => KeyedTuple(s"A${v % nKeys}", 1L))

    val q = StatefulOps.statefulPayload(tuples, perKeyBytes)
      .writeStream.format("noop").outputMode("update").start()
    Thread.sleep(seconds * 1000L)
    q.stop()

    val ps = collector.progresses.filter(_.numInputRows > 0)
    val totalRows = ps.map(_.numInputRows).sum
    val totalSec = ps.map(_.durationMs).sum / 1000.0
    val rps = ps.map(_.processedRowsPerSecond)
    val meanRps = if (rps.nonEmpty) rps.sum / rps.size else 0.0
    val line = f"""{"metric":"stream_rows_per_sec","value":$meanRps%.0f,"unit":"rows/sec","batches":${ps.size},"total_rows":$totalRows,"busy_sec":$totalSec%.1f,"config":{"rate":$rate,"keys":$nKeys,"state_bytes":$perKeyBytes}}"""
    println(line)
    // persist as a repo artifact so the micro-bench gate is auditable
    outFile.foreach(f => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(f), line + "\n"))
    spark.stop()
  }
}
