package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the bloom-prefilter probe: times each layer of the
  * probe expression separately to locate the per-row cost. */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }

    val probe = graft.Tables.lineitem(spark, dir).select(col("l_partkey"))
    println("probe partitions: " + probe.rdd.getNumPartitions)
    for (_ <- 1 to 2) {
      t("scan only")(probe.count())
      t("md5 hex")(probe
        .select(md5(concat(lit("b:"), col("l_partkey").cast("string"))
          .cast("binary")).as("h"))
        .filter(length(col("h")) > 1).count())
      t("md5+3conv")(probe
        .withColumn("h", md5(concat(lit("b:"), col("l_partkey").cast("string"))
          .cast("binary")))
        .filter((0 until 3).map(j =>
          conv(substring(col("h"), 1 + 8 * j, 8), 16, 10).cast("long") % 4096 >= 0)
          .reduce(_ && _)).count())
      t("full query")(
        graft.operators.SketchQueries.bloomPrefilter(spark, dir).count())
    }
    spark.stop()
  }
}
