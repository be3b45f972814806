package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.dotProduct
import graft.functions.HashExpressions.lshBuckets

/** Dev-only stage profiler for the PAIRS shape of the LSH near-dup
  * path ([[graft.operators.AnnLsh.nearDupLsh]]): times the signature
  * build, the emit-once bucket self-join, and the exact verify join
  * separately, so a scale regression can be attributed to a stage.
  */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val n = time("count")(Tables.embeddings(s, dir).count())
    val width = graft.operators.AnnLsh.pairsBitsFor(s, n)
    val tables = 16
    System.err.println(s"[prof] n=$n pairs-width=$width")
    def asDouble(c: org.apache.spark.sql.Column) =
      transform(c, x => x.cast("double"))
    val sigb = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        lshBuckets(asDouble(col("embedding")), tables, width).as("bks"))
      .select(col("vec_id"), col("bks"),
        posexplode(col("bks")).as(Seq("table", "bucket")))
    time("sig rows")(System.err.println("[prof] sig=" + sigb.count()))
    val ids = sigb.as("a")
      .join(sigb.as("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id") &&
          (0 until tables - 1).map { j =>
            (col("a.table") <= lit(j)) ||
              (element_at(col("a.bks"), j + 1) =!=
                element_at(col("b.bks"), j + 1))
          }.reduce(_ && _))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    time("emit-once candidates")(
      System.err.println("[prof] cands=" + ids.count()))
    val vec = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))
    val verified = ids
      .join(vec.select(col("vec_id").as("id1"), col("v").as("v1"),
        col("norm").as("n1")), "id1")
      .join(vec.select(col("vec_id").as("id2"), col("v").as("v2"),
        col("norm").as("n2")), "id2")
      .withColumn("cos",
        dotProduct(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("id1"), col("id2"), col("cos"))
    time("candidates again + verify join")(
      System.err.println("[prof] verified=" + verified.count()))
    time("full nearDupLsh (memo build + write + read)")(
      System.err.println("[prof] out=" +
        graft.operators.AnnLsh.nearDupLsh(s, dir).count()))
    s.stop()
  }
}
