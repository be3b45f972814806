package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.tokens

/** Dev-only stage profiler for the exact NB quality classifier
  * ([[graft.operators.TextQueries.qualityClassifier]]): separates the
  * token explode, the per-class vocab count build, and the scoring
  * join+agg, so the 100× ratio can be attributed per stage. */
object ProfileNb {
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
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        (substring(col("source"), 4, 10).cast("int") % 5 === 0).as("tgt"),
        tokens(col("text")).as("toks"))
    val toks = docs.select(col("doc_id"), col("tgt"),
      explode(col("toks")).as("w"))
    time("explode count only")(
      System.err.println("[prof] toks=" + toks.count()))
    val counts = toks.groupBy(col("w"))
      .agg(count(when(col("tgt"), 1)).as("c_t"),
        count(when(!col("tgt"), 1)).as("c_o"))
    time("counts build")(
      System.err.println("[prof] vocab=" + counts.count()))
    time("full exact query")(
      System.err.println("[prof] out=" +
        graft.operators.TextQueries.qualityClassifier(s, dir).count()))
    time("full exact query again")(
      System.err.println("[prof] out=" +
        graft.operators.TextQueries.qualityClassifier(s, dir).count()))
    s.stop()
  }
}
