package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.{tokens, shinglesOfTokens}

/** Dev-only stage profiler for the exact bigram-LM scorer
  * ([[graft.operators.TextQueries.lmPerplexity]]): times tokenize,
  * the unigram/bigram count builds, and the score join separately,
  * then times the current exact form and a per-doc-gram-count
  * restructure for comparison.
  */
object ProfileLm {
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
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    time("tokenize only")(
      System.err.println("[prof] toks=" +
        docs.select(sum(size(col("toks")))).head().getLong(0)))
    val bg = docs.select(col("doc_id"),
      explode(shinglesOfTokens(col("toks"), 2)).as("g"))
    time("bigram explode count")(
      System.err.println("[prof] bg=" + bg.count()))
    val big = bg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    time("bigram model build (groupBy g)")(
      System.err.println("[prof] distinct grams=" + big.count()))
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    time("unigram build")(
      System.err.println("[prof] vocab=" + uni.count()))
    time("exact form full")(
      System.err.println("[prof] exact=" +
        graft.operators.TextQueries.lmPerplexity(s, dir).count()))
    // restructured: per-doc gram counts first
    time("restructured full") {
      val pdg = docs.select(col("doc_id"),
          explode(shinglesOfTokens(col("toks"), 2)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
        .persist()
      val big2 = pdg.groupBy(col("g")).agg(sum(col("cnt")).as("c2"))
        .withColumn("w1", substring_index(col("g"), " ", 1))
      val uni2 = docs.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val vocab2 = uni2.agg(count(lit(1)).as("v"))
      val lp = big2.join(uni2.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(broadcast(vocab2))
        .select(col("g"),
          floor(lit(1000000.0) *
            log((col("c2").cast("double") + 0.5) /
              (col("c1").cast("double") + lit(0.5) * col("v").cast("double"))))
            .as("lp_scaled"))
      val out = pdg.join(lp, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("lp_scaled")).as("s"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("s").cast("double") /
            (col("n_bigrams").cast("double") * 1000000.0)).as("avg_logp"))
      System.err.println("[prof] restructured=" + out.count())
      pdg.unpersist(blocking = false)
    }
    s.stop()
  }
}
