package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.GraftFunctions.{tokens, shinglesOfTokens}

/** Dev-only A/B for the r18 text-family audit (VERDICT r17 ask #5):
  * the exact (oracle-form) t_lm_perplexity / t_quality_classifier /
  * t_tfidf_topk plans re-run their token-scale subtree 2–4× because a
  * tiny VOCAB-SCALE aggregate (uni: ~3.1k rows, counts: ~3.1k rows,
  * df-side tf: ~20M rows) is consumed by two branches and Spark
  * re-derives it per consumer (the optimizer prunes the aggregate
  * differently per branch, so even the shuffle exchanges don't
  * canonicalize equal and ReuseExchange never fires — see
  * plans/r18/t_tfidf_topk_sf10_exec.txt: two full FileScan+explode
  * subtrees).
  *
  * Variants cache the small shared frame (and optionally the
  * tokenized corpus) and are timed INTERLEAVED with the production
  * form in one JVM, same inputs, so host weather and JIT cancel.
  * Row counts are asserted equal. The per-doc-(term) restructure was
  * measured separately and REJECTED (ProfileLm: 17.6 s vs 7.6 s at
  * sf10 — (doc, gram) barely dedups, so shuffling it costs more than
  * re-exploding).
  *
  * Usage: ProfileTextCache [dir] [rounds]
  */
object ProfileTextCache {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      s.catalog.clearCache()
    }

    // ---- t_lm_perplexity exact form ----------------------------------
    def lmExact(cacheDocs: Boolean, cacheUni: Boolean): DataFrame = {
      var docs = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      if (cacheDocs) docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
      val bg = docs.select(col("doc_id"),
        explode(shinglesOfTokens(col("toks"), 2)).as("g"))
      var uni = docs.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      if (cacheUni) uni = uni.persist(StorageLevel.MEMORY_AND_DISK)
      val vocab = uni.agg(count(lit(1)).as("v"))
      val big = bg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
        .withColumn("w1", substring_index(col("g"), " ", 1))
      val lp = big.join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(broadcast(vocab))
        .select(col("g"),
          floor(lit(1000000.0) *
            log((col("c2").cast("double") + 0.5) /
              (col("c1").cast("double") + lit(0.5) * col("v").cast("double"))))
            .as("lp_scaled"))
      bg.join(lp, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_scaled")).as("s"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("s").cast("double") /
            (col("n_bigrams").cast("double") * 1000000.0)).as("avg_logp"))
        .orderBy(col("doc_id"))
    }

    // ---- t_quality_classifier exact form ------------------------------
    def nbExact(cacheDocs: Boolean, cacheCounts: Boolean): DataFrame = {
      var docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          (substring(col("source"), 4, 10).cast("int") % 5 === 0).as("tgt"),
          tokens(col("text")).as("toks"))
      if (cacheDocs) docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
      val toks = docs.select(col("doc_id"), col("tgt"),
        explode(col("toks")).as("w"))
      var counts = toks.groupBy(col("w"))
        .agg(count(when(col("tgt"), 1)).as("c_t"),
          count(when(!col("tgt"), 1)).as("c_o"))
      if (cacheCounts) counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
      val totals = counts.agg(sum(col("c_t")).as("nt"),
        sum(col("c_o")).as("no"), count(lit(1)).as("v"))
      val prior = docs.agg(
        floor(lit(1000000.0) *
          log(count(when(col("tgt"), 1)).cast("double") /
            count(when(!col("tgt"), 1)).cast("double"))).as("prior_scaled"))
      def weight(ct: Column, co: Column): Column =
        floor(lit(1000000.0) *
          (log((ct.cast("double") + 1.0) /
              (col("nt") + col("v")).cast("double")) -
           log((co.cast("double") + 1.0) /
              (col("no") + col("v")).cast("double"))))
      val w = counts.crossJoin(broadcast(totals))
        .select(col("w"), weight(col("c_t"), col("c_o")).as("w_scaled"))
      toks.join(w, Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("w_scaled")).as("sw"))
        .crossJoin(broadcast(prior))
        .select(col("doc_id"), col("n_tokens"),
          ((col("sw") + col("prior_scaled")).cast("double") / 1000000.0)
            .as("log_odds"))
        .withColumn("pred_target", col("log_odds") > 0.0)
        .orderBy(col("doc_id"))
    }

    // ---- t_tfidf_topk ---------------------------------------------------
    def tfidf(cacheTf: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      var tf = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(tokens(lower(col("text")))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      if (cacheTf) tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy((col("tf").cast("double") / col("df").cast("double")).desc,
          col("word"))
      tf.join(df, "word")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }

    (1 to rounds).foreach { r =>
      System.err.println(s"[prof] --- round $r ---")
      time("lm  prod (no cache)       ")(lmExact(false, false).count())
      time("lm  uni cached            ")(lmExact(false, true).count())
      time("lm  docs+uni cached       ")(lmExact(true, true).count())
      time("nb  prod (no cache)       ")(nbExact(false, false).count())
      time("nb  counts cached         ")(nbExact(false, true).count())
      time("nb  docs+counts cached    ")(nbExact(true, true).count())
      time("tfidf prod (no cache)     ")(tfidf(false).count())
      time("tfidf tf cached           ")(tfidf(true).count())
    }
    s.stop()
  }
}
