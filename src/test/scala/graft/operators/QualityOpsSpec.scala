package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.functions.GraftFunctions.tokens

/** Invariants for the round-7 quality/importance operators (exact
  * values are covered by the DuckDB gate): Gopher repetition rules,
  * bigram-LM scoring, DSIR importance weights, SQ8 quantized search. */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("gopher rules: fractions in [0,1], one row per multi-token doc") {
    val g = TextQueries.gopherNgram(spark, dir).cache()
    try {
      val nMulti = Tables.documents(spark, dir)
        .filter(size(tokens(col("text"))) >= 2).count()
      assert(g.count() == nMulti)
      val fracs = Seq("top2_frac", "top3_frac", "top4_frac",
        "dup5_frac", "dup6_frac")
      for (f <- fracs)
        assert(g.filter(col(f) < 0.0 || col(f) > 1.0).count() == 0, f)
      // dominant 2-gram covers at least as many chars as any wider
      // top gram is frequent — sanity: top2 >= top4 can fail, but a
      // doc's top2 chars must be >= 2/4 of nothing… keep to: flagged
      // docs actually exceed a threshold
      val badFlags = g.filter(col("flagged") &&
        !(col("top2_frac") > 0.20 || col("top3_frac") > 0.18 ||
          col("top4_frac") > 0.16 || col("dup5_frac") > 0.15 ||
          col("dup6_frac") > 0.14)).count()
      assert(badFlags == 0)
    } finally g.unpersist()
  }

  test("gopher rules plan: single documents scan, no joins") {
    val df = TextQueries.gopherNgram(spark, dir)
    df.collect()
    // count only the AQE final plan, not the "Initial Plan" echo
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("Scan parquet")) <= 1, p)
  }

  test("lm scoring: every doc scores strictly negative, counts exact") {
    val lm = TextQueries.lmPerplexity(spark, dir).cache()
    try {
      // (c2+0.5)/(c1+0.5V) < 1 always (c2 <= c1), so logp < 0
      assert(lm.filter(col("avg_logp") >= 0.0).count() == 0)
      // n_bigrams = token count - 1, exactly
      val expected = Tables.documents(spark, dir)
        .select(col("doc_id"),
          (size(tokens(col("text"))) - 1).cast("long").as("e"))
      val joined = lm.join(expected, "doc_id")
      assert(joined.filter(col("n_bigrams") =!= col("e")).count() == 0)
    } finally lm.unpersist()
  }

  test("dsir weights: feature count is 2·tokens−1; weights finite") {
    val d = CurationQueries.dsirWeights(spark, dir).cache()
    try {
      val expected = Tables.documents(spark, dir)
        .select(col("doc_id"),
          (size(tokens(col("text"))) * 2 - 1).cast("long").as("e"))
      assert(d.join(expected, "doc_id")
        .filter(col("n_feats") =!= col("e")).count() == 0)
      assert(d.filter(isnan(col("weight")) ||
        col("weight").isNull).count() == 0)
    } finally d.unpersist()
  }

  test("sq8 search tracks the exact ranking (top-1 recall >= 0.8)") {
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .filter(col("rank") === 1).select(col("qid"), col("cid").as("e"))
    val sq8 = SimilarityQueries.sq8TopK(spark, dir)
      .filter(col("rank") === 1).select(col("qid"), col("cid").as("q"))
    val n = exact.count()
    val agree = exact.join(sq8, "qid").filter(col("e") === col("q")).count()
    assert(n > 0 && agree.toDouble / n >= 0.8, s"$agree/$n")
  }

  test("sq8 quantized cosine stays within quantization error of exact") {
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .select(col("qid"), col("cid"), col("cos"))
    val sq8 = SimilarityQueries.sq8TopK(spark, dir)
      .select(col("qid"), col("cid"), col("qcos"))
    val worst = sq8.join(exact, Seq("qid", "cid"))
      .agg(max(abs(col("qcos") - col("cos")))).head.getDouble(0)
    assert(worst < 0.05, s"worst |qcos-cos| = $worst")
  }

  test("unimax: water-filling exhausts the budget under the epoch cap") {
    val u = CurationQueries.unimaxSampling(spark, dir).cache()
    try {
      val total = Tables.documents(spark, dir)
        .select(sum(size(tokens(col("text")))).cast("long"))
        .head.getLong(0)
      val budget = total / 2
      val allocSum = u.agg(sum(col("alloc_tokens"))).head.getDouble(0)
      // budget fully spent (the uncapped tail absorbs the remainder)
      assert(math.abs(allocSum - budget) < 1e-6 * budget,
        s"alloc $allocSum vs budget $budget")
      // nobody exceeds the 4-epoch cap; capped sources sit exactly on it
      assert(u.filter(col("epochs") > 4.0 + 1e-12).count() == 0)
      assert(u.filter(col("supply_capped") && col("epochs") =!= 4.0)
        .count() == 0)
      // every uncapped source gets the same uniform share
      val shares = u.filter(!col("supply_capped"))
        .select(col("alloc_tokens")).distinct().count()
      assert(shares <= 1, s"$shares distinct uncapped shares")
      // and that share is >= any capped source's full supply (water level)
      val capped = u.filter(col("supply_capped"))
      if (capped.count() > 0 && shares == 1) {
        val maxCapped = capped.agg(max(col("alloc_tokens"))).head.getDouble(0)
        val share = u.filter(!col("supply_capped"))
          .head.getAs[Double]("alloc_tokens")
        assert(share >= maxCapped - 1e-9, s"share $share < capped $maxCapped")
      }
    } finally u.unpersist()
  }

  test("quality classifier: exact occurrence counts, decision matches score") {
    val c = TextQueries.qualityClassifier(spark, dir).cache()
    try {
      val expected = Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("e"))
      assert(c.join(expected, "doc_id")
        .filter(col("n_tokens") =!= col("e")).count() == 0)
      assert(c.filter(isnan(col("log_odds")) ||
        col("log_odds").isNull).count() == 0)
      assert(c.filter(col("pred_target") =!=
        (col("log_odds") > 0.0)).count() == 0)
    } finally c.unpersist()
  }

  test("keep-best retention: argmax-quality member per surviving cluster") {
    val kept = DedupQueries.pipelineKeepBest(spark, dir).cache()
    try {
      val members = DedupQueries.simhashClusters(spark, dir)
        .join(TextQueries.qualityScore(spark, dir).filter(col("keep"))
          .select(col("doc_id"), col("ttr")), "doc_id")
        .cache()
      try {
        // one row per cluster that has >= 1 quality-passing member
        val nClusters = members.select(col("cluster_rep")).distinct().count()
        assert(kept.count() == nClusters)
        // the kept doc's ttr is the cluster max
        val best = members.groupBy(col("cluster_rep"))
          .agg(max(col("ttr")).as("best_ttr"),
            count(lit(1)).as("n"))
        val bad = kept.join(best, "cluster_rep")
          .filter(col("ttr") =!= col("best_ttr") ||
            col("n_kept_members") =!= col("n")).count()
        assert(bad == 0)
      } finally members.unpersist()
    } finally kept.unpersist()
  }
}
