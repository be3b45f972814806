package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}

import graft.operators.DedupQueries

/** Dev-only skew audit for the near-dup candidate generators (VERDICT
  * r17 ask #8): does candidate-pair volume grow ~linearly with the
  * corpus, and is any prefix key / LSH band bucket hot enough to need
  * salting (guide §2 skew)?
  *
  * Per scale factor it logs, from exactly the production frames
  * ([[DedupQueries.docShingleArrays]] / minhashBuckets /
  * ngramCandidates):
  *  - dedup_ngram_jaccard: surviving candidate-pair count, prefix-key
  *    population (rows in the exploded prefix index), the top prefix
  *    keys by frequency f and their implied pre-filter pair mass
  *    f·(f−1)/2 — the quantity a hot key would blow up.
  *  - dedup_minhash_lsh: distinct candidate pairs, bucket count,
  *    pre-distinct pair mass Σ s·(s−1)/2 over bucket sizes s, and the
  *    top bucket sizes per band.
  *
  * Counts are exact and host-weather-independent — this is a
  * volume/skew audit, not a timing run.
  */
object ProfileDedupSkew {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/benchdata/sf1",
        "/root/repo/benchdata/sf10")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    dirs.foreach { dir =>
      println(s"=== $dir")
      val docs = DedupQueries.docShingleArrays(s, dir)
      val nDocs = docs.count()
      println(s"[ngram] docs=$nDocs")

      // the production prefix index shape (first n - ceil(0.7n) + 1
      // sorted keys per doc), rebuilt here for frequency accounting
      val prefixLen = (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(0.7))
        + 1).cast("int")
      val prefix = docs.select(F.col("doc_id"),
        F.explode(F.slice(F.col("khs"), F.lit(1), prefixLen)).as("kh"))
      val khFreq = prefix.groupBy(F.col("kh"))
        .agg(F.count(F.lit(1)).as("f")).cache()
      val prefixRows = prefix.count()
      val khStats = khFreq.agg(
        F.count(F.lit(1)).as("distinct_kh"),
        F.sum(F.col("f") * (F.col("f") - 1) / 2).as("pair_mass"),
        F.max(F.col("f")).as("max_f")).head()
      println(s"[ngram] prefix_rows=$prefixRows distinct_kh=${khStats.getLong(0)} " +
        s"prefilter_pair_mass=${khStats.getDouble(1).toLong} max_key_freq=${khStats.getLong(2)}")
      khFreq.orderBy(F.col("f").desc, F.col("kh")).limit(10).collect()
        .foreach(r => println(s"[ngram]   hot kh=${r.getLong(0)} f=${r.getLong(1)} " +
          s"pairs=${r.getLong(1) * (r.getLong(1) - 1) / 2}"))
      khFreq.unpersist(blocking = false)
      val nCand = DedupQueries.ngramCandidates(s, dir).count()
      println(s"[ngram] surviving_candidates=$nCand")

      val buckets = DedupQueries.minhashBuckets(docs).cache()
      val bRows = buckets.count()
      val bSizes = buckets.groupBy(F.col("band"), F.col("bucket"))
        .agg(F.count(F.lit(1)).as("sz")).cache()
      val bStats = bSizes.agg(
        F.count(F.lit(1)).as("n_buckets"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).as("pair_mass"),
        F.max(F.col("sz")).as("max_sz")).head()
      println(s"[minhash] band_rows=$bRows buckets=${bStats.getLong(0)} " +
        s"predistinct_pair_mass=${bStats.getDouble(1).toLong} max_bucket=${bStats.getLong(2)}")
      bSizes.orderBy(F.col("sz").desc, F.col("bucket")).limit(10).collect()
        .foreach(r => println(s"[minhash]   hot band=${r.getInt(0)} sz=${r.getLong(2)} " +
          s"pairs=${r.getLong(2) * (r.getLong(2) - 1) / 2}"))
      val nCandMh = DedupQueries.minhashBuckets(docs).as("a")
        .join(DedupQueries.minhashBuckets(docs).as("b"),
          F.col("a.band") === F.col("b.band") &&
            F.col("a.bucket") === F.col("b.bucket") &&
            F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id")).distinct().count()
      println(s"[minhash] distinct_candidates=$nCandMh")
      bSizes.unpersist(blocking = false)
      buckets.unpersist(blocking = false)
      docs.unpersist(blocking = false)
      s.catalog.clearCache()
    }
    s.stop()
  }
}
