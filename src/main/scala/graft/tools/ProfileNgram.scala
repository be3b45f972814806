package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for dedup_ngram_jaccard: times the shingle
  * inventory, the prefix-index candidate join, and the exact
  * verification separately — candidate-vs-verification dominance is
  * what decides where the next optimization goes. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
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
    for (rep <- 1 to reps) {
      System.err.println(s"[prof] --- rep $rep ---")
      val cand = graft.operators.DedupQueries.ngramCandidates(s, dir)
      val nCand = time("candidates (inventory + prefix join + distinct)")(
        cand.count())
      System.err.println(s"[prof] nCandidates=$nCand")
      // inventory is cached by the candidate pass; the delta between
      // full and candidates is the verification join + intersection.
      // A/B the verification join strategy within the same warm JVM.
      Seq("shuffle_hash", "smj").foreach { strat =>
        s.conf.set("spark.graft.ngram.verifyJoin", strat)
        val nPairs = time(s"full query (verify join = $strat)")(
          graft.operators.DedupQueries.ngramJaccard(s, dir).count())
        System.err.println(s"[prof] nPairs=$nPairs")
      }
      s.conf.unset("spark.graft.ngram.verifyJoin")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    s.stop()
  }
}
