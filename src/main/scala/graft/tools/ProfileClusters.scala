package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for dedup_clusters: times signature/pair
  * generation vs the union-find vs the singleton backfill, across
  * repeats, to localize the run-to-run variance. */
object ProfileClusters {
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
      val sig = graft.operators.DedupQueries.sigForProfile(s, dir)
      val nSig = time("sig64 count")(sig.count())
      val nDistinct = time("distinct sig count")(
        sig.select(col("simhash_hi"), col("simhash_lo")).distinct().count())
      System.err.println(s"[prof] nSig=$nSig nDistinctSig=$nDistinct")
      val pairs = time("pairs plan+cache")(
        graft.operators.DedupQueries.simhashPairsForProfile(s, dir))
      val n = time("pairs count")(pairs.count())
      System.err.println(s"[prof] nPairs=$n")
      val full = time("clusters full")(
        graft.operators.DedupQueries.simhashClusters(s, dir).count())
      System.err.println(s"[prof] clusters rows=$full")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    s.stop()
  }
}
