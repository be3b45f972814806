package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the LSH near-dup pairs path. */
object ProfileAnn {
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
    val n = time("count")(graft.Tables.embeddings(s, dir).count())
    val bits = graft.operators.AnnLsh.bitsFor(s, n)
    System.err.println(s"[prof] n=$n bits=$bits")
    val sig = graft.operators.AnnLsh.sigTable(s, dir, 16, bits)
    time("sig count")(System.err.println("[prof] sig rows=" + sig.count()))
    val ids = sig.as("a")
      .join(sig.as("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    time("cand multiset")(System.err.println("[prof] cands=" + ids.count()))
    val dd = ids.distinct()
    time("cand distinct")(System.err.println("[prof] distinct=" + dd.count()))
    time("full query")(System.err.println("[prof] out=" +
      graft.operators.AnnLsh.nearDupLsh(s, dir).count()))
    s.stop()
  }
}
