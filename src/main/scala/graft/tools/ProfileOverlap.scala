package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.tokens
import graft.functions.HashExpressions.shingleHashes

/** Dev-only stage profiler for t_source_overlap: times the source-index
  * collect, the shingle->mask aggregation, the mask-collapse, and the
  * full query, against the collect_set fallback form — decides which
  * aggregation shape carries the plan. */
object ProfileOverlap {
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
      val srcNames = time("source index collect")(
        Tables.documents(s, dir).select(col("source")).distinct()
          .collect().map(_.getString(0)).sorted)
      val idxMap = typedlit(srcNames.zipWithIndex.toMap)
      val byKh = Tables.documents(s, dir)
        .select(explode(shingleHashes(tokens(col("text")), 3)).as("kh"),
          element_at(idxMap, col("source")).as("sidx"))
        .selectExpr("kh", "shiftleft(1L, sidx) AS bit")
        .groupBy(col("kh"))
        .agg(expr("bit_or(bit)").as("mask"))
      time("shingle->mask agg only")(byKh.count())
      time("mask collapse")(byKh.groupBy(col("mask")).count().count())
      val idxs = expr(
        s"filter(sequence(0, ${srcNames.length - 1}), " +
          "i -> (mask & shiftleft(1L, i)) != 0L)")
      val combos = concat(
        transform(idxs, x => struct(x.as("ia"), lit(-1).as("ib"))),
        transform(idxs, x => struct(lit(-1).as("ia"), x.as("ib"))),
        flatten(transform(idxs, (x, i) =>
          transform(slice(idxs, i + lit(2), size(idxs)), y =>
            struct(x.as("ia"), y.as("ib"))))))
      val counts = byKh.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
        .select(explode(combos).as("c"), col("cnt"))
        .groupBy(col("c.ia").as("ia"), col("c.ib").as("ib"))
        .agg(sum(col("cnt")).as("n"))
      time("counts (pair aggregation)")(counts.count())
      val full = graft.operators.CurationQueries.sourceOverlap(s, dir)
      time("full bitmask query")(full.count())
      val bySet = Tables.documents(s, dir)
        .select(col("source"),
          explode(shingleHashes(tokens(col("text")), 3)).as("kh"))
        .groupBy(col("kh"))
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
      time("shingle->collect_set agg only")(bySet.count())
      s.catalog.clearCache()
      System.gc()
    }
    s.stop()
  }
}
