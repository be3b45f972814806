package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic for dedup_ngram_jaccard candidate quality:
  * the Jaccard histogram of the candidate set (how far the prefix
  * filter over-generates and WHERE the false candidates live) and
  * the prefix-key occurrence skew (whether hot template shingles in
  * prefixes drive the candidate count). */
object ProfileNgramDist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.HashExpressions.shingleHashes(
          graft.functions.GraftFunctions.tokens(col("text")), 3).as("khs"))
      .select(col("doc_id"), size(col("khs")).as("n_sh"), col("khs"))
      .cache()
    // prefix-key skew
    val prefix = docs.select(col("doc_id"),
      explode(slice(col("khs"), lit(1),
        (col("n_sh") - ceil(col("n_sh") * lit(0.7)) + 1).cast("int")))
        .as("kh"))
    val occ = prefix.groupBy(col("kh")).agg(count(lit(1)).as("occ"))
    occ.select(
      count(lit(1)).as("distinct_prefix_keys"),
      sum(col("occ")).as("prefix_rows"),
      sum(col("occ") * col("occ")).as("sum_occ_sq"),
      max(col("occ")).as("max_occ")).show(false)
    occ.orderBy(col("occ").desc).limit(20).show(false)
    // candidate jaccard histogram
    val cand = graft.operators.DedupQueries.ngramCandidates(s, dir)
    val a = docs.select(col("doc_id").as("id1"), col("n_sh").as("n1"),
      col("khs").as("k1"))
    val b = docs.select(col("doc_id").as("id2"), col("n_sh").as("n2"),
      col("khs").as("k2"))
    cand.join(a, "id1").join(b, "id2")
      .withColumn("inter",
        graft.functions.HashExpressions.sortedIntersectCount(
          col("k1"), col("k2")))
      .withColumn("j",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .groupBy(floor(col("j") * 10).as("j_decile"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("j_decile"))
      .show(false)
    s.stop()
  }
}
