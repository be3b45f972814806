package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.functions.GraftFunctions.tokens

/** Semantic + plan-shape checks for the token-window chunker and the
  * per-label centroid aggregate (the oracle gate checks exact values;
  * these assert the invariants that make them trustworthy at scale). */
class ChunkCentroidSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("chunk windows cover every token with stride-spaced starts") {
    val chunks = CurationQueries.chunkWindows(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_start") + col("n_tok") - 1).as("last_covered"),
        min("chunk_start").as("first_start"),
        // starts must be exactly 1, 1+30, 1+60, ... — stride spacing
        max((col("chunk_start") - 1) % 30).as("max_off_stride"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok_doc"))
    val joined = chunks.join(docs, "doc_id")
    assert(joined.filter(col("last_covered") =!= col("n_tok_doc")).count() == 0,
      "some document's tokens are not fully covered by its chunks")
    assert(joined.filter(col("first_start") =!= 1).count() == 0)
    assert(joined.filter(col("max_off_stride") =!= 0).count() == 0)
    // ceil(n/stride) chunks per doc
    assert(joined.filter(col("n_chunks") =!=
      ceil(col("n_tok_doc").cast("double") / 30.0).cast("long")).count() == 0)
  }

  test("chunk windows plan is map-only: one scan, no join, no agg") {
    val df = CurationQueries.chunkWindows(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(p.linesIterator.count(_.contains("FileScan")) +
      p.linesIterator.count(_.contains("BatchScan")) >= 1)
  }

  test("centroids: one row per (label, dim), exact fixed-point identity") {
    val df = SimilarityQueries.embCentroids(spark, dir).cache()
    try {
      val labels = Tables.embeddings(spark, dir)
        .select(countDistinct("label")).head.getLong(0)
      val dims = Tables.embeddings(spark, dir)
        .select(size(col("embedding"))).head.getInt(0)
      assert(df.count() == labels * dims)
      // centroid must be exactly sum_e6/1e6/n in IEEE order
      val bad = df.filter(
        col("centroid") =!= col("sum_e6").cast("double") / 1e6 / col("n"))
      assert(bad.count() == 0)
      // each label's n is constant across dims (= its row count)
      assert(df.groupBy("label").agg(countDistinct("n").as("d"))
        .filter(col("d") =!= 1).count() == 0)
    } finally df.unpersist()
  }

  test("centroids aggregate map-side: partial before the shuffle") {
    val df = SimilarityQueries.embCentroids(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    // partial aggregation bounds shuffle rows at |labels|·dims per task
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }
}
