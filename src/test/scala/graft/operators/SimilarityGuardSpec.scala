package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The brute-force near-dup form is an exact/oracle utility for
  * query-set-sized inputs; corpus-scale inputs must be refused with a
  * pointer at the LSH-bucketed scale path, not silently planned as an
  * all-pairs join. */
class SimilarityGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("embeddingNearDup refuses inputs above the brute-force cap") {
    // synthesize an embeddings table larger than a lowered cap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bf-cap").toString
    spark.range(150)
      .select(col("id").as("vec_id"),
        array_repeat(lit(1.0f), 8).as("embedding"),
        lit(0).as("label"))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    spark.conf.set("spark.graft.bruteforce.maxRows", "100")
    try {
      val e = intercept[graft.model.DesignedSkip] {
        SimilarityQueries.embeddingNearDup(spark, dir)
      }
      assert(e.getMessage.contains("sim_near_dup_lsh"), e.getMessage)
      // at or under the cap the exact form still runs
      spark.conf.set("spark.graft.bruteforce.maxRows", "150")
      assert(SimilarityQueries.embeddingNearDup(spark, dir).count() > 0)
    } finally spark.conf.unset("spark.graft.bruteforce.maxRows")
  }
}
