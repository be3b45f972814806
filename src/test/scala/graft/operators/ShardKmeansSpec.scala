package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Invariants for the seeded shard assigner and the Lloyd-iteration
  * step (exact values are covered by the DuckDB gate). */
class ShardKmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("shard assignment: dense per-shard positions, reproducible") {
    val a = CurationQueries.shardAssign(spark, dir).cache()
    try {
      val nDocs = Tables.documents(spark, dir).count()
      assert(a.count() == nDocs)
      assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
      // positions are exactly 1..count(shard) within each shard
      val perShard = a.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("d"))
      assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("d") =!= col("n")).count() == 0)
      // the shuffle is seed-derived: a second run is row-identical
      val b = CurationQueries.shardAssign(spark, dir)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally a.unpersist()
  }

  test("shard assignment plan: partitioned window, no global sort rank") {
    val df = CurationQueries.shardAssign(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the rank window must be partitioned by shard — a global
    // row_number would single-partition the corpus
    assert(!p.contains("Window [") ||
      p.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("shard")), p)
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
  }

  test("kmeans step: confusion matrix partitions the corpus") {
    val cm = SimilarityQueries.kmeansStep(spark, dir).cache()
    try {
      val total = Tables.embeddings(spark, dir).count()
      assert(cm.agg(sum("n_vecs")).head.getLong(0) == total)
      // per-old-label row sums equal that label's vector count
      val perLabel = Tables.embeddings(spark, dir)
        .groupBy(col("label").cast("long").as("old_label"))
        .agg(count(lit(1)).as("n_label"))
      val rows = cm.groupBy("old_label").agg(sum("n_vecs").as("n_cm"))
        .join(perLabel, "old_label")
        .filter(col("n_cm") =!= col("n_label"))
      assert(rows.count() == 0)
      // labels in the synthetic fixture are cluster-aligned: the modal
      // reassignment of every label is itself (diagonal dominance)
      val offDiagModal = cm.withColumn("diag",
          (col("old_label") === col("new_label")).cast("int"))
        .groupBy("old_label")
        .agg(max(struct(col("n_vecs"), col("diag"))).as("m"))
        .filter(col("m.diag") === 0)
      assert(offDiagModal.count() == 0,
        "some label's modal reassignment is a different cluster")
    } finally cm.unpersist()
  }
}
