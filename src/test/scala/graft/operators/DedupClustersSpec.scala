package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two connected-components paths (driver union-find under the
  * size threshold, co-partitioned RDD min-label propagation above it)
  * must reach the identical fixpoint — clusters are
  * algorithm-independent. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("local union-find and distributed propagation agree exactly") {
    val key = "spark.graft.cc.localEdgeThreshold"
    val local = DedupQueries.simhashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.conf.set(key, "0") // force the distributed path
    try {
      val dist = DedupQueries.simhashClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(local.nonEmpty)
      assert(local.toSeq === dist.toSeq)
      // sanity: at least one real (multi-doc) cluster exists at sf0.001
      assert(local.exists { case (doc, rep) => doc != rep },
        "fixture produced no non-trivial clusters")
    } finally spark.conf.unset(key)
  }
}
