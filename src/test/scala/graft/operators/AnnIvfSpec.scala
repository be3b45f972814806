package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("kmeans is deterministic and partitions the sample") {
    val sample = Array.tabulate(100)(i =>
      Array.tabulate(4)(d => (i % 10) + d * 0.1))
    val a = AnnIvf.kmeans(sample, 4, 5)
    val b = AnnIvf.kmeans(sample, 4, 5)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val cells = sample.map(AnnIvf.nearest(a, _)).toSet
    assert(cells.size > 1, "all points collapsed into one cell")
  }

  test("ivf recall@5 vs brute force with probed-cell pruning") {
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // one execution, two assertions: only the centroid model is
    // memoized, so a second annTopK call re-runs the full distributed
    // probe/re-rank job for nothing
    val rows = AnnIvf.annTopK(spark, dir, nlist = 8, nprobe = 4).collect()
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall too low: $recall")
    // ranked output must be exactly re-ranked by cosine
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }
}
