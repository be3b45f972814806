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

    // candidate reduction: bucketing must prune most of the corpus.
    // Measured on the ACTUAL candidate pair set (distinct (qid, cid)
    // sharing >= 1 bucket) against the 10·(N−10) brute-force pair
    // count — an earlier form divided sigTable's row count by the
    // table count, which is identically the corpus size and could
    // never fail, even with every vector in one bucket.
    import org.apache.spark.sql.functions.col
    val n = graft.Tables.embeddings(spark, dir).count()
    val sig = AnnLsh.sigTable(spark, dir, tables = 16, bits = 6)
    val candidatePairs = sig.filter(col("vec_id") >= 10)
      .withColumnRenamed("vec_id", "cid")
      .join(sig.filter(col("vec_id") < 10).withColumnRenamed("vec_id", "qid"),
        Seq("table", "bucket"))
      .select(col("qid"), col("cid")).distinct().count()
    val bruteForcePairs = 10.0 * (n - 10)
    assert(candidatePairs < bruteForcePairs * 0.8,
      s"LSH scored $candidatePairs of ${bruteForcePairs.toLong} " +
        "brute-force pairs — bucketing is not pruning")
  }

  /** The multi-probe claim: with a QUARTER of the index (4 tables vs
    * 16), probing 1-bit-flip neighbors must keep recall in the same
    * band as the single-probe form — and strictly beat single-probe
    * at the same 4 tables. */
  test("multi-probe at 4 tables matches 16-table single-probe recall") {
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]) =
      (exact & rows.map(r => (r.getLong(0), r.getLong(2))).toSet)
        .size.toDouble / exact.size
    val single16 = recallOf(AnnLsh.annTopK(spark, dir).collect())
    val single4 = recallOf(
      AnnLsh.annTopK(spark, dir, tables = 4).collect())
    val multi4 = recallOf(AnnLsh.annMultiProbe(spark, dir).collect())
    assert(multi4 >= single4,
      s"multi-probe ($multi4) should not lose to single-probe at the " +
        s"same 4 tables ($single4)")
    assert(multi4 >= single16 - 0.1,
      s"multi-probe at 4 tables ($multi4) fell out of the 16-table " +
        s"single-probe band ($single16)")
  }

  /** The occupancy-bounded width that keeps the near-dup bucket join
    * linear in corpus size: 6-bit floor through 2048 vectors (every
    * oracle-gated SF), then +1 bit per doubling. */
  test("LSH signature width scales with log2 of the corpus") {
    assert(AnnLsh.bitsFor(spark, 500) === 6)
    assert(AnnLsh.bitsFor(spark, 2000) === 6)
    assert(AnnLsh.bitsFor(spark, 2048) === 6)
    assert(AnnLsh.bitsFor(spark, 20000) === 10)
    assert(AnnLsh.bitsFor(spark, 2000000) === 16)
    spark.conf.set("spark.graft.lsh.bits", "12")
    try assert(AnnLsh.bitsFor(spark, 500) === 12)
    finally spark.conf.unset("spark.graft.lsh.bits")
  }

  test("ann ranks candidates by exact cosine") {
    val rows = AnnLsh.annTopK(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  /** The near-dup verify join has two physical branches: vector tables
    * under the size gate are BROADCAST (zero-shuffle verify — the
    * bench-scale path) and past the gate it falls back to a shuffle
    * join at the same float payload (the 100 TB path). Both must
    * verify the same candidates to the same exact cosines — force the
    * fallback by shrinking the gate to 1 byte. The fallback run uses a
    * marginally higher threshold: same signature width → identical
    * candidate set, but a distinct scratch-memo entry, so the shuffle
    * plan really executes; its output must then equal the broadcast
    * run's pairs filtered to that threshold. */
  test("near-dup verify fallback (shuffle join) matches the broadcast path") {
    val broadcastPairs = AnnLsh.nearDupLsh(spark, dir, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(broadcastPairs.nonEmpty)
    // the comparison below must compare NON-EMPTY sets, or a fixture
    // drift leaving every cosine under 0.45 would "verify" a broken
    // shuffle branch against the empty set
    assert(broadcastPairs.exists(_._3 >= 0.45),
      "fixture has no pairs above the fallback threshold — the " +
        "shuffle-branch comparison would be vacuous")
    graft.SparkTestUtil.withConf(spark,
        "spark.graft.neardup.broadcastMaxBytes", "1") {
      val shufflePairs = AnnLsh.nearDupLsh(spark, dir, threshold = 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(shufflePairs === broadcastPairs.filter(_._3 >= 0.45))
    }
  }
}
