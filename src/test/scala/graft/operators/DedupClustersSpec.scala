package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The three connected-components paths (driver union-find under the
  * size threshold; above it, large/small-star contraction by default
  * or co-partitioned RDD min-label propagation) must reach the
  * identical fixpoint — clusters are algorithm-independent. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val thresholdKey = "spark.graft.cc.localEdgeThreshold"

  private def clusters(): Seq[(Long, Long)] =
    DedupQueries.simhashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("union-find, star contraction, and propagation agree exactly") {
    val viaQuery = clusters()
    assert(viaQuery.nonEmpty)
    // sanity: at least one real (multi-doc) cluster exists at sf0.001
    assert(viaQuery.exists { case (doc, rep) => doc != rep },
      "fixture produced no non-trivial clusters")
    // the three paths must run on the REAL pair set through ccForTest:
    // re-calling simhashClusters under forced confs (the old form of
    // this test) hit the per-session output memo and compared the
    // first run's parquet with itself — the conf never reached the
    // path selection and "propagate" had no executing test at all
    val pairDf = DedupQueries.hammingPairs(spark, dir)
      .select(org.apache.spark.sql.functions.col("id1"),
        org.apache.spark.sql.functions.col("id2"))
    def run(path: String): Seq[(Long, Long)] =
      DedupQueries.ccForTest(spark, pairDf, path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val local = run("local")
    spark.conf.set(thresholdKey, "0") // pure distributed loop
    try {
      assert(run("star") === local, "star diverged from union-find")
      assert(run("propagate") === local, "propagate diverged from union-find")
    } finally spark.conf.unset(thresholdKey)
    // and the end-to-end memoized labels agree with CC over their own
    // pair set for every pair-covered doc (singletons label themselves
    // upstream of CC)
    val byDoc = viaQuery.toMap
    local.foreach { case (doc, rep) =>
      assert(byDoc(doc) === rep, s"doc $doc labeled ${byDoc(doc)} != $rep")
    }
  }

  /** The selling point of large/small-star over min-label propagation
    * is O(log n) rounds on HIGH-DIAMETER graphs — propagation needs
    * O(diameter) rounds, which on a 100k-node path is 100k shuffles.
    * Prove the claim: one path graph, convergence in ≲ 20 rounds, and
    * the same labeling union-find produces. */
  /** Forcing threshold 0 disables the recursive bounded-collect
    * finish, so these two tests exercise the PURE distributed loop —
    * the form that runs when even the contracted residual exceeds the
    * driver bound. */
  private def withPureStar[T](body: => T): T = {
    spark.conf.set(thresholdKey, "0")
    try body finally spark.conf.unset(thresholdKey)
  }

  test("100k-node path graph: star contraction converges in O(log n) rounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val n = 100000
    // path 0-1-2-...-(n-1): a single component rooted at 0, diameter n
    val pairDf = spark.range(n - 1)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val got = withPureStar {
      DedupQueries.ccForTest(spark, pairDf, "star")
        .as[(Long, Long)].collect()
    }
    assert(DedupQueries.lastStarRounds > 0)
    assert(DedupQueries.lastStarRounds <= 20,
      s"took ${DedupQueries.lastStarRounds} rounds on a 100k path " +
        "(propagation-like behavior — O(log n) contraction is broken)")
    assert(got.length === n)
    assert(got.forall(_._2 === 0L), "every node must label to the min id 0")
  }

  test("star contraction labels random graphs like union-find") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 100
      // mix of chains (diameter stress), cliques, and random edges
      val chain = (0 until n / 2).sliding(2).map(w =>
        (w(0).toLong * 7 + 3, w(1).toLong * 7 + 3)).toSeq
      val rand = Seq.fill(n) {
        val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val edges = (chain ++ rand).distinct
      val pairDf = edges.toDF("id1", "id2")
      val expected = DedupQueries.ccForTest(spark, pairDf, "local")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val got = withPureStar {
        DedupQueries.ccForTest(spark, pairDf, "star")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      }
      assert(got === expected, s"trial $trial (n=$n) diverged")
      // min-label propagation on the same random graph
      val prop = DedupQueries.ccForTest(spark, pairDf, "propagate")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(prop === expected, s"trial $trial (n=$n) propagate diverged")
      // the recursive hybrid (star rounds + bounded union-find finish,
      // the default-threshold path) must reach the same fixpoint
      val hybrid = DedupQueries.ccForTest(spark, pairDf, "star")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(hybrid === expected, s"trial $trial (n=$n) hybrid diverged")
      // the DF large-star round picks broadcast-map vs shuffle-join by
      // the min-table's node count; force the join fallback (the
      // >gate form that runs when the touched-node set outgrows the
      // broadcast bound at 100 TB) and require the same fixpoint.
      // Pre-contraction is disabled here: with it on, small graphs
      // finish in the phase-0 union-find before any DF round runs.
      spark.conf.set("spark.graft.cc.broadcastNodeThreshold", "0")
      spark.conf.set("spark.graft.cc.preContract", "false")
      try {
        val joined = DedupQueries.ccForTest(spark, pairDf, "star")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        assert(joined === expected, s"trial $trial (n=$n) join-path diverged")
      } finally {
        spark.conf.unset("spark.graft.cc.broadcastNodeThreshold")
        spark.conf.unset("spark.graft.cc.preContract")
      }
      // the pure distributed loop with pre-contraction DISABLED (the
      // conf escape hatch) must also reach the fixpoint — pins that
      // correctness never depends on phase 0 running
      spark.conf.set("spark.graft.cc.preContract", "false")
      try {
        val noPre = withPureStar {
          DedupQueries.ccForTest(spark, pairDf, "star")
            .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        }
        assert(noPre === expected, s"trial $trial (n=$n) no-pre diverged")
        // and WITHOUT withPureStar: default localEdgeThreshold keeps
        // the DF large-star rounds in play, and the default (high)
        // broadcastNodeThreshold selects the broadcast-min-table
        // lookup branch — the production path for forests above the
        // driver bound, which no other variant executes (pre-contract
        // finishes small graphs in phase 0, the join-fallback block
        // forces the gate to 0, withPureStar skips DF rounds)
        val bmap = DedupQueries.ccForTest(spark, pairDf, "star")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        assert(bmap === expected,
          s"trial $trial (n=$n) broadcast-map path diverged")
      } finally spark.conf.unset("spark.graft.cc.preContract")
    }
  }
}
