package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two round-11 operator families: FastSS fuzzy match and
  * fixed-point PageRank. Both get an IN-TEST independent reference
  * (exhaustive cross join; a driver-side integer loop) so the specs
  * hold on any fixture, not just the oracle's. */
class GraphErSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy match equals the exhaustive cross-join definition") {
    import spark.implicits._
    val blocked = EntityResolution.fuzzyMatch(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // independent exhaustive reference: every (dirty, clean) pair,
    // driver-side Levenshtein
    val names = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      .collect()
    def corrupt(k: Long, n: String): String =
      if (k % 3 == 0) {
        val p = (k % 9).toInt + 9 // 0-indexed position of the bumped digit
        n.substring(0, p) + ('0' + ((n.charAt(p) - '0' + 1) % 10)).toChar +
          n.substring(p + 1)
      } else n
    val expected = (for {
      (dk, dn0) <- names.iterator
      dn = corrupt(dk, dn0)
      (ck, cn) <- names.iterator
      dist = levRef(dn, cn) if dist <= 1
    } yield (dk, ck, dist.toLong, dk == ck)).toSet
    assert(blocked === expected)
    // the fixture must exercise every interesting class: distance-1
    // self matches (corrupted rows), distance-0 self matches
    // (untouched rows), and at least one genuine cross-entity match
    assert(expected.exists { case (s, m, d, same) => same && d == 1 })
    assert(expected.exists { case (s, m, d, same) => same && d == 0 })
    assert(expected.exists { case (_, _, _, same) => !same })
  }

  test("fuzzy match covers insertion/deletion pairs across lengths") {
    import spark.implicits._
    // cross-length lev-1 pairs (pure insertion) — the case the masked
    // (substitution) family alone would miss; the identity×deletion
    // families must catch "abcd" vs "abd" (deletion), "abc" vs "abc"
    // (equal), "axc" (substitution)
    val left = Seq((1L, "abcd"), (2L, "abc"), (3L, "zzz"))
      .toDF("src_id", "dname")
    val right = Seq((10L, "abd"), (11L, "abc"), (12L, "axc"))
      .toDF("match_id", "cname")
    val got = EntityResolution.fuzzyPairs(left, right)
      .select("src_id", "match_id")
      .as[(Long, Long)].collect().toSet
    // (1,10) "abcd"~"abd" deletion, (1,11) "abcd"~"abc" deletion,
    // (2,10) "abc"~"abd" substitution, (2,11) equal, (2,12) "abc"~"axc"
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L)))
  }

  test("fuzzy blocking is candidate-exact: raw join output IS the answer") {
    import spark.implicits._
    // the claim under test is about the CANDIDATE stream, so rerun the
    // tagged-signature join WITHOUT the levenshtein confirm (via the
    // operator's probe hooks) and assert every raw collision is a true
    // lev<=1 pair — a regression reintroducing the deletion×deletion
    // distance-2 class ("ab"~"ba", "xy"~"yx" swaps planted) would
    // surface HERE, where the confirmed-output assertion alone could
    // never see it
    val left = Seq((1L, "abcd"), (2L, "abXd"), (3L, "ab"), (4L, "xy"))
      .toDF("src_id", "dname")
    val right = Seq((10L, "abcd"), (11L, "aYcd"), (12L, "ba"), (13L, "yx"))
      .toDF("match_id", "cname")
    val raw = left
      .select(col("src_id"), col("dname"),
        explode(EntityResolution.taggedSigsForProbe("dname", dirtySide = true))
          .as("sig"))
      .join(right.select(col("match_id"), col("cname"),
        explode(EntityResolution.taggedSigsForProbe("cname", dirtySide = false))
          .as("sig")), "sig")
      .select(col("src_id"), col("match_id"), col("dname"), col("cname"))
      .as[(Long, Long, String, String)].collect()
    // candidate exactness: NO raw collision exceeds distance 1
    raw.foreach { case (s, m, dn, cn) =>
      assert(levRef(dn, cn) <= 1, s"false candidate ($s, $m): '$dn' ~ '$cn'")
    }
    // and a substitution pair collides EXACTLY once (at its differing
    // position) — multiplicity is part of the cost claim
    assert(raw.count { case (s, m, _, _) => (s, m) == ((2L, 10L)) } === 1)
    // completeness: the raw pair set already equals the final answer
    val out = EntityResolution.fuzzyPairs(left, right)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(raw.map(t => (t._1, t._2)).toSet ===
      out.map(t => (t._1, t._2)).toSet)
    assert(out.map(t => (t._1, t._2)).toSet ===
      Set((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("best match is the argmin of the exhaustive pair set") {
    import spark.implicits._
    val got = EntityResolution.bestMatch(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // reference: argmin (dist, match_id) over the full-pairs form,
    // which itself is pinned to the exhaustive definition above
    val exp = EntityResolution.fuzzyMatch(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        rows.minBy(r => (r._3, r._2))
      }.toSeq.sortBy(_._1)
    assert(got === exp)
    // corrupted rows whose bumped name lands on a live key must
    // resolve to THAT entity (dist 0 beats the own-name dist 1)
    assert(got.exists { case (_, _, d, same) => d == 0 && !same })
  }

  test("best match factorizes duplicate names to the lowest holder id") {
    import spark.implicits._
    // clean registry holds "abc" under ids 50 and 7, "abd" under 3 —
    // a dist-0 match must beat the lower-id dist-1 match, and within
    // dist 0 the LOWEST holder id must win (the v2 record-level argmin
    // semantics the factorized form must preserve)
    val dirty = Seq((1L, "abc"), (2L, "abe"), (3L, "zzz"))
      .toDF("src_id", "dname")
    val clean = Seq((50L, "abc"), (7L, "abc"), (3L, "abd"))
      .toDF("match_id", "cname")
    val got = EntityResolution.bestMatchOn(dirty, clean)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // src 1: dist-0 "abc" → holder min(50, 7) = 7 (not dist-1 id 3)
    // src 2 "abe": dist-1 matches "abc"(min 7) and "abd"(3) → id 3
    // src 3: no match → absent
    assert(got === Set((1L, 7L, 0L, false), (2L, 3L, 1L, false)))
  }

  test("full-pairs form refuses corpus-scale registries (designed skip)") {
    graft.SparkTestUtil.withConf(spark, "spark.graft.er.maxRows", "10") {
      val e = intercept[graft.model.DesignedSkip] {
        EntityResolution.fuzzyMatch(spark, dir)
      }
      assert(e.getMessage.contains("er_best_match"), e.getMessage)
    }
    // best match has no cap — it must construct at any registry size
    graft.SparkTestUtil.withConf(spark, "spark.graft.er.maxRows", "10") {
      EntityResolution.bestMatch(spark, dir).queryExecution.analyzed
    }
  }

  test("streaming best match == batch twin (stateless broadcast resolve)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // replay the dirty registry as a stream; every micro-batch resolves
    // against the batch-built name model with NO stream-side state
    val dirtyRows = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      .collect()
    def corrupt(k: Long, n: String): String =
      if (k % 3 == 0) {
        val p = (k % 9).toInt + 9
        n.substring(0, p) + ('0' + ((n.charAt(p) - '0' + 1) % 10)).toChar +
          n.substring(p + 1)
      } else n
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(dirtyRows.map { case (k, n) => (k, corrupt(k, n)) }.toSeq)
    val out = EntityResolution.bestMatchStream(
      mem.toDF().toDF("src_id", "dname"), spark, dir)
    val q = out.writeStream.format("memory").queryName("twin_er_best")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("twin_er_best")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val want = EntityResolution.bestMatch(spark, dir)
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming best match surfaces unresolvable names as NULL rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // a stream name the batch registry never saw (and one with no
    // lev<=1 clean match) must EMIT with a null match, not silently
    // vanish — the unresolved records are what an online pipeline
    // routes to its slow path / next model refresh
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((999999L, "name-the-registry-never-held"))
    val out = EntityResolution.bestMatchStream(
      mem.toDF().toDF("src_id", "dname"), spark, dir)
    val q = out.writeStream.format("memory").queryName("er_unseen")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("er_unseen").collect()
      assert(rows.length === 1, rows.mkString("; "))
      assert(rows(0).getLong(0) === 999999L)
      assert(rows(0).isNullAt(1) && rows(0).isNullAt(2),
        s"unseen name should carry a null match: ${rows(0)}")
      assert(rows(0).getBoolean(3) === false)
    } finally q.stop()
  }

  test("driver-bench fixture stays under the all-pairs cap (sf0.1)") {
    // er_fuzzy_match at sf0.1 runs only because the registry is under
    // spark.graft.er.maxRows — fixture growth would silently flip the
    // driver-bench row to a designed skip; trip HERE instead so the
    // flip is a conscious decision (raise the cap or accept the skip)
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sf01/customer.parquet").exists)
    val n = graft.Tables.customer(spark, sf01).count()
    val cap = spark.conf.getOption("spark.graft.er.maxRows")
      .getOrElse("50000").toLong
    assert(n <= cap,
      s"sf0.1 registry ($n rows) crossed the er all-pairs cap ($cap): " +
        "er_fuzzy_match would silently skip in the driver bench")
  }

  test("pagerank releases its persisted adjacency on demand") {
    val sc = spark.sparkContext
    GraphQueries.releaseAdjacency(spark, dir) // clean slate
    val before = sc.getPersistentRDDs.keySet
    GraphQueries.pageRank(spark, dir).count()
    val pinned = sc.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty, "adjacency was not persisted")
    GraphQueries.releaseAdjacency(spark, dir)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"net new persisted RDDs after release: $leaked")
    // release evicted the memo too: a re-run re-persists instead of
    // silently recomputing the adjacency once per iteration off a
    // memoized-but-unpersisted frame
    GraphQueries.pageRank(spark, dir).count()
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
      "memo survived release: second run reused an unpersisted frame")
    GraphQueries.releaseAdjacency(spark, dir)
  }

  test("converged pagerank matches the unrolled form and releases cleanly") {
    import spark.implicits._
    val sc = spark.sparkContext
    GraphQueries.releaseAdjacency(spark, dir)
    val before = sc.getPersistentRDDs.keySet
    // eps=0 cannot converge early on a non-regular graph in 3 iters →
    // runs to maxIters and must equal the fixed-3-iteration oracle form
    val res = GraphQueries.pageRankConverged(spark, dir,
      epsPpm = 0L, maxIters = 3)
    val got = res.ranks.as[(Long, Long)].collect().toSeq
    assert(res.iters === 3)
    val want = GraphQueries.pageRank(spark, dir, iters = 3)
      .as[(Long, Long)].collect().toSeq
    assert(got === want)
    // a generous tolerance stops at the first measurable delta
    val loose = GraphQueries.pageRankConverged(spark, dir,
      epsPpm = Long.MaxValue, maxIters = 5)
    assert(loose.iters === 2, s"expected an immediate stop, ran ${loose.iters}")
    loose.release()
    res.release()
    GraphQueries.releaseAdjacency(spark, dir)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"net new persisted RDDs after release: $leaked")
  }

  test("bounded_lev1 equals min(levenshtein, 2) on adversarial strings") {
    import org.apache.spark.sql.functions.{col, least, levenshtein, lit}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abXY01€ß日😀" // multi-byte + astral chars
    def randStr(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    def mutate(s: String): String =
      if (s.isEmpty) "a"
      else rnd.nextInt(3) match {
        case 0 => // substitution
          val i = rnd.nextInt(s.length)
          s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) +
            s.substring(i + 1)
        case 1 => // insertion
          val i = rnd.nextInt(s.length + 1)
          s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) +
            s.substring(i)
        case _ => // deletion
          val i = rnd.nextInt(s.length)
          s.substring(0, i) + s.substring(i + 1)
      }
    val pairs = (1 to 400).map { _ =>
      val a = randStr()
      val b = rnd.nextInt(4) match {
        case 0 => a
        case 1 => mutate(a)
        case 2 => mutate(mutate(a))
        case _ => randStr()
      }
      (a, b)
    }
    val df = pairs.toDF("a", "b")
    val bad = df.select(
        graft.functions.HashExpressions.boundedLev1(col("a"), col("b"))
          .as("fast"),
        least(levenshtein(col("a"), col("b")).cast("long"), lit(2L))
          .as("exact"),
        col("a"), col("b"))
      .filter(col("fast") =!= col("exact")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("fuzzy match plan is a blocked equi-join, not a cross product") {
    val p = EntityResolution.fuzzyMatch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pagerank matches a driver-side integer reference") {
    import spark.implicits._
    val got = GraphQueries.pageRank(spark, dir)
      .as[(Long, Long)].collect().toMap
    // independent reference: same integer recurrence, scala loop
    val pairs = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).as[(Long, Long)]
      .collect()
      .map { case (c, s) => (c, s + GraphQueries.SuppOffset) }.distinct
    val edges = pairs.flatMap { case (c, p) => Seq((c, p), (p, c)) }
    val deg = edges.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = in.map { case (id, s) => id -> (150000L + 85L * s / 100L) }
    }
    assert(got === r)
    assert(got.nonEmpty)
    // ranks deviate from uniform (the graph is not regular) — guards
    // against a recurrence that degenerates to the initial vector
    assert(got.values.toSet.size > 1)
  }

  test("pagerank plan reuses the persisted adjacency across iterations") {
    val df = GraphQueries.pageRank(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
