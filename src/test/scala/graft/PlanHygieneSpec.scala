package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventQueries, RelationalQueries}

/** Physical-plan assertions: what must hold for the 100 TB scale-up —
  * filters reach the parquet scan, small dimensions broadcast, scans
  * read only the referenced columns, aggregates run inside
  * whole-stage codegen. */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 pushes filters into the parquet scan") {
    val p = plan(RelationalQueries.q6Forecast(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q6 scan prunes to the referenced columns only") {
    val p = plan(RelationalQueries.q6Forecast(spark, dir))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") &&
      readSchema.contains("l_discount"), readSchema)
    assert(!readSchema.contains("l_partkey") &&
      !readSchema.contains("l_returnflag"), readSchema)
  }

  test("dimension joins broadcast the small side") {
    val p = plan(EventQueries.e3JoinDim(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    val p5 = plan(RelationalQueries.q5NationRevenue(spark, dir))
    assert(p5.contains("BroadcastHashJoin"), p5)
  }

  test("aggregations run in whole-stage codegen") {
    val df = RelationalQueries.q1PricingSummary(spark, dir)
    df.collect() // materialize the AQE final plan
    val p = plan(df)
    // codegen'd operators carry the "*(n)" stage prefix in plan strings
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
    assert(p.contains("HashAggregate"), p)
  }

  /** Brute-force similarity ops intentionally score all pairs (their
    * scale path is the LSH variant). */
  private val intentionalCrossJoins = Set("sim_cosine_topk",
    "sim_knn_label", "sim_embedding_near_dup", "sim_ann_lsh",
    "sim_ann_ivf", "sim_sq8_topk",
    // ADC scores every candidate's 8-byte code array against the 10
    // bounded broadcast query LUTs — the scan side is the PQ index,
    // not the vectors; the nested loop's build side is 10 rows
    "sim_pq_adc_topk")

  /** Scalar-subquery queries broadcast a ONE-ROW aggregate into the
    * filter (`rev = max(rev)`, `bal·n > Σbal`) — the nested loop runs
    * over exactly one build row, which is the correct plan at any
    * scale. Still must not degrade to CartesianProduct (that would
    * mean the one-row side wasn't broadcast). */
  private val singleRowBroadcasts = Set("q15_top_supplier",
    "q22_idle_balance", "q11_important_stock", "t_mixture_rebalance",
    "t_dsir_weights", "t_lm_perplexity", "t_quality_classifier")
  // t_quantile_select left THIS allowlist in r11: its control tables
  // moved driver-side, so the returned plan is a plain broadcast
  // hash join against the literal sub-target frame — the strict
  // no-nested-loop assertion applies to it again.

  test("no query plan degrades to an unintended cross product") {
    SparkEntry.queries.keys
      .filterNot(intentionalCrossJoins)
      .foreach { name =>
        val p = plan(SparkEntry.queries(name)(spark, dir))
        assert(!p.contains("CartesianProduct"),
          s"$name plans a CartesianProduct")
        if (!singleRowBroadcasts(name))
          assert(!p.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin")
      }
  }

  test("asof join is one shuffle + sort, not a range cross product") {
    val p = plan(graft.operators.AsofJoin.asofLatestOrder(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  /** The CMS promise is a FIXED-SIZE shuffle: after the 256-cell
    * sketch materializes as an array literal, the survivor test is a
    * map-side filter and the only per-word aggregation runs over
    * survivors. A join anywhere in the plan would mean the
    * full-vocabulary truth pass crept back in. */
  test("cms heavy hitters plans no vocabulary-scale join") {
    val p = plan(graft.operators.SketchQueries
      .cmsHeavyHitters(spark, dir))
    assert(!p.contains("Join"), p)
  }

  /** The corpus must be scanned + tokenized exactly once: the
    * sketch-build job materializes the persisted word stream, and the
    * survivor pass must read it back from cache rather than re-scan
    * the parquet source. */
  test("cms survivor pass reads the cached word stream, not a second scan") {
    val p = plan(graft.operators.SketchQueries
      .cmsHeavyHitters(spark, dir))
    assert(p.contains("InMemoryTableScan") ||
      p.contains("TableCacheQueryStage"), p)
  }

  /** The r7 join-free plan: the corpus is scanned ONCE into the
    * (shingle -> source set) aggregation, pairs come from an explode
    * of that set (never a shingle self-join), and the totals/pairs
    * branches share one exchange via AQE stage reuse. Executes the
    * query so the final adaptive tree (where reuse is visible) is
    * what gets walked. */
  test("source overlap: one corpus scan, no shingle self-join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.operators.CurationQueries.sourceOverlap(spark, dir)
    df.collect() // finalize AQE so stage reuse is visible in the tree
    val nodes = SparkTestUtil.walkPlan(df.queryExecution.executedPlan)
    val docScans = nodes.collect {
      case f: FileSourceScanExec if f.toString.contains("documents") => f
    }
    assert(docScans.size == 1,
      s"expected exactly one documents scan, got ${docScans.size}:\n${plan(df)}")
    val shuffleJoins = nodes.filter(n =>
      n.nodeName.contains("SortMergeJoin") ||
        n.nodeName.contains("ShuffledHashJoin") ||
        n.nodeName.contains("CartesianProduct"))
    assert(shuffleJoins.isEmpty,
      s"overlap must not self-join the shingle set:\n${plan(df)}")
  }

  /** Duplicated-span detection must stay the linear shape: the only
    * joins are the shared-key join on kh and the per-doc left join —
    * never a corpus self-join on doc pairs — and the gaps-and-islands
    * window's doc_id partitioning must feed the run/per-doc
    * aggregations directly (no exchange between Window and its
    * downstream HashAggregates). */
  test("dup spans: window partitioning reused, no pairwise self-join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val df = graft.operators.CurationQueries.dupSpans(spark, dir)
    df.collect()
    val nodes = SparkTestUtil.walkPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")), plan(df))
    // the window feeds its aggregations through the existing doc_id
    // partitioning: no Exchange may sit between Window and the run-
    // length/per-doc HashAggregates above it
    def pathHasExchangeAboveWindow(pl: SparkPlan,
        sawAgg: Boolean = false): Boolean = pl match {
      case a: AdaptiveSparkPlanExec => pathHasExchangeAboveWindow(a.executedPlan, sawAgg)
      case q: QueryStageExec => pathHasExchangeAboveWindow(q.plan, sawAgg)
      case o if o.nodeName.contains("Window") => false
      case o if o.nodeName.contains("Exchange") && sawAgg =>
        o.children.exists(c => SparkTestUtil.walkPlan(c).exists(_.nodeName.contains("Window")))
      case o =>
        val saw = sawAgg || o.nodeName.contains("HashAggregate")
        o.children.exists(c => pathHasExchangeAboveWindow(c, saw))
    }
    assert(!pathHasExchangeAboveWindow(df.queryExecution.executedPlan),
      s"exchange between the window and its aggregations:\n${plan(df)}")
  }

  /** Linear counting runs both distincts (bitmap occupancy + exact) in
    * ONE aggregation job — no cross join, no second corpus scan. */
  test("distinct sketch is a single aggregation, no cross join") {
    val p = plan(graft.operators.SketchQueries.distinctSketch(spark, dir))
    assert(!p.contains("Join"), p)
  }

  /** The bloom probe must stay a zero-shuffle map-side filter: one
    * md5 per probe row sliced into three bit windows, tested against
    * the broadcast bitmask literal. The only join allowed is the
    * broadcast semi join of the exact branch. */
  test("bloom prefilter probes with a single shared md5, no shuffle join") {
    val p = plan(graft.operators.SketchQueries
      .bloomPrefilter(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // all three bit tests slice the SAME digest — exactly one distinct
    // md5 call site in the probe filter
    val md5Args = "md5\\([^)]*\\)".r.findAllIn(p).toSet
    assert(md5Args.size <= 1, s"probe hashes more than once: $md5Args\n$p")
  }

  /** Phase 1 must stay a bounded histogram aggregation and phase 2 a
    * broadcast probe of the ≤ 3 target buckets — no global sort of
    * the fact table anywhere, no shuffle join. */
  test("quantile selection plans no global sort and no shuffle join") {
    val df = graft.operators.SketchQueries.quantileSelect(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the only Sorts allowed are the two bounded window frames
    // (<= 4096 histogram rows; <= 3 bucket populations) and the
    // 3-row output ordering — never a corpus-wide Exchange+Sort pair
    // feeding a global order of the cents stream
    assert(!p.contains("rangepartitioning(c"), p)
  }

  /** The ANN/similarity top-k family must finish through the bounded
    * TopK aggregate (partition-local size-k buffers, tasks × k shuffle
    * rows), never a `row_number over Window.partitionBy(qid)` that
    * funnels every scored candidate into ≤ |queries| tasks — the one
    * O(corpus)-per-task stage the r11 verdict flagged on the 100 TB
    * ANN path. */
  test("ann top-k finishes are bounded aggregates, not corpus windows") {
    val pureTopK = Seq("sim_cosine_topk", "sim_sq8_topk", "sim_ann_ivf",
      "sim_ann_lsh", "sim_ann_multiprobe", "sim_pq_adc_topk",
      "sim_ivfpq_topk")
    pureTopK.foreach { name =>
      val p = plan(SparkEntry.queries(name)(spark, dir))
      assert(!p.contains("Window"),
        s"$name ranks through a global window:\n$p")
      assert(p.contains("ObjectHashAggregate"),
        s"$name lacks the bounded TopK aggregate:\n$p")
    }
    // the trained forms (the benched defaults since r15) share the
    // search paths but build their own auto-sized models — pin their
    // plan invariants independently of the oracle forms above
    val pt = plan(operators.AnnIvfPq.ivfPqTopKTrained(spark, dir))
    assert(!pt.contains("Window") && pt.contains("ObjectHashAggregate") &&
      pt.contains("BroadcastHashJoin") && !pt.contains("CartesianProduct"),
      s"trained IVF-PQ plan regressed:\n$pt")
    val pp = plan(operators.AnnPq.pqAdcTopKTrained(spark, dir))
    assert(!pp.contains("Window") && pp.contains("ObjectHashAggregate"),
      s"trained PQ-ADC plan regressed:\n$pp")
    // knnLabel keeps one window (the majority vote), but every window
    // must sit ABOVE the bounded aggregate — its input is ≤ queries × k
    // vote rows, never the scored candidate stream
    val kdf = SparkEntry.queries("sim_knn_label")(spark, dir)
    val nodes = SparkTestUtil.walkPlan(kdf.queryExecution.executedPlan)
    val windows = nodes.filter(_.nodeName.contains("Window"))
    assert(windows.nonEmpty, "knn vote window disappeared — update this test")
    windows.foreach { w =>
      assert(SparkTestUtil.walkPlan(w).exists(
        _.nodeName.contains("ObjectHashAggregate")),
        s"knn window not fed by the bounded aggregate:\n$w")
    }
  }

  /** IVF-PQ's probe is an inverted-list EQUI-join on the cell id —
    * unlike flat PQ-ADC (whose 10-row LUT broadcast is an intentional
    * nested loop), nothing here may cross or nest: the candidate
    * stream hash-joins the broadcast (queries × nprobe)-row LUT frame
    * on cell. */
  test("ivfpq probe is a broadcast hash join on the cell id") {
    val p = plan(SparkEntry.queries("sim_ivfpq_topk")(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("filter pushdown applies to the events replay path too") {
    val p = plan(EventQueries.e2Filter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    // user_id %5 can't push, but event_type equality must
    assert(p.contains("EqualTo(event_type,click)") ||
      p.contains("IsNotNull(event_type)"), p)
  }
}
