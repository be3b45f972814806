package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and records the one-line JSON.
  *
  * Prints exactly one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // local profiling knobs (driver passes no args): args(0) = comma-
    // separated substring filters on query names ("-" prefix excludes;
    // no inclusion tokens = include all), args(1) = repeat count
    val tokens = args.headOption.getOrElse("").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val (excludes, includes) = tokens.partition(_.startsWith("-"))
    val matches = (name: String) =>
      (includes.isEmpty || includes.exists(name.contains)) &&
        !excludes.exists(e => name.contains(e.drop(1)))
    val repeats = if (args.length > 1) args(1).toInt else 1
    require(repeats >= 1, s"repeats must be >= 1, got $repeats")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // split-size override for local profiling (A/B'd at 4m vs the
      // 128m default: smaller splits parallelize single-file kernel
      // scans slightly but cost more on the iterative CC queries, so
      // the default stands)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "128m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM + parquet footers once with the flagship query
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // scale-bench overrides: oracle-gated entries whose gates pin
    // parameters to the static sf0.01 oracle (and refuse larger
    // corpora so a silent divergence can't pass the gate) are benched
    // through their auto-scaling production forms instead
    val benchForms: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "sim_near_dup_lsh" ->
          ((s, d) => graft.operators.AnnLsh.nearDupLsh(s, d)),
        "sim_ann_lsh" ->
          ((s, d) => graft.operators.AnnLsh.annTopKScaled(s, d)),
        "sim_ann_multiprobe" ->
          ((s, d) => graft.operators.AnnLsh.annMultiProbeScaled(s, d)),
        // the oracle form's 6-bit width gate refuses corpora past
        // 2048 vectors (pinned static SQL); the bench runs the
        // auto-width production pipeline, like the two entries above
        "sim_sem_dedup" ->
          ((s, d) => graft.operators.SemDedup.semDedupScaled(s, d)),
        // exact-form guards: the _pruned twins below set the topK
        // confs at construction, which would otherwise leak into the
        // exact forms on the next sweep/dir — pin them unset here
        "t_lm_perplexity" -> ((s, d) => {
          s.conf.unset("spark.graft.lm.topK")
          graft.operators.TextQueries.lmPerplexity(s, d)
        }),
        "t_quality_classifier" -> ((s, d) => {
          s.conf.unset("spark.graft.nb.topK")
          graft.operators.TextQueries.qualityClassifier(s, d)
        }))

    // Bench-only rows: the production corpus-model forms (fixed-size
    // top-K model tables with smoothed backoff — the 100 TB shape)
    // benched ALONGSIDE the exact oracle forms, so the artifact
    // carries a measured curve for both. Not part of SparkEntry
    // .queries (the oracle gate runs the exact default-conf forms).
    val extraQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "t_lm_perplexity_pruned" -> ((s, d) => {
          s.conf.set("spark.graft.lm.topK", "262144")
          graft.operators.TextQueries.lmPerplexity(s, d)
        }),
        "t_quality_classifier_pruned" -> ((s, d) => {
          s.conf.set("spark.graft.nb.topK", "262144")
          graft.operators.TextQueries.qualityClassifier(s, d)
        }),
        // the amortized side of the pay-once layout trade: runs after
        // the cold row (alphabetical order), so ensureBucketed serves
        // from the session memo and this times the exchange-free READ
        // path — the cost every query after the first pays at 100 TB
        "layout_bucketed_join_warm" -> ((s, d) =>
          graft.sources.BucketedLayout.bucketedJoin(s, d)))

    // Queries whose CONSTRUCTION performs real MEMOIZED
    // model/materialization work: the CC family materializes the
    // shared cluster-label table (DedupQueries.simhashClusters memo).
    // Two bench rules keep that honest: (1) they are never warmed at
    // the bench SF — the work stays inside the timed sweep (for the CC
    // memo, charged to the family's first query; the other two reuse
    // it, the sweep semantics the sharing is FOR); (2) with repeats >
    // 1 they report the FIRST repeat, not the min — a later CC repeat
    // hits the memo and would report only the parquet-read tail.
    // NOTE the text-scorer forms (t_lm_perplexity /
    // t_quality_classifier AND their _pruned twins) are deliberately
    // NOT here: all four rebuild their corpus model inside every
    // repeat (the pruned twins re-collect the K-bounded model each
    // construction — no memo, no scratch table), so min-over-repeats
    // hides nothing. Listing them here just reported one-time JIT as
    // if it were query cost (r10 measured the classifier at 9.3 s
    // first repeat vs 6.4 s steady-state for exactly that reason; the
    // pruned twins were de-listed in r11 on the same argument).
    val heavyConstruction =
      Set("dedup_clusters", "dedup_simhash_pairs", "pipeline_keep",
        "pipeline_keep_best",
        // constructing this one MATERIALIZES the bucketed fact-table
        // copies (the write-side cost the co-location lever trades
        // for) — it must be paid inside the first timed repeat, not
        // vanish into the untimed warm-up. The _warm twin is here for
        // the warm-up EXCLUSION only (constructing it at the bench SF
        // during warm-up would materialize the copies untimed and rob
        // the cold row): in the timed sweep it runs after the cold
        // row, so its first repeat is already the memoized read path
        // it exists to measure.
        "layout_bucketed_join", "layout_bucketed_join_warm",
        // the embedding near-dup pair memo: built by the family's
        // first timed query, reused by the rest — warming it at the
        // bench SF would hide the family's dominant cost untimed
        "sim_near_dup_lsh", "sim_sem_dedup",
        // the IVF quantizer (count + sample + k-means + centroid
        // broadcast) is construction-memoized per table version —
        // the first repeat pays the training, later ones must not
        // hide it
        "sim_ann_ivf",
        // the pagerank adjacency (orders⋈lineitem→distinct, persisted)
        // is construction-memoized per table version — same rule
        "graph_pagerank",
        // quantileSelect's CONSTRUCTION runs its driver-side control
        // jobs (bounds + histogram + sub-histogram — 3 corpus scans);
        // not memoized (each repeat honestly rebuilds), but the
        // warm-up sweep must not execute corpus-scale work it only
        // means to plan, and min-over-repeats hides nothing since
        // every repeat pays the identical build
        "t_quantile_select")

    // Warm-up sweep (untimed): construct every query once against the
    // bench dir — this performs the construction-time memo scans (LSH
    // width gate, overlap index, CC materialization key) and Catalyst
    // analysis outside the timed region — and, when the tiny sf0.001
    // sibling exists, EXECUTE the sweep there once so codegen/JIT of
    // every kernel's hot path happens before the first timed query
    // (repeats=1 driver runs otherwise charge ~30 s of one-time JIT to
    // whichever queries run first).
    {
      val tiny = new java.io.File("/root/testdata/sf0.001")
      val warmDirs =
        (if (tiny.isDirectory && tiny.getPath != sfDir) Seq(tiny.getPath)
         else Seq.empty) :+ sfDir
      warmDirs.foreach { d =>
        (SparkEntry.queries ++ extraQueries).toSeq.sortBy(_._1)
          .filter(q => matches(q._1))
          .filter(q => d != sfDir || !heavyConstruction(q._1))
          .foreach { case (name, entryFn) =>
            val fn = benchForms.getOrElse(name, entryFn)
            try {
              val df = fn(spark, d)
              if (d != sfDir) df.count() // execute only at the tiny SF
            } catch { case _: Throwable => }
          }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }

    // Host-calibration probe: a FIXED synthetic workload (10M-long
    // RDD range-partition sort — shuffle write + sorted read, no
    // parquet, no query code) timed right before the sweep. The last
    // two rounds' driver totals moved with the box, not the code
    // (r10 drifted ~14% and needed a hand A/B to attribute); the
    // probe gives cross-round comparisons a same-box denominator.
    val calibSec = {
      val t0 = System.nanoTime()
      spark.sparkContext.range(0L, 10000000L, 1, numSlices = 32)
        .map(i => (i * 2654435761L) % 999999937L)
        .sortBy(identity)
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    System.err.println(f"[bench] calibration probe: $calibSec%.3f s")

    val timedNames = (SparkEntry.queries ++ extraQueries).keySet
      .filter(matches)
    // A name filter that selects the _warm layout row WITHOUT its cold
    // twin would charge the one-time bucketed materialization to the
    // first (reported) "warm" repeat — construct the copies untimed
    // here so the warm figure measures what its name claims
    if (timedNames("layout_bucketed_join_warm") &&
        !timedNames("layout_bucketed_join")) {
      try {
        graft.sources.BucketedLayout.ensureBucketed(spark, sfDir)
        System.err.println("[bench] warm-only filter: bucketed copies " +
          "materialized untimed so the _warm row stays a read-path measure")
      } catch { case e: Throwable =>
        // swallowing this silently would let the first TIMED "warm"
        // repeat quietly perform the full bucketed write — the exact
        // mislabeling this guard exists to prevent — so the failure
        // must at least be visible next to the artifact
        System.err.println("[bench] WARNING: warm-only bucketed " +
          s"materialization failed ($e) — the _warm row's first repeat " +
          "will include the one-time write")
      }
    }

    val results = (SparkEntry.queries ++ extraQueries).toSeq.sortBy(_._1)
      .filter(q => matches(q._1))
      .map { case (name, entryFn) =>
      val fn = benchForms.getOrElse(name, entryFn)
      var sec = Double.MaxValue
      var ok = true
      var skipped = false
      var rep = 0
      var planned = repeats
      while (rep < planned) {
        rep += 1
        val t0 = System.nanoTime()
        ok = try { fn(spark, sfDir).count(); ok }
          catch {
            // a DESIGNED refusal (e.g. the exact all-pairs form past
            // its row cap, whose scale path is a separate query) is not
            // an error — report it distinctly so a genuine failure of
            // the same query can never hide behind the skip sentinel
            case _: graft.model.DesignedSkip => skipped = true; ok
            case _: Throwable => false
          }
        // min over repeats: the steady-state cost, robust to one-off
        // JIT/page-cache/GC interference in either direction — except
        // construction-memoized queries, which report the first (cold)
        // repeat so the memoized work can't vanish from the number
        val t = (System.nanoTime() - t0) / 1e9
        if (heavyConstruction(name)) { if (rep == 1) sec = t }
        else sec = math.min(sec, t)
        // Fast rows are timer-noise-dominated at big SFs: one
        // descheduled task flips a sub-second query's sweep ratio
        // (r11's rollup_returns recorded 16.4× at sf10 against 3.3× on
        // re-measure). When a multi-repeat sweep meets a fast query,
        // extend it to three repeats so the reported min is a stable
        // figure — cost is < 2·3 s per fast row. repeats=1 driver runs
        // are untouched (extension would change their accounting), as
        // are heavyConstruction rows (they report the first repeat by
        // contract, which extension cannot stabilize).
        if (rep == planned && planned < 3 && repeats > 1 &&
            !heavyConstruction(name) && ok && !skipped && sec < 3.0)
          planned = 3
        if (repeats > 1) {
          System.err.println(
            f"[bench] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          // a repeat must not pay for its predecessor's garbage (the
          // bounded driver collects leave old-gen pressure behind)
          System.gc()
        }
      }
      // caches are query-scoped working sets — release before the next
      // query so storage memory never accumulates across the sweep.
      // clearCache only drops SQL-cached relations; localCheckpoint
      // blocks (iterative queries) live in the RDD registry and must be
      // unpersisted explicitly or they pin storage for the whole sweep.
      // Broadcast blocks are reaped by the ContextCleaner only after
      // their weak refs are GC'd — force that between queries (outside
      // the timed region) so no query pays for its predecessors.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      // error OUTRANKS skip: if any repeat genuinely failed, the query
      // reports -1 even when another repeat ended in a designed
      // refusal — otherwise a transient failure could hide behind the
      // skip sentinel
      (name, if (!ok) -1.0 else if (skipped) Double.NaN else sec)
    }
    // Artifact contract: the driver keeps only a short stdout tail, so
    // the LAST line is a compact (<2 KB) self-describing summary —
    // total, count, per-family sums, worst-5, skips/errors, and the
    // path of the full per-query record this main also writes.
    // Locale-pinned number formatting: the f interpolator uses the
    // JVM's default locale, and a comma-decimal locale (de_DE, fr_FR)
    // would render {"value":1,234} — invalid JSON, losing the round's
    // bench record to the driver's parse.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def j(v: Double): String = if (v.isNaN) "null" else num(v)
    // JSON string escape (same contract as Verify's): env-supplied
    // paths and builder-authored names must never break the artifact
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val measured = results.filter(r => !r._2.isNaN && r._2 >= 0)
    val skippedNames = results.filter(_._2.isNaN).map(_._1)
    val errorNames = results.filter(_._2 == -1.0).map(_._1)
    val total = measured.map(_._2).sum
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "bench_full.json")
    val qs = results.map { case (k, v) => q(k) + ":" + j(v) }
      .mkString("{", ",", "}")
    val arr = (xs: Seq[String]) => xs.map(q).mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,""" +
        s""""skipped":${arr(skippedNames)},"errors":${arr(errorNames)},""" +
        s""""calib_sec":${num(calibSec)},"sf":${q(sfDir)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-record write failed: $e") }
    println(full) // kept on stdout too for local runs; summary is LAST
    def family(n: String): String = {
      val p = n.takeWhile(_ != '_')
      if (p.matches("q\\d+")) "q" else if (p.matches("e\\d*")) "e" else p
    }
    val fams = measured.groupBy(r => family(r._1)).toSeq
      .map { case (f, rs) => f -> rs.map(_._2).sum }.sortBy(-_._2)
      .map { case (f, v) => q(f) + ":" + j(v) }.mkString("{", ",", "}")
    val worst = measured.sortBy(-_._2).take(5)
      .map { case (k, v) => q(k) + ":" + j(v) }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${num(total)},"unit":"sec","n":${measured.size},""" +
        s""""families":$fams,"worst5":$worst,"skipped":${arr(skippedNames)},""" +
        s""""errors":${arr(errorNames)},"calib_sec":${num(calibSec)},""" +
        s""""full":${q(fullPath)},"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
