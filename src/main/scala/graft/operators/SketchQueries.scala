package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.GraftFunctions.hexSliceLong

/** Deterministic sketch operators. A sketch earns its keep at 100 TB
  * by replacing the per-key shuffle with a FIXED-SIZE one: the
  * count-min sketch below aggregates word occurrences into d·w = 256
  * cells — a 256-row shuffle regardless of corpus size — instead of a
  * per-word aggregation over an unbounded vocabulary. The hash family
  * is md5-derived (salt j prepended), so the sketch — including its
  * characteristic collision OVERESTIMATES — is bit-identical in any
  * engine and the whole operator is exactly oracle-checkable; Spark's
  * native approx sketches (HLL++, KLL) trade that determinism away.
  */
object SketchQueries {

  private val D = 4 // hash rows
  private val W = 64 // buckets per row

  /** CMS bucket of `word` in hash row `j`: the j-th disjoint
    * 8-hex-digit window of ONE md5(word), mod W — the same
    * slice-one-digest family the bloom operator uses. One md5 per
    * occurrence feeds all d rows (the digest has 32 hex digits = 4
    * independent-enough 8-digit windows), which is 4× less hashing on
    * the corpus-sized occurrence stream than the earlier per-salt
    * md5("j:word") family; the sketch stays fully deterministic and
    * oracle-identical. */
  private def bucket(j: Int, md5hex: Column): Column =
    hexSliceLong(md5hex, 1 + 8 * j, 8) % W

  /** Heavy hitters via count-min: estimate = min over the d cells a
    * word hashes to; report every word whose estimate clears the
    * threshold next to its exact count (the sketch-then-exact-verify
    * composition a production pipeline runs — the exact pass touches
    * only the sketch's survivors). Overestimates from bucket
    * collisions are part of the contract and of the oracle.
    *
    * The plan realizes the sketch's promise: pass 1 is the
    * fixed-256-cell shuffle; the materialized cells (bounded at d·w
    * rows by construction) become an array literal, so the survivor
    * test `min_j cells[j][b_j(word)] >= 500` is a ZERO-SHUFFLE
    * map-side filter on the occurrence stream, and the only
    * vocab-keyed aggregation that runs is the exact count over the
    * few surviving words. No full-vocabulary shuffle anywhere.
    *
    * The occurrence stream never leaves its partition: a
    * mapPartitions pre-count collapses it to (word, cnt) per
    * PARTITION-DISTINCT word before anything else touches it, so the
    * md5 (and the d bucket derivations) run once per distinct word
    * per partition instead of once per occurrence, and the persisted
    * two-pass working set shrinks by the corpus's within-partition
    * repetition factor (~7× fewer rows and ~2.5× faster at the sf10
    * sweep vs the occurrence-level cache this replaced). The local
    * hash map is bounded by the partition's own vocabulary — capped
    * by maxPartitionBytes, not the corpus — and the sketch cells now
    * aggregate SUM(cnt) over it, which map-side-combines to the same
    * fixed d·w rows. Past memory the cache spills to local disk — at
    * 100 TB that is a sequential columnar re-read, strictly cheaper
    * than re-scanning + re-tokenizing the source table. Verify/Bench
    * unpersist between queries. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wc = Tables.documents(s, dir)
      .select(explode(graft.functions.GraftFunctions.tokens(lower(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .as[String]
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Long]()
        it.foreach(w => m.merge(w, 1L, (a, b) => a + b))
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          m.entrySet().iterator()).asScala
          .map(e => (e.getKey, e.getValue))
      }
      .toDF("word", "cnt")
      .withColumn("h", md5(col("word").cast("binary")))
      .select(col("word") +: col("cnt") +:
        (0 until D).map(j => bucket(j, col("h")).as(s"b$j")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the sketch itself: d*w = 256 cells, indexed j*W + b
    val cellArr = new Array[Long](D * W)
    wc.select(col("cnt"), explode(array((0 until D).map(j =>
        struct(lit(j).as("j"), col(s"b$j").as("b"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect()
      .foreach { case (j, b, cnt) => cellArr(j * W + b.toInt) = cnt }
    val cellsLit = typedLit(cellArr.toSeq)
    val est: Column = least((0 until D).map(j =>
      element_at(cellsLit,
        (lit(j * W) + col(s"b$j")).cast("int") + 1)): _*)
    // exact pass touches only the sketch's survivors: map-side filter
    // on the cached pre-counts, then a survivor-only aggregation
    // (est is constant per word, so min() just carries it through)
    wc.filter(est >= 500)
      .groupBy(col("word"))
      .agg(min(est).as("est"), sum(col("cnt")).as("true_n"))
      .select(col("word"), col("est"), col("true_n"))
      .orderBy(col("est").desc, col("word"))
  }

  val cmsHeavyHittersSql: String =
    """WITH occ AS (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      |  FROM documents),
      |w AS (SELECT word FROM occ WHERE length(word) > 0),
      |cells AS (
      |  SELECT j,
      |    CAST(('0x' || substr(md5(word), 1 + 8 * CAST(j AS INTEGER), 8)) AS BIGINT) % 64 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM w, range(4) r(j) GROUP BY 1, 2),
      |vocab AS (SELECT DISTINCT word FROM w),
      |vb AS (
      |  SELECT word, j,
      |    CAST(('0x' || substr(md5(word), 1 + 8 * CAST(j AS INTEGER), 8)) AS BIGINT) % 64 AS b
      |  FROM vocab, range(4) r(j)),
      |est AS (
      |  SELECT word, MIN(cnt) AS est FROM vb JOIN cells USING (j, b) GROUP BY word),
      |truth AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS true_n FROM w GROUP BY word)
      |SELECT word, est, true_n FROM est JOIN truth USING (word)
      |WHERE est >= 500
      |ORDER BY est DESC, word""".stripMargin

  private val K = 3 // bloom hash functions
  private val M = 4096 // bloom bits (~5 bits/key at sf0.01 ⇒ ~1% FP)

  /** k=3 bit positions sliced from ONE md5 per key (consecutive
    * 4-byte digest windows = hex windows 1-8 / 9-16 / 17-24 of the
    * oracle's `substr(md5(...))` form): same determinism and
    * independence as three salted digests at a third of the hash
    * cost. Computed by the native [[graft.functions.HashImpl
    * .bloomBits]] kernel — the hex-string + radix-parse pipeline it
    * replaces profiled 3× more expensive than the digest itself. */
  private def bloomBits(key: Column): Column =
    graft.functions.HashExpressions.bloomBitPositions(
      concat(lit("b:"), key.cast("string")), K, M)

  /** Bloom-filter join prefilter: the build side ('red%' parts)
    * becomes a k=3, m=4096-bit filter — at 100 TB you broadcast those
    * m bits (64 longs here) to prefilter the fact scan instead of
    * shuffling every fact row to a semi join; only the (few,
    * bounded-rate) false positives reach the exact join. The probe is
    * a ZERO-SHUFFLE map-side filter: each of a row's k bit positions
    * is a constant-time test against the bitmask literal, inside
    * whole-stage codegen. The md5-derived bits make the FALSE
    * POSITIVE COUNT itself deterministic and oracle-checked — the
    * quantity that decides whether a bloom prefilter is worth it. */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val build = Tables.part(s, dir).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    // build = bounded dimension side; materializing its m/64 mask
    // words on the driver IS the bloom build (what Spark's own
    // runtime bloom join does before broadcasting)
    val mask = new Array[Long](M / 64)
    build.select(explode(bloomBits(col("p_partkey"))).as("bit")).distinct()
      .as[Long].collect()
      .foreach(b => mask(b.toInt / 64) |= (1L << (b.toInt % 64)))
    val maskLit = typedLit(mask.toSeq)
    def member(bit: Column): Column =
      call_function("shiftright",
        element_at(maskLit, (bit / 64).cast("int") + 1),
        (bit % 64).cast("int")).bitwiseAND(lit(1L)) === 1
    // ONE probe pass computes both counts: the zero-shuffle bloom test
    // (kernel positions against the mask literal) and the exact ground
    // truth via the broadcast outer join
    val probe = Tables.lineitem(s, dir).select(col("l_partkey"))
      .withColumn("bits", bloomBits(col("l_partkey")))
    val inBloom = (0 until K)
      .map(j => member(element_at(col("bits"), j + 1)))
      .reduce(_ && _)
    probe
      .join(broadcast(build), col("l_partkey") === col("p_partkey"),
        "left_outer")
      .agg(
        count(when(inBloom, 1)).as("bloom_candidates"),
        count(col("p_partkey")).as("true_matches"))
      .select(explode(map(
        lit("bloom_candidates"), col("bloom_candidates"),
        lit("true_matches"), col("true_matches"))).as(Seq("metric", "n")))
      .orderBy(col("metric"))
  }

  val bloomPrefilterSql: String =
    """WITH build AS (
      |  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |bits AS (
      |  SELECT DISTINCT
      |    CAST(('0x' || substr(md5('b:' || CAST(p_partkey AS VARCHAR)), 1 + 8 * j, 8)) AS BIGINT) % 4096 AS bit
      |  FROM build, range(3) r(j)),
      |probe AS (
      |  SELECT md5('b:' || CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
      |pass AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
      |  WHERE CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 4096 IN (SELECT bit FROM bits)
      |    AND CAST(('0x' || substr(h, 9, 8)) AS BIGINT) % 4096 IN (SELECT bit FROM bits)
      |    AND CAST(('0x' || substr(h, 17, 8)) AS BIGINT) % 4096 IN (SELECT bit FROM bits)),
      |exact AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM build))
      |SELECT 'bloom_candidates' AS metric, n FROM pass
      |UNION ALL SELECT 'true_matches' AS metric, n FROM exact
      |ORDER BY metric""".stripMargin

  private val LC = 4096 // linear-counting bitmap size

  /** Distinct-cardinality sketch (linear counting): hash every word
    * occurrence into an LC-bit bitmap; the estimate is
    * `−m·ln(V/m)` for V unset bits. The aggregation is a FIXED-SIZE
    * distinct over ≤ m bucket ids — a bounded shuffle regardless of
    * vocabulary, the cardinality member of the sketch family next to
    * count-min (frequency) and bloom (membership). The md5 bucket
    * makes the occupied-bit count deterministic, and the estimate is
    * rounded to an integer, so the ~1-ulp ln() differences between
    * engines cannot move the checked value. The exact distinct runs
    * beside it as the checked ground truth (this is the
    * sketch-vs-exact validation query; production uses only the
    * sketch side).
    *
    * Both distincts run in ONE aggregation over one corpus scan
    * (Catalyst expands multi-distinct into a single expand+agg job) —
    * no second pass, no cross join. */
  def distinctSketch(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(graft.functions.GraftFunctions.tokens(lower(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
    words.select(col("word"),
        (hexSliceLong(md5(concat(lit("lc:"), col("word")).cast("binary")),
          1, 8) % LC).as("bit"))
      .agg(countDistinct(col("bit")).as("occupied"),
        countDistinct(col("word")).as("exact_distinct"))
      .select(lit(LC.toLong).as("m"), col("occupied"),
        // greatest(1, …) guards the saturated-bitmap edge (V = 0):
        // linear counting is out of range there and reports m·ln(m)
        round(lit(-LC.toDouble) *
            log(greatest(lit(1.0), lit(LC) - col("occupied"))) +
          lit(LC.toDouble) * log(lit(LC.toDouble))).cast("long")
          .as("estimate"),
        col("exact_distinct"))
  }

  val distinctSketchSql: String =
    s"""WITH occ AS (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      |  FROM documents),
      |w AS (SELECT word FROM occ WHERE length(word) > 0),
      |bits AS (
      |  SELECT CAST(COUNT(DISTINCT CAST(('0x' || substr(md5('lc:' || word), 1, 8)) AS BIGINT) % $LC) AS BIGINT) AS occupied
      |  FROM w),
      |ex AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS exact_distinct FROM w)
      |SELECT CAST($LC AS BIGINT) AS m, occupied,
      |  CAST(ROUND(-$LC * ln(GREATEST(1, $LC - occupied)) + $LC * ln(CAST($LC AS DOUBLE))) AS BIGINT) AS estimate,
      |  exact_distinct
      |FROM bits, ex""".stripMargin

  private val QB = 4096 // quantile histogram buckets

  /** Distributed exact quantiles by two-phase histogram selection —
    * the quantile member of the sketch family (frequency = count-min,
    * membership = bloom, cardinality = linear counting). Phase 1
    * aggregates prices (as integer cents) into a FIXED 4096-bucket
    * equi-width histogram — a bounded shuffle regardless of row
    * count — whose cumulative counts locate, for each target rank
    * r = ⌈q·n⌉, the one bucket holding the r-th smallest value and
    * the midpoint ESTIMATE a pure sketch would report. Phase 2
    * re-scans only the ≈ n/4096 rows of each target bucket and ranks
    * them locally for the EXACT order statistic — the classic
    * distributed-selection refinement, no global sort anywhere.
    *
    * Phase 2 is SKEW-PROOF: instead of ranking the target bucket's
    * raw rows (a duplicate-heavy distribution can land its entire
    * mass in one bucket → a single-task sort of ~n rows), it (a)
    * re-histograms the target bucket into ≤4096 equal sub-slices and
    * picks the one holding the local rank, then (b) aggregates that
    * sub-slice BY VALUE — duplicates collapse in a scalable groupBy
    * shuffle — and walks the cumulative counts over the ≤`width/4096`
    * DISTINCT values to read off the exact order statistic. No
    * per-row window anywhere: the all-equal pathological bucket
    * becomes a single (value, count) row.
    *
    * Determinism: prices snap to cents via round() (DuckDB's
    * double→BIGINT cast rounds where Spark's truncates — round()
    * first makes both exact); all bucket math is integer (`div`).
    * The unpartitioned/q-partitioned windows run over ≤ 4096
    * histogram rows, ≤ 4096 sub-histogram rows, and ≤ sub-slice-width
    * distinct values respectively — deliberate bounded frames, not
    * corpus-wide sorts. */
  def quantileSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quantiles = Seq(0.5, 0.95, 0.99)
    val cents = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
    // The per-phase CONTROL state (bounds; the ≤4096-row histogram;
    // the ≤4096-row sub-histogram) is collected to the driver and fed
    // back as literals: an earlier all-in-one-plan form re-derived the
    // tiny targets frame inside every consumer and Catalyst expanded
    // the tree into 25 lineitem scans. Driver-held control tables are
    // the same pattern as the pruned text models — K-bounded state,
    // while every row-scale aggregation stays a distributed shuffle.
    // Job 1: bounds.
    val b = cents.agg(min(col("c")), max(col("c")), count(lit(1))).head()
    if (b.isNullAt(0))
      return Seq.empty[(Double, Long, Double, Double)]
        .toDF("q", "rank_k", "est_price", "exact_price")
    val (lo, hi, n) = (b.getLong(0), b.getLong(1), b.getLong(2))
    val width = (hi - lo) / QB + 1
    // Job 2: the fixed equi-width histogram (≤4096 rows collected).
    val hist = cents
      .select(expr(s"(c - $lo) div $width").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    // driver: locate each target rank's bucket via cumulative counts
    case class Target(q: Double, r: Long, bucket: Long, k1: Long,
        est: Double)
    val cumB = hist.scanLeft(0L)(_ + _._2).tail
    val targets = quantiles.map { q =>
      val r = math.ceil(q * n).toLong
      val i = cumB.indexWhere(_ >= r)
      val (bucket, _) = hist(i)
      val prev = cumB(i) - hist(i)._2
      Target(q, r, bucket, r - prev,
        (lo + bucket * width + width / 2).toDouble / 100.0)
    }
    val w2 = (width - 1) / QB + 1
    val targetBuckets = targets.map(_.bucket).distinct
    // Job 3: aggregate the target buckets' rows BY VALUE — duplicate
    // mass collapses in this scalable shuffle (the all-equal
    // pathological bucket becomes ONE row) — and sub-slice each value.
    // Cached: the sub-histogram collect and the final rank both read it.
    val byValue = cents
      .withColumn("bucket", expr(s"(c - $lo) div $width"))
      .filter(col("bucket").isin(targetBuckets: _*))
      .withColumn("sb", expr(s"(c - $lo - bucket * $width) div $w2"))
      .groupBy(col("bucket"), col("sb"), col("c"))
      .agg(count(lit(1)).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Job 4: sub-histogram (≤4096 rows per target bucket collected) —
    // the refinement round that bounds the final rank window by the
    // sub-slice's value range instead of the bucket's row count.
    val subHist = byValue.groupBy(col("bucket"), col("sb"))
      .agg(sum(col("cv")).as("cnt2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .groupBy(_._1._1)
      .view.mapValues(_.map { case ((_, sb), c) => sb -> c }.sortBy(_._1))
      .toMap
    case class SubTarget(q: Double, r: Long, bucket: Long, sb: Long,
        k2: Long, est: Double)
    val subTargets = targets.map { t =>
      val slices = subHist(t.bucket)
      val cumS = slices.scanLeft(0L)(_ + _._2).tail
      val i = cumS.indexWhere(_ >= t.k1)
      SubTarget(t.q, t.r, t.bucket, slices(i)._1, t.k1 - (cumS(i) - slices(i)._2),
        t.est)
    }
    // Job 5 (reads the cached value table): walk the chosen sub-slice's
    // DISTINCT values by cumulative count — ≤ w2 rows per q-partition
    // regardless of row count, so no per-row ranking anywhere.
    val stDf = subTargets
      .map(t => (t.q, t.r, t.bucket, t.sb, t.k2, t.est))
      .toDF("q", "rank_k", "bucket", "sb", "k2", "est_price")
    val cumW3 = Window.partitionBy(col("q")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byValue.join(broadcast(stDf), Seq("bucket", "sb"))
      .withColumn("cum3", sum(col("cv")).over(cumW3))
      .filter(col("cum3") >= col("k2") &&
        col("cum3") - col("cv") < col("k2"))
      .select(col("q"), col("rank_k"), col("est_price"),
        (col("c").cast("double") / 100.0).as("exact_price"))
      .orderBy(col("q"))
  }

  val quantileSelectSql: String =
    s"""WITH cents AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      |  FROM lineitem),
      |bounds AS (
      |  SELECT MIN(c) AS lo, MAX(c) AS hi, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM cents),
      |bucketed AS (
      |  SELECT c, n, (c - lo) // ((hi - lo) // $QB + 1) AS bucket,
      |    lo, (hi - lo) // $QB + 1 AS width
      |  FROM cents CROSS JOIN bounds),
      |hist AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt, MAX(n) AS n,
      |    MAX(lo) AS lo, MAX(width) AS width
      |  FROM bucketed GROUP BY bucket),
      |cum AS (
      |  SELECT *, CAST(SUM(cnt) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM hist),
      |cum2 AS (SELECT *, cum - cnt AS prev FROM cum),
      |qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
      |targets AS (
      |  SELECT q, r, MIN(bucket) AS bucket FROM (
      |    SELECT q, CAST(ceil(q * n) AS BIGINT) AS r, bucket, cum
      |    FROM qs CROSS JOIN cum2)
      |  WHERE cum >= r GROUP BY q, r),
      |t2 AS (
      |  SELECT q, r, t.bucket, prev,
      |    CAST(lo + t.bucket * width + width // 2 AS DOUBLE) / 100.0
      |      AS est_price
      |  FROM targets t JOIN cum2 USING (bucket)),
      |ranked AS (
      |  SELECT q, r, est_price, c,
      |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY c) AS rk, prev
      |  FROM bucketed JOIN t2 USING (bucket))
      |SELECT q, r AS rank_k, est_price, CAST(c AS DOUBLE) / 100.0
      |    AS exact_price
      |FROM ranked WHERE rk = r - prev ORDER BY q""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_cms_heavy_hitters" -> (cmsHeavyHitters _),
    "t_distinct_sketch" -> (distinctSketch _),
    "t_quantile_select" -> (quantileSelect _),
    "join_bloom_prefilter" -> (bloomPrefilter _))

  val oracles: Map[String, String] = Map(
    "t_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "t_distinct_sketch" -> distinctSketchSql,
    "t_quantile_select" -> quantileSelectSql,
    "join_bloom_prefilter" -> bloomPrefilterSql)
}
