package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.tools.MakeClusteredEmbeddings

/** The DISCRIMINATING recall gate: on the planted-cluster fixture the
  * recall metric must (a) score the exact-rerank and trained-PQ legs
  * high — the structure is there to find — and (b) drive a
  * deliberately mis-trained codebook to ≈ 0 — proving the metric
  * detects a broken index. On the driver's iid-random fixture both a
  * working and a broken PQ index score ≈ 0 (r13 measurement), so this
  * fixture is what makes the per-round recall numbers evidence. */
class ClusteredRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("clustered-emb").toString
    MakeClusteredEmbeddings.write(spark, d, 2000L)
    d
  }

  test("fixture: deterministic, unit-norm, labeled by planted cluster") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.embeddings(spark, dir)
    assert(df.count() === 2000L)
    // labels cycle round-robin over n/100 clusters
    val lab = df.select(countDistinct(col("label"))).head().getLong(0)
    assert(lab === 20L)
    // unit norm (float32 round-off tolerance)
    val norms = df.select(expr(
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4))
    // per-row determinism: regeneration is byte-identical
    val again = MakeClusteredEmbeddings.vector(17L, (17 % 20).toInt,
      Array.tabulate(20)(MakeClusteredEmbeddings.center(_,
        MakeClusteredEmbeddings.Seed)),
      MakeClusteredEmbeddings.Sigma, MakeClusteredEmbeddings.Seed)
    val stored = df.filter(col("vec_id") === 17L)
      .head().getSeq[Float](1).toArray
    assert(again.toSeq === stored.toSeq)
  }

  // computed once, shared by the gate tests (the report re-runs every
  // leg plus the curve — no reason to pay it twice)
  private lazy val report = AnnRecall.structuredReport(spark, dir)

  test("recall gate separates working indexes from a sabotaged one") {
    val r = report
    val legs = r.legs.toMap
    // exact-rerank IVF (the deliberately tiny SQL-replayable
    // quantizer: rank-spaced centroids, nprobe 4/16 = 25% scan)
    // measured 0.82 on this fixture — cells miss some of a loose
    // cluster's spread; the floor guards the band, the bench artifact
    // records the number
    assert(legs("sim_ann_ivf") >= 0.75,
      s"IVF exact-rerank recall too low on planted clusters: $legs")
    // the PRODUCTION-trained IVF-PQ (Lloyd coarse + 16×256 residual
    // codebook, ADC-only) measured 0.76 — within a few points of the
    // exact-rerank legs, versus 0.16 for the tiny 8×16 oracle-form
    // model on the same fixture: the recall axis now separates model
    // quality, which the iid-random fixture never could. Since r15 the
    // trained model IS the canonical sim_ivfpq_topk bench leg and the
    // untrained oracle form is the explicit _baseline row.
    assert(legs("sim_ivfpq_topk") >= 0.65,
      s"trained IVF-PQ recall too low on planted clusters: $legs")
    assert(legs("sim_ivfpq_topk") > legs("sim_ivfpq_baseline"),
      s"trained default does not beat its untrained baseline: $legs")
    // NEGATIVE CONTROL: a zeroed codebook must collapse to ≈ 0 — if
    // it doesn't, the metric cannot detect index breakage
    assert(r.negControl >= 0.0 && r.negControl <= 0.2,
      s"negative control failed to fail: ${r.negControl}")
    assert(legs("sim_ivfpq_topk") - r.negControl >= 0.4,
      s"gate does not separate: trained=${legs("sim_ivfpq_topk")} " +
        s"negctrl=${r.negControl}")
    // REFINE (r15): exact re-rank of the 4k ADC shortlist removes code
    // loss, so the refine leg must dominate its ADC-only sibling and
    // approach the exact legs — the full-breadth curve ceilings showed
    // code loss binds IVF-PQ recall, and this is the topology that
    // spends one bounded exact pass to buy it back
    assert(legs("sim_ivfpq_refine") >= legs("sim_ivfpq_topk"),
      s"refine does not dominate ADC-only: $legs")
    assert(legs("sim_ivfpq_refine") >= 0.8,
      s"refined IVF-PQ recall too low on planted clusters: $legs")
  }

  test("nprobe curve: >= 4 points, widening, full-breadth ceiling last") {
    val r = report
    assert(r.curve.size >= 4, s"curve too short: ${r.curve}")
    assert(r.curve.map(_.nprobe) === r.curve.map(_.nprobe).sorted)
    r.curve.foreach(p => assert(p.scanFrac > 0 && p.scanFrac <= 1.0))
    // the last point probes EVERY cell (scan_frac 1.0): recall there is
    // the PQ code's ceiling — the routing-vs-code-loss discriminator
    assert(r.curve.last.nprobe === r.nlist,
      s"curve must end at full breadth: ${r.curve}")
    // probing wider can only add candidates — recall at the widest
    // point must be at least the narrowest point's
    assert(r.curve.last.recall >= r.curve.head.recall,
      s"recall shrank with probe breadth: ${r.curve}")
    assert(r.curve.last.recall >= 0.6,
      s"widest probe still can't retrieve planted structure: ${r.curve}")
  }

  test("alt-nlist curve: same pipeline at 2x cells, full breadth last") {
    val r = report
    assert(r.altNlist === 2 * r.nlist)
    assert(r.altCurve.nonEmpty)
    assert(r.altCurve.last.nprobe === r.altNlist)
    r.altCurve.foreach(p =>
      assert(p.recall >= -1.0 && p.recall <= 1.0, s"${r.altCurve}"))
    // full breadth scans every cell regardless of geometry, so the two
    // ceilings measure the same codes — they may differ only through
    // residual geometry (finer cells = smaller residuals), never by
    // routing; a collapse here means the pinned-nlist training broke
    assert(r.altCurve.last.recall >= r.curve.last.recall - 0.25,
      s"alt-nlist ceiling implausibly below default: alt=${r.altCurve} " +
        s"default=${r.curve}")
  }

  test("or-amplification: measured trade with the default included") {
    val r = report
    assert(r.orAmp.size >= 3, s"experiment too small: ${r.orAmp}")
    // the production default geometry must be one of the points so the
    // trade is measured AGAINST something
    val n = 2000L
    val auto = 6 // bitsFor(2000) = max(6, ceil(log2(2000/32))) = 6
    assert(r.orAmp.exists(p => p.tables == 16 && p.bits == auto),
      s"default geometry missing: ${r.orAmp}")
    r.orAmp.foreach { p =>
      assert(p.recall >= 0.0 && p.recall <= 1.0, s"${r.orAmp}")
      assert(p.indexRows === n * p.tables)
      assert(p.candPairs >= 0L)
    }
    // fewer bits per table = more collisions = more candidates — the
    // cost side of the amplification trade must actually move
    val byBits = r.orAmp.filter(_.tables == 16).sortBy(_.bits)
    if (byBits.size >= 2)
      assert(byBits.head.candPairs >= byBits.last.candPairs,
        s"reduced bits did not widen candidates: ${r.orAmp}")
  }

  test("ivf curve: exact-rerank recall reaches 1.0 at full breadth") {
    val r = report
    assert(r.ivfCurve.nonEmpty)
    assert(r.ivfCurve.map(_.nprobe) === r.ivfCurve.map(_.nprobe).sorted)
    // the last point probes every cell (scan_frac 1.0) — an exhaustive
    // exact-cosine scan, so any recall below ~1.0 means the cell
    // assignment itself lost vectors. PQ curves plateau below 1.0
    // (code error); the IVF curve must NOT.
    assert(r.ivfCurve.last.nprobe === r.ivfNlist)
    assert(r.ivfCurve.last.recall >= 0.99,
      s"exhaustive IVF probe lost vectors: ${r.ivfCurve}")
    // breadth monotonicity at the recorded points
    assert(r.ivfCurve.last.recall >= r.ivfCurve.head.recall)
  }
}
