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
  * is one broadcast-join corpus scan, computed at most once per call. */
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
    * runs, so the recall number describes the benched index. */
  private val legs
      : Map[String, (String, (SparkSession, String) => DataFrame)] = Map(
    "sim_ann_lsh" -> (("cos", AnnLsh.annTopKScaled _)),
    "sim_ann_multiprobe" -> (("cos", AnnLsh.annMultiProbeScaled _)),
    "sim_ann_ivf" -> (("cos", AnnIvf.annIvfQuery _)),
    "sim_pq_adc_topk" -> (("l2", AnnPq.pqAdcTopK _)),
    "sim_ivfpq_topk" -> (("l2", AnnIvfPq.ivfPqTopK _)),
    "sim_ivfpq_trained" -> (("l2", AnnIvfPq.ivfPqTopKTrained _)))

  private def meanRecall(base: Map[Long, Set[Long]],
      approx: Map[Long, Set[Long]]): Double = {
    val per = base.toSeq.map { case (q, exact) =>
      approx.getOrElse(q, Set.empty).intersect(exact).size.toDouble /
        exact.size
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }

  /** Mean recall@5 per requested leg (legs not in `names` are
    * skipped, and a baseline is only computed if a selected leg needs
    * it). A leg that errors reports -1 rather than aborting the rest. */
  def recallAtK(s: SparkSession, dir: String,
      names: Set[String]): Seq[(String, Double)] = {
    val wanted = legs.filter(kv => names(kv._1))
    if (wanted.isEmpty) return Seq.empty
    lazy val cosSets = topSets(SimilarityQueries.cosineTopK(s, dir))
    lazy val l2Sets = topSets(exactGridL2(s, dir))
    wanted.toSeq.sortBy(_._1).map { case (name, (metric, fn)) =>
      val r =
        try {
          val base = if (metric == "cos") cosSets else l2Sets
          meanRecall(base, topSets(fn(s, dir)))
        } catch { case e: Throwable =>
          System.err.println(s"[recall] $name failed: $e"); -1.0
        }
      name -> r
    }
  }

  /** One curve point: probe breadth, the corpus fraction it scans,
    * and the recall@5 it buys. */
  final case class NprobePoint(nprobe: Int, scanFrac: Double,
      recall: Double)

  /** Structured-fixture recall report: every leg's recall@5 on a
    * planted-cluster fixture, the trained IVF-PQ's DELIBERATELY
    * MIS-TRAINED negative control (must read ≈ 0 — proving the metric
    * detects a broken index, which iid-random fixtures cannot), the
    * trained leg's nprobe → recall curve (the scan-fraction trade
    * behind the nprobe = nlist/8 default), and the exact-rerank IVF
    * leg's own nprobe curve (its codes are exact floats, so unlike the
    * PQ curve it must reach 1.0 at full probe breadth — separating
    * routing loss, which breadth buys back, from code loss, which it
    * can't). */
  final case class StructuredReport(legs: Seq[(String, Double)],
      negControl: Double, nlist: Int, curve: Seq[NprobePoint],
      ivfNlist: Int, ivfCurve: Seq[NprobePoint])

  /** Compute the structured-fixture report against `dir` (a
    * planted-cluster fixture from [[graft.tools
    * .MakeClusteredEmbeddings]]). Exact baselines are computed once
    * and shared across the legs, the control, and every curve point. */
  def structuredReport(s: SparkSession, dir: String): StructuredReport = {
    val legRecalls = recallAtK(s, dir, legs.keySet)
    val l2Sets = topSets(exactGridL2(s, dir))
    val neg =
      try meanRecall(l2Sets, topSets(AnnIvfPq.ivfPqTopKMistrained(s, dir)))
      catch { case e: Throwable =>
        System.err.println(s"[recall] negctrl failed: $e"); -1.0
      }
    val nlist = AnnIvfPq.trainedNlist(s, dir)
    val curve = Seq(1, 2, 4, 8, 16, 32, 64, 128)
      .filter(np => np <= math.max(1, nlist / 2))
      .map { np =>
        val r =
          try meanRecall(l2Sets,
            topSets(AnnIvfPq.ivfPqTopKTrainedNprobe(s, dir, np)))
          catch { case e: Throwable =>
            System.err.println(s"[recall] nprobe=$np failed: $e"); -1.0
          }
        NprobePoint(np, np.toDouble / nlist, r)
      }
    // IVF breadth curve: same iters = 0 quantizer config as the benched
    // sim_ann_ivf leg (centroids memoized, so the sweep pays only the
    // probe joins), scored against the exact-cosine baseline. The
    // np = nlist point probes every cell — an exhaustive exact-rerank
    // scan — so recall there is 1.0 by construction unless the index
    // assignment itself is broken, which is exactly what the point
    // detects.
    lazy val cosSets = topSets(SimilarityQueries.cosineTopK(s, dir))
    val ivfNlist = 16
    val ivfCurve = Seq(1, 2, 4, 8, ivfNlist).map { np =>
      val r =
        try meanRecall(cosSets,
          topSets(AnnIvf.annTopK(s, dir, nprobe = np, iters = 0)))
        catch { case e: Throwable =>
          System.err.println(s"[recall] ivf nprobe=$np failed: $e"); -1.0
        }
      NprobePoint(np, np.toDouble / ivfNlist, r)
    }
    StructuredReport(legRecalls, neg, nlist, curve, ivfNlist, ivfCurve)
  }
}
