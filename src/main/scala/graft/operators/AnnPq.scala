package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorExpressions
import graft.functions.GraftFunctions.md5CoinLong

/** Product quantization with asymmetric-distance (ADC) top-k — the
  * third leg of the quantized-ANN family next to SQ8 (per-dimension
  * scalar codes, [[SimilarityQueries.sq8TopK]]) and IVF (coarse
  * partition pruning, [[AnnIvf]]). PQ splits each 64-dim vector into
  * M=8 subspaces of 8 dims, learns a K=16-entry codebook per
  * subspace, and stores each vector as 8 code bytes (64x smaller than
  * the float vector). A query is NOT quantized: it precomputes a
  * 128-entry lookup table of exact distances to every codebook entry,
  * and a candidate's approximate distance is the sum of 8 table reads
  * — the classic ADC search loop (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  *
  * Cross-engine exactness: coordinates snap to the 1e4 fixed-point
  * BIGINT grid FIRST (the [[SimilarityQueries.kmeansStep]] contract),
  * so codebook assignment (integer argmin, ties to the lower code),
  * the LUT, and the ADC sums are all exact integer arithmetic — no FP
  * anywhere. The codebook is the iters=0 quantizer (sub-vectors of
  * the K lowest-vec_id corpus vectors), the same SQL-replayable
  * training choice as [[AnnIvf]].
  *
  * Scale: the codebook collect is K=16 rows behind a pushed-down
  * vec_id filter (construction-memoized per table version). Encoding
  * is ONE codegen kernel pass inside the corpus scan projection
  * ([[VectorExpressions.pqEncode]]: quantize + per-subspace integer
  * argmin + offset packing) — it parallelizes purely by scan splits,
  * with no fan-out, no join, no aggregation. The stored index is the
  * 8-entry code array per vector. Search reads ONLY that index: the
  * bounded query-LUT frame broadcasts, and each (candidate, query)
  * pair is a single [[VectorExpressions.sumLookup]] kernel call — at
  * 100 TB the scan side is 8 longs per vector instead of 64 floats,
  * which is the whole point of PQ. */
object AnnPq {

  private val M = 8        // subspaces
  private val SubDim = 8   // dims per subspace (64-dim embeddings)
  private val K = 16       // codebook entries per subspace
  private val NQueries = 10
  private val TopK = 5

  /** Quantized codebook rows (code id, subspace, sub-vector on the 1e4
    * integer grid) — driver-built from the K lowest-vec_id vectors. */
  private def codebook(s: SparkSession, dir: String): Seq[(Int, Int, Seq[Long])] =
    Tables.memoizedAtConstruction(s, dir, "embeddings", s"pqcb-$M-$K") {
      Tables.embeddings(s, dir).filter(col("vec_id") < K)
        .select(col("vec_id"), col("embedding")).orderBy(col("vec_id"))
        .collect()
        .flatMap { r =>
          val k = r.getLong(0).toInt
          val v = r.getSeq[Float](1)
            .map(f => math.floor(f.toDouble * 10000).toLong)
          (0 until M).map(m =>
            (k, m, v.slice(m * SubDim, (m + 1) * SubDim): Seq[Long]))
        }.toSeq
    }

  def pqAdcTopK(s: SparkSession, dir: String): DataFrame = {
    val cb = codebook(s, dir)
    // the LUT flatten below is POSITIONAL (offset m*K + k): a fixture
    // missing any vec_id < K would silently shift every slot while the
    // encoder argmins against zero-filled codebook entries — fail fast
    // instead of surfacing as an oracle hash mismatch
    require(cb.size == M * K,
      s"PQ codebook needs all $K training vectors (vec_id 0..${K - 1}) " +
        s"present: got ${cb.size} of ${M * K} (code, subspace) rows — " +
        "the embeddings fixture is missing low vec_ids")
    val flat = new Array[Long](M * K * SubDim)
    cb.foreach { case (k, m, v) =>
      v.zipWithIndex.foreach { case (x, d) => flat((m * K + k) * SubDim + d) = x }
    }
    search(s, dir, flat, K)
  }

  // Trained-leg geometry: 16 subspaces of 4 dims × 256 entries =
  // 16-byte codes, the same byte budget as the trained IVF-PQ leg.
  // The r15 sf10 planted-fixture curve showed the coarser 8×8 trained
  // code PLATEAUING at 0.22 recall even at full scan breadth — pure
  // code loss: flat PQ has no residual step, so within-cluster
  // ranking (the planted fixture's top-k is ~100 cluster siblings)
  // needs finer subspace cells, not more probes. Halving SubDim
  // quarters the per-subspace volume each 256-entry codebook covers.
  private val TrainedM = 16
  private val TrainedSubDim = 4

  /** Lloyd-TRAINED per-subspace codebook — the production training path
    * and the BENCHED default since r15 (the repo's own planted-cluster
    * recall table showed the untrained lowest-vec_id codebook losing to
    * a trained sibling ~3-5x, an anti-default): one k-means run per
    * subspace over the deterministic md5-coin sample's quantized
    * sub-vectors, 256 entries (8-bit codes, the FAISS default) when the
    * sample can support them, the 16-entry oracle width otherwise.
    * Deterministic (rank-spaced init, fixed iterations, no RNG) but not
    * SQL-replayable — Lloyd means are order-sensitive FP — so the
    * oracle gate keeps [[pqAdcTopK]]'s replayable model and the bench
    * runs this one. Trained in grid units, means rounded back to the
    * grid, so the search path (kernel encode, integer LUT, exact ADC
    * sums) is identical in kind to the replayable form's. */
  private def trainedCodebook(s: SparkSession, dir: String,
      tm: Int, tSubDim: Int): (Array[Long], Int) =
    Tables.memoizedAtConstruction(s, dir, "embeddings",
        s"pqcb-trained-$tm") {
      import s.implicits._
      val n = AnnLsh.embeddingCount(s, dir)
      val every = math.max(1L, n / 10000L)
      val sample = Tables.embeddings(s, dir)
        .filter(pmod(md5CoinLong(col("vec_id")), lit(every)) === 0)
        .orderBy(col("vec_id"))
        .select(expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"))
        .as[Array[Long]].collect()
        .map(_.map(_.toDouble))
      // 8-bit codes need enough training sub-vectors to tell 256
      // entries apart; below 4×256 samples keep the 4-bit oracle width
      val cbK = if (sample.length >= 1024) 256 else K
      val flat = new Array[Long](tm * cbK * tSubDim)
      (0 until tm).foreach { m =>
        val subs = sample.map(_.slice(m * tSubDim, (m + 1) * tSubDim))
        val cb = AnnIvf.kmeans(subs, cbK, iters = 5)
        (0 until cbK).foreach { k =>
          var d = 0
          while (d < tSubDim) {
            flat((m * cbK + k) * tSubDim + d) = math.round(cb(k)(d))
            d += 1
          }
        }
      }
      System.err.println(s"[pq] trained codebook: n=$n m=$tm k=$cbK " +
        s"sample=${sample.length}")
      (flat, cbK)
    }

  /** Bench twin: the trained production codebook (16×4×256 geometry)
    * through the identical ADC search path. */
  def pqAdcTopKTrained(s: SparkSession, dir: String): DataFrame = {
    val (flat, cbK) = trainedCodebook(s, dir, TrainedM, TrainedSubDim)
    search(s, dir, flat, cbK, TrainedM, TrainedSubDim)
  }

  /** The shared ADC search path, model-agnostic (`cbK` = codebook
    * entries per subspace, `m`×`subDim` = the code geometry; both
    * training paths feed it — the oracle form at 8×8, the trained
    * bench form at 16×4). */
  private def search(s: SparkSession, dir: String, flat: Array[Long],
      cbK: Int, m: Int = M, subDim: Int = SubDim): DataFrame = {
    import s.implicits._
    // encode candidates in ONE codegen'd per-row kernel pass
    // ([[graft.functions.PqEncode]]): quantize + per-subspace integer
    // argmin (ties to the lower code) + offset packing, all inside the
    // scan projection. The first form fanned every vector to M
    // sub-rows, joined the broadcast codebook (16x more rows), and
    // paid TWO aggregations to reassemble the code array — 26M
    // intermediate rows at the 200k-vector scale set for what is a
    // per-row loop over the codebook ints.
    val codes = Tables.embeddings(s, dir)
      .filter(col("vec_id") >= NQueries)
      .select(col("vec_id"),
        VectorExpressions.pqEncode(col("embedding"), flat.toSeq, m, cbK,
          subDim).as("codes"))
    val cb = (0 until cbK).flatMap { k =>
      (0 until m).map { mi =>
        (k, mi, (0 until subDim)
          .map(d => flat((mi * cbK + k) * subDim + d)): Seq[Long])
      }
    }
    val cbDf = broadcast(cb.toDF("k", "cm", "cv"))
    // the 10 query rows keep the explode shape (bounded): quantized
    // sub-vectors against the broadcast codebook
    val sub = Tables.embeddings(s, dir)
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
        .as("v"))
      .select(col("vec_id"), explode(expr(s"sequence(0, ${m - 1})")).as("m"),
        col("v"))
      .select(col("vec_id"), col("m"),
        expr(s"slice(v, m * $subDim + 1, $subDim)").as("sv"))
    // per-query ADC lookup table: exact distance from the query's
    // sub-vector to every codebook entry, flattened in m*K + k order
    // (the same offsets the code array carries)
    val lut = sub
      .join(cbDf, col("m") === col("cm"))
      .select(col("vec_id").as("qid"), col("m"), col("k"),
        VectorExpressions.quantL2Sq(col("sv"), col("cv")).as("d2"))
      .groupBy(col("qid"))
      .agg(expr("transform(sort_array(collect_list(struct(m, k, d2))), " +
        "t -> t.d2)").as("lut"))
    // bounded top-k finish (graft.functions.TopK): partition-local
    // size-k buffers, a tasks × |queries| × k shuffle — the ADC sums
    // are integers ≤ 8·8·(2e4)² ≈ 2.6e10 ≪ 2^53, so the double
    // round-trip through the aggregate is exact and the BIGINT output
    // column survives the cast back
    val scored = codes.crossJoin(broadcast(lut))
      .select(col("qid"), col("vec_id").as("cid"),
        VectorExpressions.sumLookup(col("codes"), col("lut")).as("adc_d2"))
    graft.functions.TopK
      .perQueryTopK(scored, col("adc_d2"), TopK, desc = false,
        scoreName = "adc_d2_d")
      .select(col("qid"), col("rank"), col("cid"),
        col("adc_d2_d").cast("long").as("adc_d2"))
      .orderBy(col("qid"), col("rank"))
  }

  private val subD2 =
    "list_reduce(list_transform(range(1, 9), " +
      "i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])), (a, b) -> a + b)"

  val pqAdcTopKSql: String =
    s"""WITH qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, m, v[m * $SubDim + 1 : m * $SubDim + $SubDim] AS sv
       |  FROM qv, range(0, $M) t(m)),
       |cb AS (
       |  SELECT vec_id AS k, m AS cm, sv AS cv FROM sub WHERE vec_id < $K),
       |enc AS (
       |  SELECT vec_id, m, k AS code FROM (
       |    SELECT s.vec_id, s.m, cb.k,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY $subD2, cb.k) AS rk
       |    FROM sub s JOIN cb ON s.m = cb.cm
       |    WHERE s.vec_id >= $NQueries)
       |  WHERE rk = 1),
       |lut AS (
       |  SELECT s.vec_id AS qid, s.m, cb.k, $subD2 AS d2
       |  FROM sub s JOIN cb ON s.m = cb.cm
       |  WHERE s.vec_id < $NQueries),
       |adc AS (
       |  SELECT l.qid, e.vec_id AS cid, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.k
       |  GROUP BY 1, 2)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, cid, adc_d2 FROM (
       |  SELECT qid, cid, adc_d2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rank
       |  FROM adc)
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_pq_adc_topk" -> (pqAdcTopK _))

  val oracles: Map[String, String] = Map(
    "sim_pq_adc_topk" -> pqAdcTopKSql)
}
