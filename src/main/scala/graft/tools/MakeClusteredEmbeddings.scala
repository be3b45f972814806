package graft.tools

import org.apache.spark.sql.SparkSession

/** Planted-cluster embeddings fixture generator — the STRUCTURED twin
  * of the driver's iid-random `embeddings.parquet`.
  *
  * Why it exists: recall@k measured on iid-random vectors cannot
  * distinguish a working ANN index from a broken one (r13 measured
  * within-label vs cross-label mean cosine +0.005 vs −0.001 on the
  * driver fixture — there is no neighbor structure to retrieve, and
  * the PQ legs scored 0.00 while being exact-replay correct). This
  * generator plants ground-truth structure: `n/100` tight clusters on
  * the unit sphere (center + σ·gaussian noise, re-normalized), so
  * each query's true top-k neighbors are its same-cluster siblings by
  * a wide margin and a recall number SEPARATES working indexes from
  * sabotaged ones (see [[graft.operators.AnnRecall]]'s negative
  * control).
  *
  * Same schema as the driver fixture (vec_id BIGINT, embedding
  * ARRAY<FLOAT> unit-norm 64-dim, label INT = planted cluster id), so
  * every ANN leg runs against it unchanged. Deterministic: per-row
  * splitmix-seeded java.util.Random, no global RNG state — the same
  * (n, σ, seed) always regenerates byte-identical vectors on any
  * partitioning (the per-row seed depends only on vec_id).
  *
  * σ = 0.15 is a deliberate middle ground: expected within-cluster
  * pair distance² ≈ 2σ²·64 ≈ 2.9 versus ≈ 4.9 cross-cluster (the ≈ 2
  * between random unit centers plus the same noise) — dimension-64
  * concentration keeps the two distributions ~4 std apart, so true
  * top-k neighbors are still same-cluster, but clusters are LOOSE
  * enough to straddle coarse-quantizer cell boundaries (a tighter
  * σ = 0.08 draft measured a recall curve flat in nprobe: every
  * cluster sat wholly inside one cell and probe breadth bought
  * nothing — no curve to measure, which is itself unrealistic of
  * production embedding spaces).
  */
object MakeClusteredEmbeddings {

  val Dim = 64
  val Sigma = 0.15
  val Seed = 42L

  /** Deterministic unit-norm cluster center. */
  private[graft] def center(cluster: Int, seed: Long): Array[Double] = {
    val r = new java.util.Random(
      seed ^ (cluster.toLong * 0x9E3779B97F4A7C15L + 0x243F6A8885A308DL))
    val v = Array.fill(Dim)(r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Deterministic member vector: center + σ·noise, re-normalized. */
  private[graft] def vector(vecId: Long, cluster: Int,
      cents: Array[Array[Double]], sigma: Double,
      seed: Long): Array[Float] = {
    val r = new java.util.Random(
      seed ^ (vecId * 0xDA942042E4DD58B5L + 0x13198A2E03707344L))
    val c = cents(cluster)
    val v = Array.tabulate(Dim)(d => c(d) + sigma * r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Write a planted-cluster fixture of `n` vectors to
    * `outDir/embeddings.parquet`. Clusters are assigned round-robin
    * (vec_id mod nClusters), so the 10 query vectors (vec_id < 10)
    * land in clusters 0..9, each of which keeps ~n/nClusters corpus
    * members — every query has ample true neighbors. */
  def write(s: SparkSession, outDir: String, n: Long,
      sigma: Double = Sigma, seed: Long = Seed): Unit = {
    import s.implicits._
    val nClusters = math.max(10L, n / 100L).toInt
    val cents = Array.tabulate(nClusters)(c => center(c, seed))
    val bc = s.sparkContext.broadcast(cents)
    s.range(0L, n, 1L, 32)
      .map { i =>
        val cluster = (i % nClusters).toInt
        (i, vector(i, cluster, bc.value, sigma, seed), cluster)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    bc.destroy()
  }

  /** Generate the three bench-SF-sized fixtures under `outRoot`
    * (mirrors the driver fixture's 2k / 20k / 200k row counts at
    * sf0.1 / sf1 / sf10). */
  def main(args: Array[String]): Unit = {
    val outRoot = args.headOption.getOrElse("/root/repo/benchdata/clustered")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.1" -> 2000L, "sf1" -> 20000L, "sf10" -> 200000L)
      .foreach { case (sf, n) =>
        write(spark, s"$outRoot/$sf", n)
        println(s"[clustered] $outRoot/$sf: $n vectors, " +
          s"${math.max(10L, n / 100L)} planted clusters")
      }
    spark.stop()
  }
}
