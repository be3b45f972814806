package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.dotProduct

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * second scale path next to [[AnnLsh]].
  *
  * A coarse quantizer (deterministic Lloyd k-means over a driver-side
  * sample — at corpus scale a ~100k sample, here the full table) maps
  * every vector to its nearest of `nlist` centroids; a query scores
  * only the vectors in its `nprobe` closest cells, then survivors are
  * exactly re-ranked by cosine. The shuffled join key is the compact
  * cell id, so the candidate join never broadcasts the corpus.
  */
object AnnIvf {

  /** Deterministic Lloyd iterations; init = vectors at evenly spaced
    * ranks of the sample (no RNG ⇒ reproducible across runs). */
  def kmeans(sample: Array[Array[Double]], k: Int, iters: Int)
      : Array[Array[Double]] = {
    val dim = sample.head.length
    var cents = Array.tabulate(k)(i => sample((i * sample.length / k)
      .min(sample.length - 1)).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(cents, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      while (i < v.length) {
        val diff = cents(c)(i) - v(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestN(cents: Array[Array[Double]], v: Array[Double], n: Int)
      : Seq[Int] =
    cents.indices.sortBy { c =>
      var d = 0.0; var i = 0
      while (i < v.length) {
        val diff = cents(c)(i) - v(i); d += diff * diff; i += 1
      }
      d
    }.take(n)

  /** Approximate top-k: probe the query's nprobe nearest cells, exact
    * cosine re-rank of the probed candidates. */
  def annTopK(s: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._

    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))

    // train the coarse quantizer on a driver-side sample
    val sample = emb.select(col("v")).as[Array[Double]]
      .limit(10000).collect()
    val cents = kmeans(sample, nlist, iters = 5)
    val bc = s.sparkContext.broadcast(cents)

    val cands = emb.filter(col("vec_id") >= 10)
      .as[(Long, Array[Double], Double)]
      .map { case (id, v, n) => (id, v, n, nearest(bc.value, v)) }
      .toDF("cid", "cv", "cn", "cell")
    val queries = emb.filter(col("vec_id") < 10)
      .as[(Long, Array[Double], Double)]
      .flatMap { case (id, v, n) =>
        nearestN(bc.value, v, nprobe).map(cell => (id, v, n, cell)) }
      .toDF("qid", "qv", "qn", "cell")

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    cands.join(queries, "cell")
      .withColumn("cos",
        dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("cid"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  def annIvfQuery(s: SparkSession, dir: String): DataFrame = annTopK(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_ivf" -> (annIvfQuery _))

  /** Approximate ⇒ rows-only check, like sim_ann_lsh. */
  val oracles: Map[String, String] = Map.empty
}
