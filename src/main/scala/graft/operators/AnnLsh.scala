package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.dotProduct

/** Approximate nearest-neighbor search via random-hyperplane LSH —
  * the scale path of the similarity operators.
  *
  * Brute force is a full cross join (candidates × queries); at corpus
  * scale that is O(N·Q·d). This variant hashes every vector into
  * `tables` independent signatures of `bits` hyperplane signs; a
  * candidate is scored only if it shares at least one (table, bucket)
  * with the query, then survivors are exactly re-ranked. Bucket
  * collisions shrink the scored set by orders of magnitude while
  * keeping high recall for genuinely close vectors.
  *
  * Hyperplanes are generated from a fixed seed (deterministic across
  * runs/executors); at 100 TB the bucket join shuffles on the compact
  * (table, bucket) key instead of broadcasting the corpus.
  */
object AnnLsh {

  val Dim = 64

  /** Deterministic Gaussian hyperplanes: tables × bits × dim. */
  def hyperplanes(tables: Int, bits: Int, seed: Long = 42L)
      : Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, bits)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Signature bucket of a vector column for one table: an int whose
    * bit b is sign(v · h_b). */
  private def bucketCol(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, b) =>
      when(dotProduct(v, array(h.map(lit): _*)) >= 0, lit(1 << b))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** (vec_id, v, norm, table, bucket) — one row per (vector, table). */
  def bucketed(s: SparkSession, dir: String, tables: Int, bits: Int)
      : DataFrame = {
    val hp = hyperplanes(tables, bits)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))
    val tableCols = (0 until tables).map { t =>
      struct(lit(t).as("table"), bucketCol(col("v"), hp(t)).as("bucket"))
    }
    emb.select(col("vec_id"), col("v"), col("norm"),
      explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("norm"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** Approximate top-k: candidates sharing ≥1 LSH bucket with the
    * query, exactly re-ranked by cosine. */
  /** Defaults tuned for moderate-similarity neighbors (random-ish
    * corpora): many short signatures (16 tables × 6 bits) rather than
    * few long ones — collision probability per table stays usable even
    * when the true top-k sits near cosine ≈ 0.5. `bits` should grow
    * with log(corpus) at scale to keep buckets small. */
  def annTopK(s: SparkSession, dir: String, k: Int = 5,
      tables: Int = 16, bits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bucketed(s, dir, tables, bits).cache()
    val queries = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("norm").as("qn"), col("table"), col("bucket"))
    val cands = b.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("norm").as("cn"), col("table"), col("bucket"))
    val pairs = cands.join(queries, Seq("table", "bucket"))
      .select(col("qid"), col("qv"), col("qn"),
        col("cid"), col("cv"), col("cn"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    pairs
      .withColumn("cos",
        dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("cid"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Driver entry (approximate ⇒ rows-only check, no SQL oracle). */
  def annLshQuery(s: SparkSession, dir: String): DataFrame =
    annTopK(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_lsh" -> (annLshQuery _))

  /** Intentionally no oracle entry: LSH output is approximate. */
  val oracles: Map[String, String] = Map.empty
}
