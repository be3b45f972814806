package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PQ/ADC against a from-scratch driver-side reference: quantize,
  * train (iters=0 codebook), encode, build LUTs, score, rank — all
  * reimplemented in plain Scala on the collected embeddings, no Spark
  * expression shared with the operator. */
class AnnPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reference(): Seq[(Long, Long, Long, Long)] = {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 10000).toLong).toArray)
      .sortBy(_._1)
    val byId = vecs.toMap
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cb: Map[(Int, Int), Array[Long]] = (for {
      k <- 0 until 16
      m <- 0 until 8
    } yield (k, m) -> sub(byId(k.toLong), m)).toMap
    val cands = vecs.filter(_._1 >= 10)
    val queries = vecs.filter(_._1 < 10)
    val codes: Map[Long, Array[Int]] = cands.map { case (id, v) =>
      id -> (0 until 8).map { m =>
        (0 until 16).minBy(k => (d2(sub(v, m), cb((k, m))), k))
      }.toArray
    }.toMap
    (for {
      (qid, qv) <- queries
      lut = Array.tabulate(8, 16)((m, k) => d2(sub(qv, m), cb((k, m))))
      ranked = cands.map { case (cid, _) =>
        cid -> codes(cid).zipWithIndex.map { case (c, m) => lut(m)(c) }.sum
      }.sortBy { case (cid, d) => (d, cid) }.take(5)
      ((cid, d), i) <- ranked.zipWithIndex
    } yield (qid, (i + 1).toLong, cid, d)).toSeq.sortBy(t => (t._1, t._2))
  }

  test("pq adc top-5 matches the driver-side reference") {
    import spark.implicits._
    val got = AnnPq.pqAdcTopK(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exp = reference()
    assert(got === exp)
    assert(got.nonEmpty)
    // the approximation must be non-degenerate: distances vary and no
    // candidate ties the whole board at zero
    assert(got.map(_._4).toSet.size > 1)
  }

  test("pq search scans the 8-entry code index, not the raw vectors") {
    val df = AnnPq.pqAdcTopK(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the scoring side must be the sum_lookup kernel over the packed
    // code array against the broadcast LUT
    assert(p.contains("sum_lookup"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
