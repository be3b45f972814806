package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The IVF-PQ encode kernel against an independent driver-side
  * reference (its own quantize/argmin loops, written from the
  * definition rather than shared with the kernel), over adversarial
  * random vectors including exact-tie cases. */
class IvfPqEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val M = 4
  private val SubDim = 4
  private val K = 3
  private val NList = 3
  private val Dim = M * SubDim

  private def refEncode(v: Array[Float], cents: Array[Long],
      cb: Array[Long]): Seq[Long] = {
    val q = v.map(f => math.floor(f.toDouble * 10000).toLong)
    def l2(a: IndexedSeq[Long], bOff: Int, flat: Array[Long], len: Int) =
      (0 until len).map(i => { val d = a(i) - flat(bOff + i); d * d }).sum
    val cell = (0 until NList)
      .minBy(c => (l2(q, c * Dim, cents, Dim), c))
    val r = q.indices.map(i => q(i) - cents(cell * Dim + i))
    val codes = (0 until M).map { m =>
      val sub = (0 until SubDim).map(d => r(m * SubDim + d))
      val best = (0 until K).minBy(k =>
        (l2(sub, (m * K + k) * SubDim, cb, SubDim), k))
      m.toLong * K + best
    }
    cell.toLong +: codes
  }

  test("kernel output equals the independent reference (ties included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // grid-snapping floats: many land on identical grid points, so
    // cell/code TIES actually occur and the lowest-index rule is
    // exercised, not just stated
    def vec(): Array[Float] =
      Array.fill(Dim)((rnd.nextInt(7) - 3) / 10.0f)
    val cents: Array[Long] = Array.fill(NList * Dim)(
      (rnd.nextInt(7) - 3) * 1000L)
    val cb: Array[Long] = Array.fill(M * K * SubDim)(
      (rnd.nextInt(7) - 3) * 1000L)
    val vecs = (1 to 200).map(i => (i.toLong, vec()))
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        VectorExpressions.ivfPqEncode(col("v"), cents.toSeq, cb.toSeq,
          NList, M, K, SubDim).as("enc"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === refEncode(v, cents, cb), s"vector $id")
    }
  }

  test("wrong-dimension vector fails fast instead of mis-encoding") {
    import spark.implicits._
    val cents = Seq.fill(NList * Dim)(0L)
    val cb = Seq.fill(M * K * SubDim)(0L)
    val e = intercept[Exception] {
      Seq((1L, Array.fill(Dim - 1)(0.1f))).toDF("id", "v")
        .select(VectorExpressions.ivfPqEncode(col("v"), cents, cb,
          NList, M, K, SubDim))
        .collect()
    }
    assert(e.getMessage.contains("ivfpq_encode") ||
      Option(e.getCause).exists(_.getMessage.contains("ivfpq_encode")),
      e.toString)
  }

  test("wrong model shape fails analysis, not runtime") {
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Array.fill(Dim)(0.1f))).toDF("id", "v")
        .select(VectorExpressions.ivfPqEncode(col("v"),
          Seq.fill(5)(0L), Seq.fill(M * K * SubDim)(0L),
          NList, M, K, SubDim))
        .collect()
    }
    assert(err.getMessage.contains("model shapes wrong"), err.getMessage)
  }
}
