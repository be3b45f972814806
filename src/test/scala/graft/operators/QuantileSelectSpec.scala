package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** quantileSelect's phase-2 must be skew-proof: a duplicate-heavy
  * distribution lands its whole mass in one histogram bucket, and the
  * exact-rank pass must NOT sort those rows in one task. The rebuilt
  * final pass aggregates the refined sub-slice BY VALUE (duplicates
  * collapse in the groupBy shuffle) — so the pathological all-equal
  * fixture reaches the rank window as a single (value, count) row.
  * These tests pin (1) exactness on all-duplicate and skewed-mix
  * fixtures against a locally computed order statistic, and (2) the
  * structural guarantee that no per-row ranking window survives in
  * the plan. */
class QuantileSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(prices: Seq[Double]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-quantile").toString
    import spark.implicits._
    prices.toDF("l_extendedprice")
      .repartition(8) // spread the duplicates across input partitions
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** Ground truth: the r-th smallest (r = ceil(q*n)) cent value. */
  private def exactQuantiles(prices: Seq[Double]): Map[Double, Double] = {
    val cents = prices.map(p => math.round(p * 100)).sorted
    Seq(0.5, 0.95, 0.99).map { q =>
      val r = math.ceil(q * cents.length).toLong.toInt
      q -> cents(r - 1).toDouble / 100.0
    }.toMap
  }

  private def run(dir: String): Map[Double, Double] =
    SketchQueries.quantileSelect(spark, dir).collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("exact_price"))
      .toMap

  test("all-duplicates fixture: exact, and no per-row rank window") {
    // one price repeated 100k times — the entire mass is one histogram
    // bucket AND one sub-slice AND one distinct value
    val prices = Seq.fill(100000)(1234.56)
    val dir = writeFixture(prices)
    val df = SketchQueries.quantileSelect(spark, dir)
    val got = df.collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("exact_price"))
      .toMap
    assert(got === exactQuantiles(prices))
    // structural: the final pass ranks DISTINCT VALUES via cumulative
    // counts — a row_number over the bucket's raw rows (the skew trap)
    // must not reappear
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "quantileSelect must not rank per-row")
  }

  test("skewed mix: 99% one value plus a spread tail stays exact") {
    // the heavy value owns the median; the tail owns p95/p99
    val prices = Seq.fill(9900)(100.00) ++
      (1 to 100).map(i => 200.00 + i * 7.13)
    val dir = writeFixture(prices)
    assert(run(dir) === exactQuantiles(prices))
  }

  test("distinct spread values stay exact (regression vs old path)") {
    val prices = (1 to 5000).map(i => 10.00 + (i * 37 % 5000) * 0.97)
    val dir = writeFixture(prices)
    assert(run(dir) === exactQuantiles(prices))
  }
}
