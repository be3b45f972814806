package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape assertions for the decision-support completion batch:
  * the correlated-aggregate queries (Q17, Q21) must be SINGLE-PASS —
  * the per-group statistics come from a window over the join's own
  * partitioning, so lineitem is scanned exactly once. The classic
  * decorrelation (aggregate + join-back) scans it twice, which is 2×
  * the I/O at 100 TB. Run with auto-broadcast disabled so the plan
  * has the shuffle structure a large cluster would see; the plan
  * tree is walked programmatically (through AQE stages, reused
  * exchanges counting as zero scans) because the string form
  * truncates and appends pre-AQE sections. */
class DecisionSupportPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def noBroadcast[A](f: => A): A =
    graft.SparkTestUtil.withConf(spark,
      "spark.sql.autoBroadcastJoinThreshold", "-1")(f)

  /** All parquet scans in the EXECUTED plan — the shared walker
    * (graft.SparkTestUtil.walkPlan) already stops at a reused
    * exchange, so collecting scan nodes over it counts shared work
    * once. */
  private def scanPaths(p: SparkPlan): Seq[String] =
    graft.SparkTestUtil.walkPlan(p).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten

  private def lineitemScans(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    scanPaths(df.queryExecution.executedPlan)
      .count(_.contains("lineitem.parquet"))
  }

  test("q17 computes the correlated per-part average in one lineitem scan") {
    noBroadcast {
      val n = lineitemScans(DecisionSupportQueries.q17SmallQtyRevenue(spark, dir))
      assert(n == 1, s"q17 scans lineitem $n times (want 1)")
    }
  }

  test("q21 computes both per-order supplier counts in one lineitem scan") {
    noBroadcast {
      // sf0.01: at sf0.001 the result is empty and AQE collapses the
      // whole plan to EmptyRelation, leaving nothing to assert on
      val n = lineitemScans(
        DecisionSupportQueries.q21WaitingSuppliers(spark, "/root/testdata/sf0.01"))
      assert(n == 1, s"q21 scans lineitem $n times (want 1)")
    }
  }
}
