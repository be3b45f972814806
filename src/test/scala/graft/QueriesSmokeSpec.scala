package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry yields rows; queries/oracles stay in
  * sync; a representative query from each family runs at sf0.001. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** registerAll is the spark.sql user's front door: every table must
    * come up as a view, and the events view must route through the
    * vintage-adaptive loader (ts lands as TIMESTAMP, never raw long
    * nanos or NTZ) — the guarantee its scaladoc states, pinned here so
    * a future vintage change can't silently desync the SQL-view path
    * from the DataFrame path. */
  test("registerAll registers every table with the events ts shim applied") {
    graft.Tables.registerAll(spark, dir)
    graft.Tables.names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing")
    }
    val tsType = spark.table("events").schema("ts").dataType
    assert(tsType === org.apache.spark.sql.types.TimestampType,
      s"events.ts through registerAll must be TIMESTAMP, got $tsType")
    assert(spark.sql("SELECT COUNT(*) FROM events").head.getLong(0) > 0)
  }

  /** Approximate operators with no SQL-expressible oracle (driver
    * falls back to a rows-only check). */
  private val rowsOnly = Set("sim_ann_lsh", "sim_ann_ivf")

  test("every query has oracle SQL (or is explicitly rows-only)") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without query: $dangling")
  }

  /** Full-inventory schema gate: ANALYZE every registered query against
    * the live testdata (no execution — cheap). A loader/schema drift
    * like the r7 TIMESTAMP(NANOS)→timestamp[us] regression turns this
    * red immediately instead of silently darkening oracle entries. */
  test("all registered queries analyze against live testdata") {
    val errs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).queryExecution.analyzed
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(errs.isEmpty,
      s"${errs.size} queries fail analysis:\n${errs.mkString("\n")}")
  }

  test("one query per family runs and yields rows at sf0.001") {
    val picks = Seq("q1_pricing_summary", "e5_tumbling_hourly",
      "t_token_stats", "dedup_simhash", "sim_cosine_topk")
    picks.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
