package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Bucketed co-located execution: joins and aggregations keyed on the
  * bucket column must plan with ZERO exchanges — the layout carries
  * the partitioning (SURVEY §4: avoid re-shuffling the big fact
  * tables on every query at 100 TB). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val base = "/tmp/graft_bucketed"

  private def ensureTables(): Unit = {
    if (!spark.catalog.tableExists("li_b")) {
      BucketedTables.materialize(Tables.lineitem(spark, dir),
        "li_b", s"$base/li_b", "l_orderkey", 8)
      BucketedTables.materialize(Tables.orders(spark, dir),
        "o_b", s"$base/o_b", "o_orderkey", 8)
    }
  }

  test("bucketed fact-fact join plans with no exchange") {
    ensureTables()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // DECIMAL sum: l_quantity is DOUBLE and the two plans aggregate
      // rows in different orders — an FP sum could differ in the last
      // ulp and flake an exact row comparison
      val j = BucketedTables.table(spark, "li_b")
        .join(BucketedTables.table(spark, "o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // FULL rows vs the unbucketed join, not just the group count: a
      // bucketed-read bug that duplicates or misroutes rows within
      // the right orderkey groups (e.g. a bucket file read twice)
      // keeps the cardinality identical while inflating every sum
      val want = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      val got = j.collect().map(r => (r.getLong(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      val exp = want.collect().map(r => (r.getLong(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      assert(got === exp)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key needs no shuffle") {
    ensureTables()
    val agg = BucketedTables.table(spark, "li_b")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("partition column predicates prune directories at plan time") {
    val src = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    BucketedTables.materializePartitioned(src, s"$base/events_p", "day")
    val back = spark.read.parquet(s"$base/events_p")
      .filter(col("day") === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    // pruned scan reads exactly the one day's rows
    val want = src.filter(col("day") === "2024-01-05").count()
    assert(back.count() === want && want > 0)
  }
}
