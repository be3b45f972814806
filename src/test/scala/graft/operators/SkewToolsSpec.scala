package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join is row-identical to the plain join under skew") {
    import spark.implicits._
    // hot key 0 carries 50k rows; the rest are uniform
    val probe = spark.range(60000)
      .select(when(col("id") < 50000, 0L).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val build = spark.range(100)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
    val plain = probe.join(build, Seq("k"))
    val salted = SkewTools.saltedJoin(probe, build, "k", 8)
    assert(salted.count() === plain.count())
    // exact multiset equality via anti-joins both ways on all columns
    val cols = Seq("k", "v", "name").map(col)
    assert(salted.groupBy(cols: _*).count()
      .join(plain.groupBy(cols: _*).count(),
        Seq("k", "v", "name", "count"), "left_anti").isEmpty)
    assert(plain.groupBy(cols: _*).count()
      .join(salted.groupBy(cols: _*).count(),
        Seq("k", "v", "name", "count"), "left_anti").isEmpty)
  }

  test("caller columns named __salt survive the join untouched") {
    import spark.implicits._
    // a probe that already carries __salt data must not be clobbered
    val probe = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").as("v"),
        concat(lit("user_"), col("id")).as("__salt"))
    val build = spark.range(10)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
    val out = SkewTools.saltedJoin(probe, build, "k", 4)
    assert(out.columns.contains("__salt"))
    assert(out.filter(col("__salt") =!= concat(lit("user_"), col("v")))
      .isEmpty)
    assert(out.count() === 100)
  }

  /** The OTHER half of the skew story: when the join IS
    * AQE-splittable, Spark's runtime re-plan must handle the hot key
    * without manual salting — this pins the claim that saltedJoin is
    * only for the non-splittable/known-skew cases. Thresholds are
    * lowered so the test fixture's hot partition qualifies. */
  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    graft.SparkTestUtil.withConfs(spark, confs) {
      // hot key 0 dominates the probe; one build row per key keeps the
      // join output collectable
      val probe = spark.range(200000)
        .select(when(col("id") < 150000, 0L).otherwise(col("id") % 1000)
          .as("k"), concat(lit("payload_"), col("id")).as("v"))
      val build = spark.range(1000)
        .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      val joined = probe.join(build, Seq("k"))
      // materialize THIS QueryExecution (count() would plan a new one)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.toLowerCase.contains("skew"), // skew=true / AQEShuffleRead
        "AQE did not mark any skewed partition:\n" + plan.take(3000))
    }
  }

  test("exact-duplicate hot-key rows still spread across salts") {
    import spark.implicits._
    // every probe row is the SAME content — a content-only salt would
    // collapse them all onto one bucket, silently degrading to an
    // unsalted join in exactly the heavy-duplicate case the helper
    // exists for. Mixing the input partition id into the hash keeps
    // the spread (and stays retry-stable: a recomputed map task
    // re-reads the same partition).
    val probe = spark.range(40000).repartition(8)
      .select(lit(0L).as("k"), lit(1L).as("v"))
    val build = spark.range(1)
      .select(col("id").as("k"), lit("dim").as("name"))
    val out = SkewTools.saltedJoin(probe, build, "k", 8)
    assert(out.count() === 40000)
    // the REAL salt expression (not a replica — a copy here would keep
    // passing if the formula changed): across 8 input partitions the
    // duplicates must land on >1 bucket
    val salts = probe
      .select(SkewTools.probeSalt(probe, 8).as("s"))
      .distinct().count()
    assert(salts >= 2, s"duplicate rows collapsed onto $salts salt(s)")
  }
}
