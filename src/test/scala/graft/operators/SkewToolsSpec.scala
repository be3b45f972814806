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

  test("hot key rows spread across salt buckets") {
    import spark.implicits._
    val probe = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
    val buckets = salted.groupBy(col("__salt")).count().collect()
    assert(buckets.length === 8)
    // no bucket holds more than half the hot key
    assert(buckets.map(_.getLong(1)).max < 25000)
  }
}
