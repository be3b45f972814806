package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** er_fuzzy_match volume probe: signature rows per side, join output,
  * survivor count, and the heaviest signature buckets — the numbers
  * that decide whether a slowdown is candidate blowup, bucket skew, or
  * fixed overhead. Usage: ProfileEr <sfDir>. */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[er-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.EntityResolution
    val base = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    println(s"[er-probe] customers: ${base.count()}")
    // replicate the operator's internals via its probe hooks,
    // instrumenting each stage
    val dirty = base.select(col("c_custkey").as("src_id"),
      expr(EntityResolution.dirtyNameSqlForProbe).as("dname"))
    val clean = base.select(col("c_custkey").as("match_id"),
      col("c_name").as("cname"))
    val dsig = dirty.select(col("src_id"), col("dname"),
      explode(EntityResolution.taggedSigsForProbe("dname", dirtySide = true)).as("sig"))
    val csig = clean.select(col("match_id"), col("cname"),
      explode(EntityResolution.taggedSigsForProbe("cname", dirtySide = false)).as("sig"))
    timed("dirty sig rows")(println("  n=" + dsig.count()))
    timed("clean sig rows")(println("  n=" + csig.count()))
    timed("top clean buckets") {
      csig.groupBy("sig").count().orderBy(desc("count")).limit(10)
        .collect().foreach(r => println(s"  ${r.getLong(1)}  ${r.getString(0).replace('', '_')}"))
    }
    // bucket structure: per-sig join output = nd * nc — the skew view
    // that decides whether the lev stage parallelizes
    timed("bucket structure") {
      val dc = dsig.groupBy("sig").count().withColumnRenamed("count", "nd")
      val cc = csig.groupBy("sig").count().withColumnRenamed("count", "nc")
      val prod = dc.join(cc, "sig")
        .withColumn("out", col("nd") * col("nc"))
      println("  predicted join output: " +
        prod.agg(sum("out")).head().getLong(0))
      prod.groupBy(substring(col("sig"), 1, 2).as("tag"))
        .agg(sum("out").as("o"), count(lit(1)).as("buckets"),
          max("out").as("maxout"))
        .orderBy(desc("o")).collect()
        .foreach(r => println(
          s"  tag=${r.get(0)} out=${r.get(1)} buckets=${r.get(2)} max=${r.get(3)}"))
      prod.orderBy(desc("out")).limit(12).collect().foreach(r =>
        println(s"  out=${r.getLong(3)} nd=${r.getLong(1)} nc=${r.getLong(2)}" +
          s" sig=${r.getString(0).replace('', '_')}"))
    }
    val joined = dsig.join(csig, "sig")
    timed("join output rows")(println("  n=" + joined.count()))
    timed("join + id sum (no strings out)")(println("  s=" +
      joined.agg(sum(col("src_id") + col("match_id"))).head().getLong(0)))
    timed("join + length diff (no lev)")(println("  n=" +
      joined.filter(abs(length(col("dname")) - length(col("cname"))) <= 1)
        .count()))
    // the production confirm kernel (bounded_lev1), not the builtin
    // DP — this stage must time what the operators actually run
    val survivors = joined.select(col("src_id"), col("match_id"),
      graft.functions.HashExpressions
        .boundedLev1(col("dname"), col("cname")).as("d"))
      .filter(col("d") <= 1)
    timed("survivor rows (join + bounded_lev1)")(
      println("  n=" + survivors.count()))
    timed("best-match agg")(println("  n=" +
      survivors.groupBy(col("src_id")).agg(min(col("match_id"))).count()))
    spark.stop()
  }
}
