package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** graph_pagerank stage-cost probe: pairs build, distinct, degree,
  * adjacency materialization, per-iteration cost. Usage:
  * ProfileGraph <sfDir>. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graph-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.GraphQueries
    // diagnostic sub-shapes (join-only, +distinct) are probe-local;
    // everything at operator granularity goes through the operator's
    // own hooks (adjacency memo, Damp/Base/SuppOffset constants) so a
    // change to the production shape cannot desync this profiler
    val joined = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + GraphQueries.SuppOffset).as("p"))
    timed("join only (no distinct)")(println("  n=" + joined.count()))
    timed("join + distinct")(println("  n=" + joined.distinct().count()))
    val adj = GraphQueries.adjacency(spark, dir)
    timed("adjacency materialize (operator hook)")(
      println("  n=" + adj.count()))
    val (damp, base) = (GraphQueries.Damp, GraphQueries.Base)
    var ranks = adj
      .select(col("dst"), expr("1000000 div d").as("contrib"))
      .groupBy(col("dst"))
      .agg((lit(base) + expr(s"($damp * sum(contrib)) div 100")).as("r"))
      .select(col("dst").as("id"), col("r"))
    timed("iteration 1 (off cache)")(println("  n=" + ranks.count()))
    val r2 = adj.join(broadcast(ranks), adj("src") === ranks("id"))
      .select(col("dst"), expr("r div d").as("contrib"))
      .groupBy(col("dst"))
      .agg((lit(base) + expr(s"($damp * sum(contrib)) div 100")).as("r"))
      .select(col("dst").as("id"), col("r"))
    timed("iteration 2 (broadcast)")(println("  n=" + r2.count()))
    timed("full operator")(println(
      "  n=" + graft.operators.GraphQueries.pageRank(spark, dir).count()))
    spark.stop()
  }
}
