package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registered query (or a
  * bench form by name via graft.Bench's maps is out of scope — pass
  * any SparkEntry.queries key, or "refine_trained" for the r15 bench
  * twin). Plan-audit loop: grep the output for Exchange / Broadcast /
  * PushedFilters instead of paying a timed run. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = name match {
      case "refine_trained" =>
        graft.operators.AnnIvfPq.ivfPqRefineTopKTrained(spark, dir)
      case n => graft.SparkEntry.queries(n)(spark, dir)
    }
    // "exec" third arg: run the query and print the FINAL adaptive
    // plan — AQE's runtime re-planning (e.g. exchange elision over a
    // materialized cached relation) is invisible to a static explain
    if (args.lift(2).contains("exec")) {
      // drive df's OWN query execution (count() would plan a separate
      // one and the printed plan would never have executed) WITHOUT
      // materializing the result on the driver — an edge-scale query
      // at sf10 would OOM a 16g driver through collect(); toRdd is
      // still this df's executedPlan, counted executor-side
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
