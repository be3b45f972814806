package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (one JVM, forked by sbt).
  * A method, not a lazy val: a suite that needs its own master (e.g.
  * DynamicJarShipSpec's `local-cluster`) stops the JVM-wide context,
  * and the next suite must get a fresh session, not the stopped one. */
object SparkTestSession {
  def spark: SparkSession = synchronized {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
