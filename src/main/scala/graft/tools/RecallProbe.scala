package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for [[graft.operators.AnnRecall.structuredReport]]
  * on one planted-cluster fixture dir — the iterate-on-recall loop
  * without paying a full bench leg. Prints the report fields line by
  * line (the bench artifact carries the canonical JSON form). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/clustered/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = graft.operators.AnnRecall.structuredReport(spark, dir)
    println(f"dir=$dir%s  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    r.legs.foreach { case (n, v) => println(f"  leg $n%-22s $v%.3f") }
    println(f"  negctrl ${r.negControl}%.3f")
    println(s"  nlist=${r.nlist} curve=" +
      r.curve.map(p => f"${p.nprobe}:${p.recall}%.2f").mkString(","))
    println(s"  alt_nlist=${r.altNlist} curve=" +
      r.altCurve.map(p => f"${p.nprobe}:${p.recall}%.2f").mkString(","))
    println(s"  ivf_nlist=${r.ivfNlist} curve=" +
      r.ivfCurve.map(p => f"${p.nprobe}:${p.recall}%.2f").mkString(","))
    println(s"  or_amp=" + r.orAmp.map(p =>
      s"L${p.tables}xb${p.bits}:r${p.recall} rows=${p.indexRows} " +
        s"pairs=${p.candPairs}").mkString(" | "))
    println(s"  refine_curve=" + r.refineCurve.map(p =>
      f"kf${p.kFactor}%d@np${p.nprobe}%d:${p.recall}%.2f")
      .mkString(","))
    spark.stop()
  }
}
