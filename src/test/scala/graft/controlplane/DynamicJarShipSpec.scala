package graft.controlplane

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cluster envelope of runtime-compiled count logic (the reference
  * ships compiled blobs to every TaskExecutor,
  * StreamManager.java:987-989): the jar-ship path must resolve on
  * executors that are NOT the driver JVM. `local-cluster[2,1,1024]`
  * launches two real worker-managed executor PROCESSES, so registry
  * resolution inside a task exercises the shipped-jar classloader
  * fallback ([[UdfRegistry]]), never the driver's in-memory map. */
class DynamicJarShipSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  test("source-compiled count logic resolves on non-driver executors") {
    sys.props(DynamicCompiler.FlagKey) = "true"
    // local-cluster workers locate the dist through spark.test.home
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = "/opt/spark"
    // one SparkContext per JVM: retire the shared local[4] session so
    // getOrCreate builds THIS master (SparkTestSession revives a fresh
    // one for whatever suite runs next). Session construction sits
    // INSIDE the try: if local-cluster startup fails, the finally must
    // still strip the test-mode + RCE-flag props from the shared JVM.
    var spark: SparkSession = null
    try {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.getDefaultSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = SparkSession.builder()
        .master("local-cluster[2,1,1024]")
        .appName("graft-jar-ship")
        // executors need the repo classes (UdfRegistry) + spark jars;
        // the forked test JVM's classpath carries exactly that set
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        // the worker builds the executor command in-JVM; without the
        // dist launch scripts the scala version must come from the env
        .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val fn = DynamicCompiler.shipAndRegisterCountLogic("shippedV2",
        "(k: String, prev: Long, rows: Long) => prev + 2 * rows",
        spark.sparkContext)
      // driver-side registration works through the jar classloader
      assert(fn("k", 10L, 3L) === 16L)
      assert(UdfRegistry.names.contains("shippedV2"))
      // re-shipping an existing name is refused: executor-side
      // classloaders cache the first-loaded class, so a same-name
      // resubmission would silently leave executors on v1
      intercept[IllegalArgumentException] {
        DynamicCompiler.shipAndRegisterCountLogic("shippedV2",
          "(k: String, prev: Long, rows: Long) => prev + 3 * rows",
          spark.sparkContext)
      }

      val driverJvm =
        java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      val results = spark.sparkContext.parallelize(1 to 8, 8).map { i =>
        val jvm =
          java.lang.management.ManagementFactory.getRuntimeMXBean.getName
        (jvm, UdfRegistry("shippedV2")("key", 100L, i.toLong))
      }.collect()

      assert(results.map(_._2).sorted.toSeq ===
        (1 to 8).map(i => 100L + 2 * i))
      val taskJvms = results.map(_._1).toSet
      assert(!taskJvms.contains(driverJvm),
        s"tasks ran in the driver JVM ($driverJvm): $taskJvms")
      assert(taskJvms.nonEmpty)
    } finally {
      if (spark != null) spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      sys.props.remove("spark.testing")
      sys.props.remove("spark.test.home")
      sys.props.remove(DynamicCompiler.FlagKey)
    }
  }
}
