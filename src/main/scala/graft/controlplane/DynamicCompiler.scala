package graft.controlplane

/** Runtime compilation of controller / execution-logic SOURCE CODE
  * submitted over REST — the last piece of the reference's
  * control-plane story (reference compiles Java source POSTed to the
  * stream manager: StreamManager.registerFunctionClass
  * Trisk-on-Flink/.../controlplane/streammanager/StreamManager.java:973-996,
  * request handler rest/handler/job/
  * RegisterStreamManagerControllerHandler.java:52-110, used by
  * udm/FraudDetectionController.java:155-190 to submit a
  * ProcessingFunctionV2 source string and hot-swap it in).
  *
  * Here the submitted text is SCALA source: an expression evaluating
  * to a [[Controller]] (controller submission) or to a
  * `(String, Long, Long) => Long` count logic (function submission),
  * compiled in-process with the Scala toolbox and registered under a
  * name in [[UdfRegistry]] — from where the running
  * [[ReconfigurableCountQuery]] resolves it BY NAME inside the
  * stateful closure, so a swap to freshly-compiled logic rides the
  * exact same prepare→sync→update→resume path as a built-in.
  *
  * FEATURE-FLAGGED OFF by default (`-Dgraft.dynamic.compile=true` or
  * env `GRAFT_DYNAMIC_COMPILE=1` to enable): compiling POSTed source
  * is a remote-code-execution surface, and the reference gates its
  * path behind the trisk.* config too.
  *
  * Scale note — TWO paths with different envelopes:
  *  - the TOOLBOX path ([[compileAndRegisterCountLogic]]) compiles
  *    into the driver's in-memory classloader: single-JVM only
  *    (`local[*]`), because executor-side registry resolution has no
  *    class to find on a real cluster;
  *  - the JAR-SHIP path ([[compileCountLogicJar]] +
  *    [[shipAndRegisterCountLogic]]) compiles the submission to real
  *    class files, packages them into a jar, ships it with
  *    `SparkContext.addJar` (the analog of the reference's
  *    blob-server upload at StreamManager.java:987-989), and
  *    executor-side [[UdfRegistry]] resolution falls back to loading
  *    `graft.dynamic.CountLogicGen_<name>` from the task context
  *    classloader — so a source-compiled swap works on a multi-JVM
  *    cluster (proven on `local-cluster` executors in
  *    DynamicJarShipSpec).
  * Controllers run driver-side, so controller submission is fully
  * general on either path.
  */
object DynamicCompiler {

  val FlagKey = "graft.dynamic.compile"

  def enabled: Boolean =
    sys.props.get(FlagKey).orElse(sys.env.get("GRAFT_DYNAMIC_COMPILE"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  /** One toolbox per JVM; eval is synchronized (the toolbox front end
    * is not thread-safe). */
  private lazy val toolbox = {
    import scala.tools.reflect.ToolBox
    scala.reflect.runtime.universe.runtimeMirror(getClass.getClassLoader)
      .mkToolBox()
  }

  final class CompileException(what: String, cause: Throwable)
    extends RuntimeException(
      s"$what did not compile: ${cause.getMessage}", cause)

  private def eval[T](source: String, what: String)(implicit
      ct: scala.reflect.ClassTag[T]): T = {
    if (!enabled) throw new IllegalStateException(
      s"dynamic compilation is disabled — set -D$FlagKey=true " +
        "(or GRAFT_DYNAMIC_COMPILE=1) to allow source submission")
    val value = toolbox.synchronized {
      try toolbox.eval(toolbox.parse(source))
      catch { case e: Throwable => throw new CompileException(what, e) }
    }
    value match {
      case t: T => t
      case other => throw new CompileException(what,
        new IllegalArgumentException(
          s"expression evaluates to ${other.getClass.getName}, " +
            s"expected ${ct.runtimeClass.getName}"))
    }
  }

  /** Compile a Scala expression evaluating to a [[Controller]]. */
  def compileController(source: String): Controller =
    eval[Controller](source, "controller source")

  /** Compile a Scala expression evaluating to a count logic
    * `(key, previousCount, batchRows) => newCount` and register it
    * under `name`, making it addressable by
    * `assignExecutionLogic(op, name)`. */
  def compileAndRegisterCountLogic(name: String, source: String)
      : UdfRegistry.CountLogic = {
    val fn = eval[(String, Long, Long) => Long](source, s"count logic $name")
    // generic-erasure probe: a lambda of the wrong ARGUMENT types
    // passes the Function3 class check but fails its first boxed
    // apply — surface that at registration, not mid-stream
    try fn("__typeprobe", 0L, 0L)
    catch {
      case e: ClassCastException =>
        throw new CompileException(s"count logic $name", e)
      case _: Exception => () // user logic may throw on the probe input
    }
    UdfRegistry.register(name, fn)
    fn
  }

  /** Compile a count-logic submission into a REAL jar on disk. The
    * expression is wrapped in a generator class named by the shared
    * [[UdfRegistry.ShippedClassPrefix]] convention, compiled with the
    * resident Scala compiler against this JVM's full classpath, and
    * packaged — the cluster-deployable form of the toolbox path.
    * Same feature flag: compiling submitted source is an RCE surface
    * whichever classloader it lands in. */
  def compileCountLogicJar(name: String, source: String)
      : java.nio.file.Path = {
    import java.nio.file.{Files, Path}
    if (!enabled) throw new IllegalStateException(
      s"dynamic compilation is disabled — set -D$FlagKey=true " +
        "(or GRAFT_DYNAMIC_COMPILE=1) to allow source submission")
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"shippable logic name must be an identifier, got '$name'")
    val cls = UdfRegistry.ShippedClassPrefix.split('.').last + name
    val wrapped =
      s"""package graft.dynamic
         |class $cls extends scala.Function0[(String, Long, Long) => Long]
         |    with java.io.Serializable {
         |  def apply(): (String, Long, Long) => Long = {
         |$source
         |  }
         |}""".stripMargin
    val outDir = Files.createTempDirectory(s"graft-dyn-$name")
    val settings = new scala.tools.nsc.Settings
    settings.usejavacp.value = true
    // under sbt's layered classloaders java.class.path is still the
    // forked JVM's full application classpath (fork := true)
    settings.classpath.value = sys.props("java.class.path")
    settings.outputDirs.setSingleOutput(outDir.toString)
    val reporter = new scala.tools.nsc.reporters.StoreReporter(settings)
    val g = new scala.tools.nsc.Global(settings, reporter)
    new g.Run().compileSources(List(
      new scala.reflect.internal.util.BatchSourceFile(
        s"$cls.scala", wrapped)))
    if (reporter.hasErrors)
      throw new CompileException(s"count logic $name",
        new IllegalArgumentException(reporter.infos
          .filter(_.severity == reporter.ERROR)
          .map(i => s"${i.pos.line}: ${i.msg}").mkString("; ")))
    val jar = outDir.resolve(s"$name.jar")
    val jos = new java.util.jar.JarOutputStream(
      Files.newOutputStream(jar))
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(outDir).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.toString.endsWith(".class"))
        .foreach { p: Path =>
          jos.putNextEntry(new java.util.jar.JarEntry(
            outDir.relativize(p).toString.replace('\\', '/')))
          jos.write(Files.readAllBytes(p))
          jos.closeEntry()
        }
    } finally jos.close()
    // the loose class files are fully contained in the jar now; the
    // jar itself must outlive this call (Spark's file server streams
    // it to executors from this path)
    import scala.jdk.CollectionConverters._
    Files.walk(outDir).iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".class"))
      .foreach(Files.delete)
    jar
  }

  /** Names already shipped via [[shipAndRegisterCountLogic]] — one
    * submission per name (see the throw site for why). */
  private val shippedNames =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Cluster form of [[compileAndRegisterCountLogic]]: compile to a
    * jar, `addJar` it so every executor's task classloader can load
    * the generated class ([[UdfRegistry]]'s shipped-class fallback),
    * and register driver-side through the same classloader mechanism
    * the executors will use. */
  def shipAndRegisterCountLogic(name: String, source: String,
      sc: org.apache.spark.SparkContext): UdfRegistry.CountLogic = {
    // one submission per name, enforced: executors resolve the shipped
    // class lazily and cache the FIRST instance (a JVM cannot reload
    // an identically-named class from a second addJar), so re-shipping
    // under an existing name would update the driver registry while
    // executors silently kept v1. New logic ⇒ new name (then
    // assignExecutionLogic(newName)) — same contract as the
    // reference's per-class blob registration
    // (StreamManager.registerFunctionClass).
    if (!shippedNames.add(name)) throw new IllegalArgumentException(
      s"count logic '$name' was already shipped; executor-side " +
        "classloaders cache the first-loaded class, so submit " +
        "changed logic under a NEW name and assignExecutionLogic to it")
    // the name is claimed only while the compile+ship below succeeds:
    // a failed submission (typo in the source, compile error) must not
    // burn the name for the life of the JVM — nothing reached the
    // executors, so a corrected resubmission is safe
    val jar =
      try compileCountLogicJar(name, source)
      catch { case e: Throwable => shippedNames.remove(name); throw e }
    try sc.addJar(jar.toString)
    catch { case e: Throwable => shippedNames.remove(name); throw e }
    val loader = new java.net.URLClassLoader(
      Array(jar.toUri.toURL), getClass.getClassLoader)
    val fn =
      try Class.forName(UdfRegistry.ShippedClassPrefix + name,
          true, loader)
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[() => UdfRegistry.CountLogic].apply()
      finally loader.close() // classes stay loaded; frees the jar handle
    UdfRegistry.register(name, fn)
    fn
  }
}
