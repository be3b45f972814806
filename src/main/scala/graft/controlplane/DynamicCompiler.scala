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
  * Scale note — SINGLE-JVM ONLY, BY CONSTRUCTION. The compiled
  * classes live in the driver's in-memory toolbox classloader.
  * Controllers run driver-side, so controller submission is fully
  * general; compiled COUNT LOGIC, however, is resolved from the
  * [[UdfRegistry]] singleton by name inside the stateful closure,
  * which executes on executors — correct in `local[*]` (one JVM, as
  * in this repo's deployment), but on a multi-JVM cluster the
  * executor-side registry has no entry and resolution fails fast
  * with the registry's unknown-name error. Future work for a real
  * cluster deployment: extract the class bytes from the toolbox's
  * virtual directory into a jar, ship it (`SparkContext.addJar`, the
  * analog of the reference's blob-server upload at
  * StreamManager.java:987-989) and install into the executor-side
  * registry on first use. None of that exists today; built-in
  * (pre-compiled) logic swaps are unaffected since their classes are
  * on every JVM's classpath.
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
}
