package graft.controlplane

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class ControllerEndpointSpec extends AnyFunSuite {

  private val plan = QueryPlanDescriptor(128, Map("op" ->
    OperatorDescriptor.contiguous("op", 4, "countV1", 128)))
  private val executor = new ReconfigurationExecutor {
    def getPlan: QueryPlanDescriptor = plan
    def assignExecutionLogic(o: String, u: String): Unit = ()
    def assignResources(o: String, p: Int): Unit = ()
    def assignWorkload(o: String, a: Vector[Int]): Unit = ()
    def execute(reason: String): ReconfigReport =
      ReconfigReport(reason, Map.empty, plan, plan)
  }

  private def http(method: String, url: String, body: Option[String] = None)
      : (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    (code, new String(is.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("source submission is feature-flagged off by default") {
    sys.props.remove(DynamicCompiler.FlagKey)
    val endpoint = new ControllerEndpoint(executor, Map.empty, port = 0)
    val port = endpoint.start()
    try {
      val (code, body) = http("POST",
        s"http://127.0.0.1:$port/jobs/controller/source",
        Some("x\nnew graft.controlplane.DummyController"))
      assert(code === 403 && body.contains("disabled"), body)
    } finally endpoint.stop()
  }

  test("POSTed controller source compiles and activates") {
    sys.props(DynamicCompiler.FlagKey) = "true"
    val endpoint = new ControllerEndpoint(executor, Map.empty, port = 0)
    val port = endpoint.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val source =
        """compiled-ctl
          |new graft.controlplane.Controller {
          |  val name = "compiled-ctl"
          |  def onBatch(e: graft.controlplane.ReconfigurationExecutor,
          |      b: Long, m: Map[Int, Long])
          |      : Option[graft.controlplane.ReconfigReport] = {
          |    if (b == 7L) Some(e.execute("compiled@7")) else None
          |  }
          |}""".stripMargin
      val (code, body) = http("POST", s"$base/jobs/controller/source",
        Some(source))
      assert(code === 200 && body.contains("compiled-ctl"), body)
      assert(endpoint.active.exists(_.name == "compiled-ctl"))
      // the compiled controller actually drives the executor
      val r = endpoint.active.get.onBatch(executor, 7L, Map.empty)
      assert(r.exists(_.reason == "compiled@7"))
      assert(endpoint.active.get.onBatch(executor, 8L, Map.empty).isEmpty)
    } finally {
      endpoint.stop()
      sys.props.remove(DynamicCompiler.FlagKey)
    }
  }

  test("POSTed count-logic source registers in the UdfRegistry") {
    sys.props(DynamicCompiler.FlagKey) = "true"
    val endpoint = new ControllerEndpoint(executor, Map.empty, port = 0)
    val port = endpoint.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val (code, body) = http("POST", s"$base/jobs/udf/source", Some(
        "countTimes10\n(key: String, prev: Long, n: Long) => prev + 10 * n"))
      assert(code === 200 && body.contains("countTimes10"), body)
      assert(UdfRegistry.names.contains("countTimes10"))
      assert(UdfRegistry("countTimes10")("k", 5L, 3L) === 35L)
      // broken source → 400 with the compiler message, not a 500
      val (bad, badBody) = http("POST", s"$base/jobs/udf/source",
        Some("broken\n(key: String) => nope"))
      assert(bad === 400 && badBody.contains("error"), badBody)
      assert(!UdfRegistry.names.contains("broken"))
    } finally {
      endpoint.stop()
      sys.props.remove(DynamicCompiler.FlagKey)
    }
  }

  test("controller registration and plan inspection over REST") {
    val endpoint = new ControllerEndpoint(executor,
      Map("dummy" -> (() => new DummyController),
        "load-balance" -> (() => new LoadBalanceController("op"))),
      port = 0) // ephemeral port for the test; 8520 in production
    val port = endpoint.start()
    try {
      val base = s"http://127.0.0.1:$port"
      // no controller active initially
      assert(http("GET", s"$base/jobs/controller")._2.contains("none"))
      // register by name
      val (code, body) = http("POST", s"$base/jobs/controller",
        Some("load-balance"))
      assert(code === 200 && body.contains("load-balance"))
      assert(endpoint.active.exists(_.name == "load-balance"))
      // unknown name → 404
      assert(http("POST", s"$base/jobs/controller", Some("nope"))._1 === 404)
      // plan inspection
      val (pc, pb) = http("GET", s"$base/jobs/plan")
      assert(pc === 200 && pb.contains("\"parallelism\":4") &&
        pb.contains("countV1"))
    } finally endpoint.stop()
  }
}
