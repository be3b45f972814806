package graft.controlplane

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Driver-side REST endpoint for controller lifecycle — the analog of
  * the reference's controller-registration handler (reference
  * rest/handler/job/RegisterStreamManagerControllerHandler.java:52-110,
  * served on port 8520 per readme.md:46-48).
  *
  * `POST /jobs/controller` with a registered controller name activates
  * that controller for the loop; `GET /jobs/plan` returns the current
  * plan. The reference additionally compiles controller *source code*
  * submitted over REST (ByteClassLoader); here controllers come from a
  * name→factory registry — runtime Scala compilation is deliberately
  * out of scope (feature-flagged in the reference too, and a remote
  * code-execution surface).
  */
final class ControllerEndpoint(
    executor: ReconfigurationExecutor,
    controllers: Map[String, () => Controller],
    port: Int = 8520) {

  @volatile private var activeController: Option[Controller] = None
  private var server: HttpServer = _

  def active: Option[Controller] = activeController

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/jobs/controller", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "POST" =>
          val name = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8).trim
          controllers.get(name) match {
            case Some(factory) =>
              activeController = Some(factory())
              respond(ex, 200, s"""{"registered":"$name"}""")
            case None =>
              respond(ex, 404, s"""{"error":"unknown controller $name"}""")
          }
        case "GET" =>
          respond(ex, 200,
            s"""{"active":"${activeController.map(_.name).getOrElse("none")}"}""")
        case _ => respond(ex, 405, """{"error":"method not allowed"}""")
      }
    })
    server.createContext("/jobs/plan", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val plan = executor.getPlan
        val ops = plan.operators.map { case (name, d) =>
          s""""$name":{"parallelism":${d.parallelism},"udf":"${d.udfName}"}"""
        }.mkString("{", ",", "}")
        respond(ex, 200,
          s"""{"maxParallelism":${plan.maxParallelism},"operators":$ops}""")
      }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
