package graft.controlplane

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Driver-side REST endpoint for controller lifecycle — the analog of
  * the reference's controller-registration handler (reference
  * rest/handler/job/RegisterStreamManagerControllerHandler.java:52-110,
  * served on port 8520 per readme.md:46-48).
  *
  * Routes:
  *  - `POST /jobs/controller` (body = registered name): activate a
  *    pre-compiled controller from the name→factory registry;
  *  - `POST /jobs/controller/source` (body = name on the first line,
  *    Scala source of a Controller expression after it): compile the
  *    source via [[DynamicCompiler]] and activate the result — the
  *    reference's submit-source path (its SubmitControllerRequestBody
  *    carries controllerID + class name + source file the same way);
  *  - `POST /jobs/udf/source` (body = name ⏎ source of a
  *    `(String, Long, Long) => Long`): compile and register count
  *    logic in [[UdfRegistry]] so `assignExecutionLogic` can swap the
  *    running query to it (StreamManager.registerFunctionClass →
  *    changeOfLogic in the reference);
  *  - `GET /jobs/controller` / `GET /jobs/plan`: inspection.
  *
  * Source routes are feature-flagged by [[DynamicCompiler.enabled]]
  * (403 when off) — compiling POSTed source is a remote-code-execution
  * surface.
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

  /** Body protocol of the source routes: first line = name, rest =
    * Scala source (the reference's controllerID + classFile pair). */
  private def nameAndSource(body: String): (String, String) = {
    val i = body.indexOf('\n')
    if (i < 0) (body.trim, "") else (body.take(i).trim, body.drop(i + 1))
  }

  private def handleSource(ex: HttpExchange)(
      compile: (String, String) => String): Unit = {
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, """{"error":"method not allowed"}"""); return
    }
    if (!DynamicCompiler.enabled) {
      respond(ex, 403,
        s"""{"error":"dynamic compilation disabled; set -D${DynamicCompiler.FlagKey}=true"}""")
      return
    }
    val (name, source) = nameAndSource(new String(
      ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    if (name.isEmpty || source.trim.isEmpty) {
      respond(ex, 400, """{"error":"body = name on first line, Scala source after"}""")
      return
    }
    try respond(ex, 200, compile(name, source))
    catch {
      case e: DynamicCompiler.CompileException =>
        respond(ex, 400, s"""{"error":${jsonStr(e.getMessage)}}""")
      // anything else from the compile/eval path (e.g. the NPE a
      // source evaluating to null raises inside eval's type match)
      // must still ANSWER the exchange — an escaped throwable drops
      // the connection with no response at all
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, s"""{"error":${
          jsonStr(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }}""")
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/jobs/controller/source", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        handleSource(ex) { (name, source) =>
          val c = DynamicCompiler.compileController(source)
          activeController = Some(c)
          s"""{"compiled":${jsonStr(name)},"controller":${jsonStr(c.name)}}"""
        }
    })
    server.createContext("/jobs/udf/source", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        handleSource(ex) { (name, source) =>
          DynamicCompiler.compileAndRegisterCountLogic(name, source)
          s"""{"registered":${jsonStr(name)}}"""
        }
    })
    server.createContext("/jobs/controller", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "POST" =>
          val name = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8).trim
          controllers.get(name) match {
            case Some(factory) =>
              activeController = Some(factory())
              respond(ex, 200, s"""{"registered":${jsonStr(name)}}""")
            case None =>
              respond(ex, 404,
                s"""{"error":${jsonStr(s"unknown controller $name")}}""")
          }
        case "GET" =>
          respond(ex, 200, s"""{"active":${
            jsonStr(activeController.map(_.name).getOrElse("none"))}}""")
        case _ => respond(ex, 405, """{"error":"method not allowed"}""")
      }
    })
    server.createContext("/jobs/plan", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val plan = executor.getPlan
        val ops = plan.operators.map { case (name, d) =>
          s"""${jsonStr(name)}:{"parallelism":${d.parallelism},"udf":${
            jsonStr(d.udfName)}}"""
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
