package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** F3 as a LIVE endpoint: the reference's `POST /workflow`
  * (api.http:4-23) served over a real socket — the last
  * completeness edge of the workflow surface ([[WorkflowMain]] is the
  * batch main with the identical request/response contract).
  *
  * Served with the JDK's built-in HttpServer (no new dependencies):
  *
  *  - `POST /workflow` — body `{"name": "index"|"search"|"keyword"|
  *    "hybrid", "elements": [...], "alpha": 0.5?}`; responds with
  *    [[WorkflowMain]]'s one-line JSON (200), or `{"error": "..."}`
  *    with 400 on a bad request (unknown workflow name, malformed
  *    body, missing index) and 500 on a server-side fault;
  *  - `GET /health` — liveness probe, `{"status":"ok"}`.
  *
  * Requests execute SEQUENTIALLY on one shared SparkSession (executor
  * size 1): a Spark driver is single-tenant — intra-query parallelism
  * belongs to the cluster scheduler, and two concurrent `index`
  * workflows against one store would race its version pointer. A
  * deployment that needs request concurrency runs replicas behind a
  * balancer, exactly like the reference's uvicorn workers. */
object WorkflowServer {

  /** JSON string-literal escaping for error bodies: `\` and `"` plus
    * EVERY control char below 0x20 (tabs and friends in an exception
    * message must not produce invalid JSON). */
  private[graft] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Start serving; `port = 0` picks a free port (read it back from
    * `getAddress.getPort`). Caller stops with `server.stop(0)`.
    * Binds loopback by default (`bindAll = true` opts into exposing
    * the unauthenticated endpoint beyond the local host). */
  def start(spark: SparkSession, indexPath: String, port: Int = 0,
      k: Int = 10, bindAll: Boolean = false): HttpServer = {
    val addr =
      if (bindAll) new InetSocketAddress(port)
      else new InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, port)
    val server = HttpServer.create(addr, 0)

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))

    server.createContext("/workflow", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, """{"error":"POST only"}""")
        else {
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          respond(ex, 200, WorkflowMain.runJson(spark, body, indexPath, k))
        }
      } catch {
        case e: Exception =>
          // bad REQUESTS (unknown workflow, malformed body, missing
          // index — everything a caller can fix) are 400; anything
          // else is a server fault and reports 500, so clients can
          // tell the two apart
          val code = e match {
            case _: IllegalArgumentException => 400
            case _: graft.index.IndexNotFoundException => 400
            case _ => 500
          }
          val msg = jsonEscape(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          respond(ex, code, s"""{"error":"$msg"}""")
      }
    })

    // sequential by contract (see scaladoc): one worker thread.
    // DAEMON, so an embedding JVM (sbt runMain, a notebook) can exit
    // after `server.stop(0)` even if the caller forgets [[shutdown]]
    // — a non-daemon pool thread outlives HttpServer.stop and hangs
    // the host otherwise (found by the r14 workflow_rest verify run).
    server.setExecutor(java.util.concurrent.Executors
      .newSingleThreadExecutor { (r: Runnable) =>
        val t = new Thread(r, "workflow-server-worker")
        t.setDaemon(true)
        t
      })
    server.start()
    server
  }

  /** Stop serving AND release the worker thread ([[start]] owns the
    * executor, HttpServer.stop does not). */
  def shutdown(server: HttpServer): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdownNow(); ()
      case _ => ()
    }
  }

  /** `sbt "runMain graft.WorkflowServer <indexPath> [port] [k]"` —
    * serves until killed. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WorkflowServer <indexPath> [port] [k]")
    val port = if (args.length > 1) args(1).toInt else 8080
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, args(0), port, k)
    System.err.println(
      s"[workflow-server] listening on :${server.getAddress.getPort}")
    Thread.currentThread().join() // serve until killed
  }
}
