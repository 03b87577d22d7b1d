package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** F3 as a LIVE socket: a real HTTP client drives the reference's
  * POST /workflow request shapes (api.http:4-23) end to end against
  * [[WorkflowServer]] — index over the wire, search over the wire,
  * health probe, and the error contract. */
class WorkflowServerSpec extends SparkTestBase {

  private lazy val http = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String)
      : HttpResponse[String] =
    http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("the reference's POST /workflow shapes served over a real " +
    "socket: index then search then keyword; health; bad requests " +
    "are 400 with an error body, wrong method 405") {
    val dir = Files.createTempDirectory("graft-wf-server").toString
    val server = WorkflowServer.start(spark, dir, port = 0, k = 3)
    val port = server.getAddress.getPort
    try {
      assert(get(port, "/health").body() == """{"status":"ok"}""")

      val idx = post(port, "/workflow",
        """{"name": "index",
          | "elements": [
          |   "US tops 5 million confirmed virus cases",
          |   "Maine man wins lottery with a hash join",
          |   "vector search engines rank by cosine"
          | ]}""".stripMargin)
      assert(idx.statusCode() == 200, idx.body())
      assert(idx.body() == """{"name":"index","indexed":3}""")

      // searching with an exact indexed text: self-match ranks first
      // with score 1.0 under any encoder
      val search = post(port, "/workflow",
        """{"name": "search",
          | "elements": ["vector search engines rank by cosine"]}"""
          .stripMargin)
      assert(search.statusCode() == 200, search.body())
      assert(search.body().startsWith("""{"name":"search","results":[["""),
        search.body())
      assert(search.body().contains(""""uid":"000000002","docid":2,"score":1.0"""),
        search.body())

      val kw = post(port, "/workflow",
        """{"name": "keyword", "elements": ["lottery hash"]}""")
      assert(kw.statusCode() == 200, kw.body())
      assert(kw.body().contains(""""docid":1"""), kw.body())

      // error contract: unknown workflow name -> 400 with an error
      // body, the stream stays serviceable afterwards
      val bad = post(port, "/workflow", """{"name": "nope", "elements": []}""")
      assert(bad.statusCode() == 400, bad.body())
      assert(bad.body().contains("unknown workflow"), bad.body())
      val notJson = post(port, "/workflow", "this is not json")
      assert(notJson.statusCode() == 400, notJson.body())
      assert(get(port, "/workflow").statusCode() == 405)
      assert(get(port, "/health").body() == """{"status":"ok"}""")
    } finally WorkflowServer.shutdown(server)
  }

  test("error contract per verb: search/keyword/hybrid against a " +
    "missing index are 400 with an error body, and the session " +
    "serves the next request") {
    val dir = Files.createTempDirectory("graft-wf-absent").toString + "/none"
    val server = WorkflowServer.start(spark, dir, port = 0, k = 3)
    val port = server.getAddress.getPort
    try {
      Seq("search", "keyword", "hybrid").foreach { verb =>
        val r = post(port, "/workflow",
          s"""{"name": "$verb", "elements": ["anything at all"]}""")
        assert(r.statusCode() == 400, s"$verb: ${r.body()}")
        assert(r.body().startsWith("""{"error":""""), r.body())
      }
      // a body with no name field is a bad request, not a crash
      val noName = post(port, "/workflow", """{"elements": ["x"]}""")
      assert(noName.statusCode() == 400, noName.body())
      // the single-tenant session survives all of the above: two
      // sequential good requests reuse it end to end
      val idx = post(port, "/workflow",
        """{"name": "index", "elements": ["one doc", "two docs"]}""")
      assert(idx.statusCode() == 200, idx.body())
      val s2 = post(port, "/workflow",
        """{"name": "search", "elements": ["one doc"]}""")
      assert(s2.statusCode() == 200, s2.body())
      assert(s2.body().contains(""""docid":0"""), s2.body())
    } finally WorkflowServer.shutdown(server)
  }

  test("concurrent requests serialize on the single-tenant session: " +
    "overlapping searches (and a health probe in the middle) all " +
    "answer 200 with byte-identical bodies to the sequential run, " +
    "and overlapping index requests leave a consistent store") {
    val dir = Files.createTempDirectory("graft-wf-conc").toString
    val server = WorkflowServer.start(spark, dir, port = 0, k = 3)
    val port = server.getAddress.getPort
    try {
      val idx = post(port, "/workflow",
        """{"name": "index",
          | "elements": [
          |   "US tops 5 million confirmed virus cases",
          |   "Maine man wins lottery with a hash join",
          |   "vector search engines rank by cosine"
          | ]}""".stripMargin)
      assert(idx.statusCode() == 200, idx.body())
      val query =
        """{"name": "search",
          | "elements": ["vector search engines rank by cosine"]}"""
          .stripMargin
      val sequential = post(port, "/workflow", query)
      assert(sequential.statusCode() == 200)
      // 8 overlapping searches from 8 client threads; the single
      // worker must queue them — every response identical to the
      // sequential baseline, none dropped, no 500s
      import scala.jdk.CollectionConverters._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val tasks = (1 to 8).map(_ =>
          (() => post(port, "/workflow", query)):
            java.util.concurrent.Callable[
              java.net.http.HttpResponse[String]])
        val health = pool.submit(
          (() => get(port, "/health")):
            java.util.concurrent.Callable[
              java.net.http.HttpResponse[String]])
        val rs = pool.invokeAll(tasks.asJava).asScala.map(_.get())
        rs.foreach { r =>
          assert(r.statusCode() == 200, r.body())
          assert(r.body() == sequential.body(), r.body())
        }
        assert(health.get().statusCode() == 200)
        // overlapping INDEX requests: the scaladoc's race scenario —
        // serialized by the executor, so both complete and the store
        // stays consistent (the second overwrite wins; a follow-up
        // search answers from a well-formed index, never a torn one)
        val idxBody1 =
          """{"name": "index", "elements": ["alpha doc", "beta doc"]}"""
        val idxBody2 =
          """{"name": "index", "elements": ["gamma doc", "delta doc", "epsilon doc"]}"""
        val both = pool.invokeAll(Seq(
          (() => post(port, "/workflow", idxBody1)):
            java.util.concurrent.Callable[
              java.net.http.HttpResponse[String]],
          (() => post(port, "/workflow", idxBody2)):
            java.util.concurrent.Callable[
              java.net.http.HttpResponse[String]]).asJava)
          .asScala.map(_.get())
        assert(both.forall(_.statusCode() == 200),
          both.map(_.body()).mkString(" | "))
        val after = post(port, "/workflow",
          """{"name": "search", "elements": ["alpha doc"]}""")
        assert(after.statusCode() == 200, after.body())
        // whichever index ran last, the store answers with a full
        // result set of ITS corpus (2 or 3 docs, k=3)
        val n = after.body().sliding(7).count(_ == """"uid":"""")
        assert(n == 2 || n == 3, after.body())
      } finally pool.shutdownNow()
    } finally WorkflowServer.shutdown(server)
  }

  test("error bodies stay valid JSON when the message carries " +
    "control characters (escaped as \\u00XX)") {
    val dir = Files.createTempDirectory("graft-wf-esc").toString
    val server = WorkflowServer.start(spark, dir, port = 0, k = 3)
    val port = server.getAddress.getPort
    try {
      post(port, "/workflow",
        """{"name": "index", "elements": ["alpha doc", "beta doc"]}""")
      // a keyword query with only a TAB has no terms; the require()
      // message interpolates the raw tab, which must come back as an
      // escape sequence, never a literal control byte
      val r = post(port, "/workflow",
        "{\"name\": \"keyword\", \"elements\": [\"\\t\"]}")
      assert(r.statusCode() == 400, r.body())
      assert(!r.body().exists(_ < 0x20), "raw control byte in body")
      assert(r.body().contains("\\u0009"), r.body())
    } finally WorkflowServer.shutdown(server)
  }

  test("jsonEscape escapes every control character and the JSON " +
    "specials, and nothing else") {
    assert(WorkflowServer.jsonEscape("a\"b\\c\td\ne\u0001")
      == "a\\\"b\\\\c\\u0009d\\u000ae\\u0001")
    assert(WorkflowServer.jsonEscape("plain text stays") ==
      "plain text stays")
  }
}
