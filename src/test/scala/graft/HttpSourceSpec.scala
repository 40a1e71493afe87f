package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.sources.Sources

/** S6 live HTTP extraction against a local stub server
  * (`base_extractors.py:245-283`): GET + params/headers,
  * raise-for-status, bounded retry with backoff, envelope unwrap. */
class HttpSourceSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) =>
      respond(ex, 200,
        """{"data": [{"id": 1, "name": "alpha"}, {"id": 2, "name": "beta"}]}"""))
    server.createContext("/echo", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val h = Option(ex.getRequestHeaders.getFirst("X-Api-Key")).getOrElse("")
      respond(ex, 200, s"""{"items": [{"query": "$q", "key": "$h"}]}""")
    })
    server.createContext("/flaky", (ex: HttpExchange) =>
      // two 503s, then success: inside the default retry budget
      if (flakyHits.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, """{"results": [{"v": 42}]}"""))
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "no"))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("GET + envelope unwrap to a DataFrame") {
    val df = Sources.api(spark, s"$base/ok")
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alpha", "beta"))
  }

  test("query params are encoded and headers forwarded") {
    val df = Sources.api(spark, s"$base/echo",
      headers = Map("X-Api-Key" -> "k123"),
      params = Map("limit" -> "10", "q" -> "a b"))
    val row = df.collect().head
    val q = row.getString(df.columns.indexOf("query"))
    assert(q.contains("limit=10") && q.contains("q=a+b"))
    assert(row.getString(df.columns.indexOf("key")) == "k123")
  }

  test("transient 5xx retries until success") {
    flakyHits.set(0)
    val df = Sources.api(spark, s"$base/flaky")
    assert(df.collect().head.getLong(0) == 42L)
    assert(flakyHits.get() == 3, s"expected 3 attempts, saw ${flakyHits.get()}")
  }

  test("permanent 4xx fails fast without retries") {
    val before = System.nanoTime()
    val e = intercept[Sources.HttpStatusException] {
      Sources.httpGet(s"$base/missing")
    }
    assert(e.code == 404 && e.permanent)
    // fail-fast: no backoff sleeps happened (retry budget would be >1s)
    assert((System.nanoTime() - before) / 1e9 < 1.0)
  }

  test("exhausted retries surface the last transient error") {
    flakyHits.set(-100) // stays 5xx for the whole retry budget
    val e = intercept[java.io.IOException] {
      Sources.httpGet(s"$base/flaky", retries = 1, backoffMs = 1)
    }
    assert(e.getMessage.contains("failed after 2 attempts"))
    assert(e.getCause.isInstanceOf[Sources.HttpStatusException])
  }

  test("validateApi: alive even on 4xx, dead on closed port") {
    assert(Sources.validateApi(s"$base/ok"))
    assert(Sources.validateApi(s"$base/missing")) // responds, so alive
    assert(!Sources.validateApi("http://127.0.0.1:1/nope"))
  }
}
