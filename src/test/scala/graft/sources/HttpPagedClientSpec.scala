package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** The real HTTP client exercised end-to-end against an IN-PROCESS
  * server (offline-safe): request shape (the reference's SoQL
  * `$where` / `$limit` / User-Agent contract), bounded retry, loud
  * failure, and the full task-side fan-out through
  * [[PagedFetch.fetchPaged]] into a Dataset.
  */
class HttpPagedClientSpec extends SparkSpec {

  private def withServer(handler: HttpExchange => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/calls", (ex: HttpExchange) => handler(ex))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/calls")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, bodyText: String): Unit = {
    val bytes = bodyText.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def win(s: String, e: String) =
    WindowedIngest.Window(java.time.LocalDate.parse(s), java.time.LocalDate.parse(e))

  test("request shape: SoQL $where window bounds, unbounded $limit, User-Agent header") {
    @volatile var seenQuery: String = null
    @volatile var seenAgent: String = null
    withServer { ex =>
      seenQuery = ex.getRequestURI.getRawQuery
      seenAgent = ex.getRequestHeaders.getFirst("User-Agent")
      respond(ex, 200, """[{"call_day":"2019-01-01","n":"3"}]""")
    } { url =>
      val client = HttpPagedClient(url, "graft-test-agent/1.0", retryDelayMs = 0L)
      val recs = client.fetchRecords(win("2019-01-01", "2019-01-31")).toVector
      assert(recs === Vector("""{"call_day":"2019-01-01","n":"3"}"""))
      val decoded = java.net.URLDecoder.decode(seenQuery, StandardCharsets.UTF_8)
      assert(
        decoded.contains(
          "$where=create_time_incident>='2019-01-01T00:00:00.000' and create_time_incident<='2019-01-31T23:59:59.000'"
        ),
        decoded
      )
      assert(decoded.contains("$limit=1000000000000"), decoded)
      assert(seenAgent === "graft-test-agent/1.0")
    }
  }

  test("bounded retry: a 500 then a 200 succeeds on the second attempt; persistent failure is loud") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      if (hits.incrementAndGet() == 1) respond(ex, 500, "flake")
      else respond(ex, 200, """[{"ok":"1"}]""")
    } { url =>
      val client = HttpPagedClient(url, "a", maxAttempts = 3, retryDelayMs = 0L)
      assert(client.fetchRecords(win("2019-01-01", "2019-01-31")).toVector === Vector("""{"ok":"1"}"""))
      assert(hits.get() === 2)
    }
    withServer(ex => respond(ex, 503, "down")) { url =>
      val client = HttpPagedClient(url, "a", maxAttempts = 2, retryDelayMs = 0L)
      val e = intercept[RuntimeException](client.fetchBody(win("2019-01-01", "2019-01-31")))
      assert(e.getMessage.contains("after 2 attempts") && e.getMessage.contains("HTTP 503"), e.getMessage)
    }
  }

  test("end-to-end: windows fan out through fetchPaged, each task fetching its own page") {
    // the server derives the payload from the REQUESTED window, so the
    // assertion proves each task fetched ITS window, not a shared one
    withServer { ex =>
      val q = java.net.URLDecoder.decode(ex.getRequestURI.getRawQuery, StandardCharsets.UTF_8)
      val start = """create_time_incident>='(\d{4}-\d{2}-\d{2})""".r.findFirstMatchIn(q).get.group(1)
      respond(ex, 200, s"""[{"window_start":"$start","n_calls":"7"},{"window_start":"$start","n_calls":"5"}]""")
    } { url =>
      val client = HttpPagedClient(url, "a", retryDelayMs = 0L)
      val windows = WindowedIngest.monthlyWindows(
        java.time.LocalDate.parse("2019-01-01"), java.time.LocalDate.parse("2019-03-31"))
      import spark.implicits._
      val ds = PagedFetch.fetchPaged(spark, windows)(client.fetchRecords)
      val rows = spark.read.json(ds).orderBy("window_start").collect()
      assert(rows.length === windows.size * 2)
      assert(
        rows.map(_.getAs[String]("window_start")).distinct.toVector ===
          windows.map(_.start.toString).toVector
      )
      assert(rows.map(_.getAs[String]("n_calls")).forall(v => v == "7" || v == "5"))
    }
  }
}
