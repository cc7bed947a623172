package graft.sources

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** The real HTTP fetcher behind the paged source — S1's last
  * structural gap (the driver environment has no egress, so queries
  * run on [[PagedFetch.fetchStub]]; THIS class is what a deployment
  * plugs into [[PagedFetch.fetchPaged]] instead).
  *
  * Shape mirrors the reference (`app.py:93,133-134,148-156`): the
  * endpoint URL and the User-Agent header come from the `url` /
  * `user_agent` environment variables; each window issues one GET
  * with a SoQL `$where` clause bounding `create_time_incident` to
  * `[start T00:00:00.000, end T23:59:59.000]` and an effectively
  * unbounded `$limit`; the response is a JSON array of records. The
  * reference's hand-rolled retry loop (`app.py:649-740`'s shape on
  * the read side) becomes a bounded per-REQUEST retry here — and
  * because the fetch runs INSIDE a task ([[PagedFetch.fetchPaged]]),
  * Spark's task retry is a second, independent layer above it.
  *
  * Serializable by construction: the instance carries only strings
  * and numbers; the [[HttpClient]] is built per fetch call inside the
  * task (one HTTP session per window-task, never shipped).
  */
final case class HttpPagedClient(
    baseUrl: String,
    userAgent: String,
    maxAttempts: Int = 6,
    retryDelayMs: Long = 60000L
) extends Serializable {
  require(maxAttempts >= 1, "maxAttempts must be at least 1")

  /** The reference's SoQL predicate for one window (`app.py:133-134`). */
  def soqlWhere(w: WindowedIngest.Window): String =
    s"create_time_incident>='${w.start}T00:00:00.000' and create_time_incident<='${w.endInclusive}T23:59:59.000'"

  /** Full request URI: `$where` (value URL-encoded) + the unbounded
    * `$limit` the reference pins.
    */
  def requestUri(w: WindowedIngest.Window): java.net.URI =
    java.net.URI.create(
      s"$baseUrl?%24where=${URLEncoder.encode(soqlWhere(w), StandardCharsets.UTF_8)}&%24limit=1000000000000"
    )

  /** GET one window's page with bounded retry: non-200 responses and
    * transport errors retry up to `maxAttempts` with `retryDelayMs`
    * between attempts (the reference sleeps 60 s, `app.py:736`), then
    * fail loudly with the last error.
    */
  def fetchBody(w: WindowedIngest.Window): String = {
    val client = HttpClient.newBuilder().followRedirects(HttpClient.Redirect.NORMAL).build()
    val req = HttpRequest
      .newBuilder(requestUri(w))
      .header("User-Agent", userAgent)
      .GET()
      .build()
    var attempt = 0
    var lastErr: String = ""
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val resp: HttpResponse[String] = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) return resp.body()
        lastErr = s"HTTP ${resp.statusCode()}"
      } catch {
        case e: java.io.IOException => lastErr = e.toString
      }
      if (attempt < maxAttempts && retryDelayMs > 0L) Thread.sleep(retryDelayMs)
    }
    sys.error(s"paged fetch failed after $maxAttempts attempts for window ${w.start}..${w.endInclusive}: $lastErr")
  }

  /** One window's records as raw per-record JSON strings (the array
    * unnested task-side; callers parse with `from_json` or a typed
    * mapper). The `Window => Iterator[T]` shape [[PagedFetch
    * .fetchPaged]] fans out.
    */
  def fetchRecords(w: WindowedIngest.Window): Iterator[String] = {
    val root = new ObjectMapper().readTree(fetchBody(w))
    require(root != null && root.isArray, s"paged endpoint returned non-array JSON for window ${w.start}")
    val out = Vector.newBuilder[String]
    root.forEach(n => out += n.toString)
    out.result().iterator
  }
}

object HttpPagedClient {
  /** The deployment constructor — the reference's env contract
    * verbatim (`url`, `user_agent`; `app.py:93,148`).
    */
  def fromEnv(): HttpPagedClient =
    HttpPagedClient(
      sys.env.getOrElse("url", sys.error("env var 'url' not set (the paged endpoint)")),
      sys.env.getOrElse("user_agent", sys.error("env var 'user_agent' not set"))
    )
}
