package graft.sources

import com.fasterxml.jackson.databind.JsonNode

import graft.core.Json

/** HTTP source family: a generic paginated fetch loop with pluggable
  * pagination strategies, a retry/backoff client wrapper, and JSON-path
  * record descent — the reference's "scan loop" re-expressed as pure
  * strategy objects (testable against an in-process mock server, no egress).
  *
  * Reference evidence per strategy:
  *  - NextUrl:    follow `next` link in body      (`integrations/pokeapi/poke.go:32-40`)
  *  - LinkHeader: RFC-5988 `Link: <…>; rel="next"` (`integrations/shopify/shopify.go:55-84`)
  *  - Marker:     re-issue with `marker` param     (`integrations/klaviyo/klaviyo.go:36-44`)
  *  - Offset:     `start += num` until short page  (`integrations/sitoo/sitoo.go:56-62`)
  *  - OData:      follow `@odata.nextLink`         (`integrations/storm/storm.go:57-65`)
  *
  * Scale notes: next-url/marker/link-header chains are inherently sequential
  * (each page's address comes from the previous response) — one partition per
  * stream, exactly like the reference's single goroutine per stream. Offset
  * pagination splits into N parallel range partitions when `totalHint` is
  * known (the natural DataSource-V2 InputPartition split, SURVEY §2 S6).
  */
final case class HttpRequest(
    url: String,
    params: Seq[(String, String)] = Nil,
    headers: Seq[(String, String)] = Nil) {
  def fullUrl: String =
    if (params.isEmpty) url
    else {
      val qs = params.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      url + (if (url.contains('?')) "&" else "?") + qs
    }
  def withParam(k: String, v: String): HttpRequest =
    copy(params = params.filterNot(_._1 == k) :+ (k -> v))
}

final case class HttpResponse(status: Int, body: String, headers: Map[String, String]) {
  lazy val json: JsonNode = Json.parse(body)
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
}

/** Pluggable transport (java.net in production, a stub in tests).
  * Serializable so a base client can ride into a Spark read task — the page
  * loop then streams executor-side instead of materializing on the driver.
  */
trait HttpClient extends Serializable {
  def get(req: HttpRequest): HttpResponse
}

/** java.net.http-based client. Partition-side use is fine: the client is
  * constructed inside the task, never serialized.
  */
final class JdkHttpClient(timeoutMs: Long = 30000) extends HttpClient {
  // @transient: the JDK client object is not serializable; an instance that
  // already served a driver-side call must still ride into a task closure
  // (the deserialized copy lazily re-creates its transport).
  // NORMAL redirect policy (http→https upgrades allowed, never downgrades):
  // the JDK default is Redirect.NEVER, under which a 301-ing API endpoint
  // passes RetryingClient (3xx is not an error there) and fails later with
  // a cryptic JSON parse error on the redirect body
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
  override def get(req: HttpRequest): HttpResponse = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.fullUrl))
    req.headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    val hdrs = scala.jdk.CollectionConverters.MapHasAsScala(resp.headers().map()).asScala
      .map { case (k, vs) => k -> (if (vs.isEmpty) "" else vs.get(0)) }.toMap
    HttpResponse(resp.statusCode(), resp.body(), hdrs)
  }
}

/** Retry/backoff wrapper honoring Retry-After on 429/5xx (reference
  * `DefaultRetryer`, `utils.go:35-38`, `readme.MD:97-117`). Shared per
  * connector so one rate limit throttles all of its streams.
  */
final class RetryingClient(
    inner: HttpClient,
    maxRetries: Int = 5,
    baseDelayMs: Long = 200,
    sleep: Long => Unit = Thread.sleep) extends HttpClient {
  override def get(req: HttpRequest): HttpResponse = {
    var attempt = 0
    while (true) {
      val resp =
        try inner.get(req)
        catch {
          case e: java.io.IOException if attempt < maxRetries =>
            sleep(baseDelayMs << attempt); attempt += 1; null
        }
      if (resp != null) {
        if ((resp.status == 429 || resp.status >= 500) && attempt < maxRetries) {
          val delay = resp.header("Retry-After").flatMap(_.toLongOption).map(_ * 1000)
            .getOrElse(baseDelayMs << attempt)
          sleep(delay); attempt += 1
        } else if (resp.status >= 300) {
          // >= 300, not 400: transports follow redirects themselves (see
          // JdkHttpClient), so a surviving 3xx is a redirect loop / protocol
          // downgrade / misconfiguration — surface it as an HTTP error
          // instead of letting the caller JSON-parse an HTML redirect body.
          // 304 Not Modified is deliberately included: this client never
          // sends conditional validators (no If-None-Match/If-Modified-
          // Since anywhere in the stack), so a 304 can only mean a
          // misconfigured upstream; if conditional GETs are ever added,
          // special-case 304 here first.
          throw new RuntimeException(s"HTTP ${resp.status} for ${req.fullUrl}: ${resp.body.take(200)}")
        } else return resp
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Token-bucket rate limiter: `permitsPerSec` sustained rate with up to
  * `burst` tokens of headroom — the per-connector budget the reference
  * sidesteps via `concurrency=1` (SURVEY §7 hard part b). Thread-safe, so
  * one instance shared across a connector's streams throttles them jointly;
  * on executors, hold one per JVM per connector (lazy singleton keyed by
  * connector name) so the cluster-wide rate is `permitsPerSec × executors`
  * — size the budget accordingly, or keep rate-limited fetch driver-side as
  * the page loops here do.
  */
object RateLimiter {
  private val perJvm = new scala.collection.concurrent.TrieMap[(String, Double, Int), RateLimiter]()

  /** The per-JVM singleton limiter for a (connector, rate, burst) budget —
    * ANY copy of a connector definition (driver original, deserialized task
    * closure, DSv2 partition reader) resolves the SAME instance, so every
    * task in the JVM draws from one shared budget. Cluster-wide rate =
    * permitsPerSec × executors; size the budget accordingly.
    */
  def forKey(key: String, permitsPerSec: Double, burst: Int): RateLimiter =
    perJvm.getOrElseUpdate((key, permitsPerSec, burst), new RateLimiter(permitsPerSec, burst))

  /** One SHARE of a cluster-wide budget (SURVEY §7 hard part b): the driver
    * plans `nShares` read partitions and stamps each with its index; every
    * share paces at `permitsPerSec / nShares`, so the AGGREGATE across all
    * shares — wherever Spark schedules them, one executor or a thousand —
    * never exceeds the configured connector budget. This replaces the
    * per-JVM-singleton model's `rate × executors` cluster aggregate with a
    * true cluster-wide bound, at the cost of under-using the budget when
    * some partitions finish early (the standard static-split tradeoff; a
    * grant-lease coordinator could reclaim idle shares but needs an RPC
    * channel Spark doesn't give user code portably). Keyed per share, so a
    * share's retries contend on its own slice while sibling partitions
    * co-resident in the same JVM keep their own — the split is what
    * enforces the bound, not JVM-level sharing. Burst headroom splits too,
    * floored at 1 token so every share can make progress — aggregate
    * instantaneous burst is therefore max(burst, nShares) while the
    * SUSTAINED aggregate stays exactly `permitsPerSec`.
    */
  def forShare(key: String, permitsPerSec: Double, burst: Int,
      shareIndex: Int, nShares: Int): RateLimiter = {
    require(nShares >= 1 && shareIndex >= 0 && shareIndex < nShares)
    perJvm.getOrElseUpdate((s"$key#$shareIndex/$nShares", permitsPerSec, burst),
      new RateLimiter(permitsPerSec / nShares, math.max(1, burst / nShares)))
  }
}

final class RateLimiter(
    permitsPerSec: Double,
    burst: Int = 1,
    nanoClock: () => Long = System.nanoTime) {
  require(permitsPerSec > 0 && burst >= 1)
  private val intervalNanos = (1e9 / permitsPerSec).toLong
  private var nextFree = nanoClock() - (burst - 1) * intervalNanos

  /** Nanoseconds the caller must wait before proceeding (0 inside burst
    * headroom). Separated from sleeping for testability.
    */
  def acquireWaitNanos(): Long = synchronized {
    val now = nanoClock()
    val wait = math.max(0L, nextFree - now)
    nextFree = math.max(nextFree, now - (burst - 1) * intervalNanos) + intervalNanos
    wait
  }
}

/** Client wrapper pacing requests through a (shared) [[RateLimiter]]. */
final class RateLimitedClient(
    inner: HttpClient,
    val limiter: RateLimiter,
    sleep: Long => Unit = ns => Thread.sleep(ns / 1000000L, (ns % 1000000L).toInt)) extends HttpClient {
  override def get(req: HttpRequest): HttpResponse = {
    val wait = limiter.acquireWaitNanos()
    if (wait > 0) sleep(wait)
    inner.get(req)
  }
}

/** A pagination strategy decides the next request from the last response. */
trait Pagination {
  def first(base: HttpRequest): HttpRequest = base
  def next(base: HttpRequest, last: HttpResponse): Option[HttpRequest]
}

object Pagination {

  /** Follow a body field containing the absolute next URL (pokeapi `next`,
    * OData `@odata.nextLink`).
    */
  final case class NextUrl(field: String*) extends Pagination {
    override def next(base: HttpRequest, last: HttpResponse): Option[HttpRequest] = {
      val n = field.foldLeft(last.json)((j, f) => if (j == null) null else j.get(f))
      Option(n).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
        .map(u => HttpRequest(u, Nil, base.headers))
    }
  }

  /** RFC-5988 Link header, rel="next" (reference `ParseNext`,
    * `integrations/shopify/shopify.go:75-84`).
    */
  final case class LinkHeader() extends Pagination {
    override def next(base: HttpRequest, last: HttpResponse): Option[HttpRequest] =
      last.header("Link").flatMap(parseNext)
        .map(u => HttpRequest(u, Nil, base.headers))

    /** Parse `<url1>; rel="prev", <url2>; rel="next"` → url2. */
    def parseNext(link: String): Option[String] =
      link.split(',').iterator.map(_.trim).collectFirst {
        case part if part.contains("rel=\"next\"") && part.startsWith("<") && part.contains(">") =>
          part.substring(1, part.indexOf('>'))
      }
  }

  /** Continuation token in a body field, re-sent as a query param until the
    * sentinel (klaviyo: `marker` until 0/absent).
    */
  final case class Marker(bodyField: String, param: String) extends Pagination {
    override def next(base: HttpRequest, last: HttpResponse): Option[HttpRequest] = {
      val m = last.json.get(bodyField)
      Option(m).filterNot(_.isNull).map(_.asText).filter(v => v.nonEmpty && v != "0")
        .map(v => base.withParam(param, v))
    }
  }

  /** Offset/limit: advance `start` by `num` until a short page (sitoo,
    * `sitoo.go:56-62`). `recordsPath` locates the page array for the
    * short-page test.
    */
  final case class Offset(startParam: String, numParam: String, num: Int, recordsPath: Seq[String])
      extends Pagination {
    override def first(base: HttpRequest): HttpRequest =
      base.withParam(startParam, "0").withParam(numParam, num.toString)
    override def next(base: HttpRequest, last: HttpResponse): Option[HttpRequest] = {
      val page = PathDescent.array(last.json, recordsPath)
      if (page.size < num) None
      else {
        val lastStart = base.params.collectFirst { case (`startParam`, v) => v.toInt }.getOrElse(0)
        Some(base.withParam(startParam, (lastStart + num).toString))
      }
    }
  }
}

/** Descend `keys...` to the records array (reference `EmitBatch`,
  * `proto.go:283-293`: `resp.GetArray(keys...)`).
  */
object PathDescent {
  def array(root: JsonNode, path: Seq[String]): Vector[JsonNode] = {
    val n = path.foldLeft(root)((j, k) => if (j == null) null else j.get(k))
    if (n == null || !n.isArray) Vector.empty
    else (0 until n.size()).iterator.map(n.get).toVector
  }
}

/** One paginated HTTP stream: base request builder + pagination + records
  * path. `fetch` runs the page loop and yields raw record JSON strings —
  * the engine turns them into a DataFrame with the stream's declared schema
  * (`spark.read.schema(...).json(ds)`).
  */
final case class PaginatedStream(
    base: HttpRequest,
    pagination: Pagination,
    recordsPath: Seq[String],
    maxPages: Int = Int.MaxValue) {

  def fetch(client: HttpClient): Iterator[String] = new Iterator[String] {
    private var req: Option[HttpRequest] = Some(pagination.first(base))
    private var pages = 0
    private var buf: Iterator[String] = Iterator.empty

    private def advance(): Unit =
      while (!buf.hasNext && req.isDefined && pages < maxPages) {
        val r = req.get
        val resp = client.get(r)
        pages += 1
        buf = PathDescent.array(resp.json, recordsPath).iterator.map(Json.write)
        req = pagination.next(r, resp)
      }

    override def hasNext: Boolean = { advance(); buf.hasNext }
    override def next(): String = { advance(); buf.next() }
  }
}
