package graft.streaming

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** S13's CLIENT half (SURVEY §2.1; VERDICT r17, Next round #4): the
  * reference's weather-enrichment ingestion loop
  * (scripts/enrich_weather.py:69-121,170-183) — bounded retry with
  * exponential backoff on transient failures, PROACTIVE rate-limit
  * pacing (sleep out the window remainder when the request budget is
  * spent, before the server has to say 429), and a PER-RESPONSE
  * checkpoint so a crash or rate-limit abort resumes exactly where it
  * stopped, never re-fetching a completed request and never losing a
  * fetched response.
  *
  * Division of labor with the engine: this client only lands each
  * response as one ATOMIC file in a staging directory (temp + rename,
  * so a killed write can never leave a half-file for the stream source
  * to read) and appends the request id to a progress log AFTER the
  * rename. [[Streams.ingestAvailableNow]] then moves the staged files
  * into the engine exactly once through its own Structured Streaming
  * checkpoint. Two independent idempotence layers, like the reference's
  * requests-cache + progress-log pair: a request is re-FETCHED only if
  * the client died between rename and log append (at-most-one-request
  * overlap), and even then the re-fetch atomically REPLACES the same
  * staging file, so the downstream stream still sees exactly one copy.
  *
  * Everything time-shaped is injectable (`sleep`, `nowMs`) so the spec
  * exercises hour-scale pacing without wall-clock sleeps, and `fetch`
  * is injectable so fixtures can fail deterministically — the default
  * is a plain JDK HttpURLConnection GET (no SDK, matching the
  * container's zero-egress test setup against a local fixture server).
  */
object IngestClient {

  /** One ingestion unit: `id` names the staging file and the progress-log
    * entry (must be filename-safe and unique); `url` is what's fetched.
    */
  final case class Request(id: String, url: String)

  /** Proactive pacing budget: at most `maxRequests` HTTP ATTEMPTS
    * (retries included — the server's counter sees every one) per
    * rolling `windowMs` window (the reference's 4500/hour + 9500/day
    * counters, enrich_weather.py:83-93). When the budget is spent the
    * client sleeps out the window REMAINDER — it never lets the server
    * refuse first.
    */
  final case class RateLimit(maxRequests: Int, windowMs: Long) {
    require(maxRequests >= 1 && windowMs >= 1, s"bad rate limit $this")
  }

  /** Server-signalled rate limit (HTTP 429). `retryAfterMs`, when the
    * server sent Retry-After, REPLACES the exponential backoff for that
    * attempt — the server knows its own window better than our guess
    * (the reference's "Minutely/Hourly/Daily" sleep tiers,
    * enrich_weather.py:101-115).
    */
  final class RateLimitedException(msg: String, val retryAfterMs: Option[Long])
    extends IOException(msg)

  /** Non-retryable failure (HTTP 4xx other than 429): retrying a
    * malformed request five times is five wasted calls, and the
    * reference likewise re-raises anything that isn't a rate-limit
    * message (enrich_weather.py:116-118).
    */
  final class FatalFetchException(msg: String) extends IOException(msg)

  final case class FetchReport(fetched: Int, skipped: Int, retries: Int,
    rateLimitSleeps: Int)

  /** Default fetch: JDK GET. 200 → body bytes; 429 → retryable
    * [[RateLimitedException]] honoring Retry-After (seconds, per RFC);
    * 5xx → retryable IOException; any other status → fatal.
    */
  def httpGet(url: String, connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Array[Byte] = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      val code = conn.getResponseCode
      if (code == 200) {
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      } else if (code == 429) {
        val ra = Option(conn.getHeaderField("Retry-After"))
          .flatMap(s => scala.util.Try(s.trim.toLong * 1000L).toOption)
        throw new RateLimitedException(s"429 from $url", ra)
      } else if (code >= 500) {
        throw new IOException(s"$code from $url")
      } else {
        throw new FatalFetchException(s"$code from $url")
      }
    } finally conn.disconnect()
  }

  /** Fetch every request not already in the progress log, staging each
    * response as `stagingDir/<id><suffix>`. Throws after `maxAttempts`
    * consecutive failures of ONE request (completed work stays
    * checkpointed — rerun with the same `progressLog` to resume), or
    * immediately on [[FatalFetchException]].
    *
    * Backoff: attempt k sleeps `initialBackoffMs · 2^(k-1)` unless the
    * failure carried a server Retry-After, which wins. maxAttempts
    * counts ATTEMPTS (the reference's retry ×5), so 4 sleeps at most.
    */
  def fetchAll(
      requests: Seq[Request],
      stagingDir: String,
      progressLog: String,
      fetch: String => Array[Byte] = httpGet(_),
      maxAttempts: Int = 5,
      initialBackoffMs: Long = 1000L,
      rateLimit: Option[RateLimit] = None,
      suffix: String = ".csv",
      sleep: Long => Unit = Thread.sleep,
      nowMs: () => Long = () => System.currentTimeMillis()): FetchReport = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val dup = requests.groupBy(_.id).collect { case (id, rs) if rs.size > 1 => id }
    require(dup.isEmpty, s"duplicate request ids: ${dup.take(3).mkString(", ")}")
    val staging = Paths.get(stagingDir)
    Files.createDirectories(staging)
    val logPath = Paths.get(progressLog)
    if (logPath.getParent != null) Files.createDirectories(logPath.getParent)
    val done: scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty[String] ++ (
        if (Files.exists(logPath))
          scala.jdk.CollectionConverters.ListHasAsScala(
            Files.readAllLines(logPath, StandardCharsets.UTF_8)).asScala
            .map(_.trim).filter(_.nonEmpty)
        else Nil)

    var fetched = 0
    var retries = 0
    var rlSleeps = 0
    // Rolling window state for proactive pacing. The budget is consumed
    // per ATTEMPT, not per successful request — a request that fails 4×
    // before succeeding issued 5 real HTTP calls, and the server's
    // counter (the reference's 4500/h, enrich_weather.py:83-93) counts
    // every one of them. The window itself is time-based and rolls over
    // on the clock like the reference's elapsed_hour reset, so a long
    // server-mandated Retry-After sleep naturally lands the next attempt
    // in a fresh window.
    var windowStart = nowMs()
    var windowCount = 0
    val paceAttempt: () => Unit = () => rateLimit.foreach { rl =>
      val now = nowMs()
      if (now - windowStart >= rl.windowMs) {
        windowStart = now; windowCount = 0
      } else if (windowCount >= rl.maxRequests) {
        sleep(rl.windowMs - (now - windowStart))
        windowStart = nowMs(); windowCount = 0
        rlSleeps += 1
      }
      windowCount += 1
    }

    requests.foreach { req =>
      if (!done.contains(req.id)) {
        val body = fetchWithRetry(req, fetch, maxAttempts, initialBackoffMs,
          sleep, onRetry = () => retries += 1, beforeAttempt = paceAttempt)
        // atomic stage: temp in the SAME directory (rename is only
        // atomic within a filesystem), then move over the final name —
        // replacing any half-completed earlier fetch of the same id
        val finalPath = staging.resolve(req.id + suffix)
        val tmp = Files.createTempFile(staging, s".${req.id}.", ".tmp")
        try {
          Files.write(tmp, body)
          Files.move(tmp, finalPath, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        } finally Files.deleteIfExists(tmp)
        // checkpoint AFTER the data is durably named: a crash between
        // the two re-fetches this one id, never skips it
        Files.write(logPath, (req.id + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        done += req.id
        fetched += 1
      }
    }
    FetchReport(fetched, requests.size - fetched, retries, rlSleeps)
  }

  private def fetchWithRetry(req: Request, fetch: String => Array[Byte],
      maxAttempts: Int, initialBackoffMs: Long, sleep: Long => Unit,
      onRetry: () => Unit, beforeAttempt: () => Unit = () => ()): Array[Byte] = {
    var attempt = 1
    while (true) {
      try {
        beforeAttempt()
        return fetch(req.url)
      } catch {
        case e: FatalFetchException => throw e
        case e: IOException =>
          if (attempt >= maxAttempts)
            throw new IOException(
              s"request ${req.id} failed after $maxAttempts attempts: ${e.getMessage}", e)
          val backoff = e match {
            case rl: RateLimitedException if rl.retryAfterMs.isDefined =>
              rl.retryAfterMs.get
            case _ => initialBackoffMs << (attempt - 1)
          }
          onRetry()
          sleep(backoff)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
