package graft.sources

import scala.annotation.tailrec

/** Driver-side HTTP ingestion helper (SURVEY S1-S3).
  *
  * The reference fetches market metadata and candle pages from a REST API
  * with cursor pagination (200/page), a 5 req/s rate limit, and exponential
  * backoff on HTTP 429 (upbit_api_candle_info.py:35-89; upbit_data_pipeline.py:54-55,100-151).
  *
  * Design notes:
  *  - This is deliberately NOT a DataSourceV2: the reference's volumes
  *    (hundreds of keys, thousands of rows) never justify a distributed
  *    source; a driver loop feeding `spark.createDataFrame` is the honest
  *    plan. For true scale, callers parallelize with `mapPartitions` over a
  *    key DataFrame, reusing the same [[HttpClient]]/[[RetryPolicy]].
  *  - [[HttpClient]] is a trait so tests inject a stub; zero-egress
  *    environments never touch a socket.
  */
object HttpSource {

  trait HttpClient {
    /** Returns (statusCode, body). Implementations must be thread-safe when
      * used from mapPartitions. */
    def get(url: String): (Int, String)
  }

  /** min(base * 2^retry, cap) seconds — upbit_data_pipeline.py:54-55. */
  final case class RetryPolicy(maxRetries: Int = 5, baseDelaySec: Int = 60,
      capSec: Int = 3600) {
    def delaySec(retry: Int): Long =
      math.min(baseDelaySec.toLong << math.min(retry, 30), capSec.toLong)
  }

  /** Token-bucket pacing: at most `reqPerSec` calls per second. */
  final class RateLimiter(reqPerSec: Double, sleeper: Long => Unit = Thread.sleep) {
    private val minIntervalNanos = (1e9 / reqPerSec).toLong
    private var lastNanos = 0L
    def acquire(): Unit = synchronized {
      val now = System.nanoTime()
      val wait = lastNanos + minIntervalNanos - now
      if (wait > 0) sleeper(wait / 1000000)
      lastNanos = math.max(now, lastNanos + minIntervalNanos)
    }
  }

  /** GET with 429-backoff; non-429 failures return Left(status) so callers
    * can divert bad keys to a side channel instead of failing the job
    * (reference behavior: skip row, upbit_data_pipeline.py:145-147). */
  def getWithRetry(client: HttpClient, url: String,
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep): Either[Int, String] = {
    @tailrec def go(retry: Int): Either[Int, String] =
      client.get(url) match {
        case (200, body) => Right(body)
        case (429, _) if retry < policy.maxRetries =>
          sleeper(policy.delaySec(retry) * 1000)
          go(retry + 1)
        case (status, _) => Left(status)
      }
    go(0)
  }

  /** Cursor-paginate until a short page (< pageSize) — the reference's
    * termination rule (upbit_api_candle_info.py:86-87). `fetchPage` maps a
    * cursor to (rows, nextCursor). */
  def paginate[C, R](first: C, pageSize: Int, maxPages: Int = 10000)(
      fetchPage: C => (Seq[R], C)): Seq[R] = {
    val out = Seq.newBuilder[R]
    var cursor = first
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val (rows, next) = fetchPage(cursor)
      out ++= rows
      cursor = next
      pages += 1
      done = rows.size < pageSize
    }
    out.result()
  }
}
