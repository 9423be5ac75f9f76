package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Cluster-wide rate limiting via per-partition budget shares (VERDICT r6
  * #5, SURVEY §7 hard part b): N read partitions spread over any number of
  * executors must jointly honor the connector's requestsPerSec — the old
  * per-JVM singleton gave `rate × executors`.
  */
class RateLimiterShareSpec extends AnyFunSuite {

  /** Count the permits a limiter grants inside a simulated window, using a
    * manual clock — a granted permit is an acquire whose wait fits within
    * the window (the caller would sleep then proceed).
    */
  private def grantedIn(limiter: RateLimiter, clock: () => Long,
      advance: Long => Unit, windowNanos: Long): Int = {
    val start = clock()
    var granted = 0
    var done = false
    while (!done) {
      val wait = limiter.acquireWaitNanos()
      if (clock() + wait - start <= windowNanos) { advance(wait); granted += 1 }
      else done = true
    }
    granted
  }

  test("N simulated executors' shares aggregate to at most the configured budget") {
    val budget = 100.0 // permits/sec, burst 4 — the connector-configured rate
    val nShares = 8 // driver planned 8 partitions over (say) 8 executors
    val window = 2L * 1000 * 1000 * 1000 // 2 simulated seconds

    val total = (0 until nShares).map { i =>
      var now = 0L // each executor owns an independent clock + share
      val share = new RateLimiter(budget / nShares, burst = 1, nanoClock = () => now)
      grantedIn(share, () => now, d => now += d, window)
    }.sum

    val maxAllowed = budget * 2 + nShares // rate×window plus one burst token per share
    assert(total <= maxAllowed,
      s"aggregate $total grants in 2s exceeds cluster budget allowance $maxAllowed")
    assert(total >= budget * 2 * 0.9, s"aggregate $total implausibly low — shares misconfigured")
  }

  test("forShare splits rate and burst; shares are independent instances, retries share a slice") {
    val a = RateLimiter.forShare("conn-x", 64.0, burst = 4, shareIndex = 0, nShares = 8)
    val b = RateLimiter.forShare("conn-x", 64.0, burst = 4, shareIndex = 1, nShares = 8)
    val aAgain = RateLimiter.forShare("conn-x", 64.0, burst = 4, shareIndex = 0, nShares = 8)
    assert(a ne b, "distinct shares must not pool into one limiter")
    assert(a eq aAgain, "a share's retries/re-created readers must share its slice")
  }

  test("planned HTTP partitions carry their budget share") {
    import graft.sources.v2.HttpPartition
    val p = HttpPartition(0, 100, shareIndex = 2, nShares = 5)
    assert(p.shareIndex == 2 && p.nShares == 5)
    // default (sequential single-reader chain) is the whole budget
    val single = HttpPartition(0, -1)
    assert(single.shareIndex == 0 && single.nShares == 1)
  }
}
