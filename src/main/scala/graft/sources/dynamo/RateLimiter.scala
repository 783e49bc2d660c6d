package graft.sources.dynamo

/** Token-bucket rate limiter — the connector's stand-in for the
  * reference's Guava `RateLimiter` throttling reads/writes to a
  * `targetCapacity` fraction of provisioned throughput
  * [REF: connector/DynamoConnector.scala — rate limiter; SURVEY.md A3/A16].
  *
  * One instance lives inside each `PartitionReader`/`DataWriter` task,
  * budgeting `targetCapacity × capacityUnits / parallelism` units/sec —
  * no cross-task coordination, which is what lets 1000 concurrent
  * segments self-throttle without a central bottleneck.
  *
  * Permits are fractional capacity units (RCU/WCU). Burst capacity is
  * one second's worth, mirroring Guava's default.
  */
final class RateLimiter(permitsPerSec: Double) {
  require(permitsPerSec > 0, s"rate must be positive, got $permitsPerSec")

  private[this] var tokens: Double = permitsPerSec // 1s burst
  private[this] var lastNanos: Long = System.nanoTime()

  private def refill(): Unit = {
    val now = System.nanoTime()
    tokens = math.min(permitsPerSec, tokens + (now - lastNanos) / 1e9 * permitsPerSec)
    lastNanos = now
  }

  /** Deduct `permits`; if the bucket has gone negative, sleep until it
    * refills (post-paying like DynamoDB's consumed-capacity model: the
    * page is already fetched, the NEXT request waits).
    */
  def acquire(permits: Double): Unit = synchronized {
    refill()
    tokens -= permits
    if (tokens < 0) {
      val waitMillis = (-tokens / permitsPerSec * 1000.0).toLong
      if (waitMillis > 0) Thread.sleep(waitMillis)
      refill()
    }
  }
}
