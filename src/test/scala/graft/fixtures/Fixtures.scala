package graft.fixtures

import java.sql.Timestamp

import scala.util.Random

import graft.model.LogRecord

/**
 * Deterministic ports of the reference's fixture generators
 * (`src/test/scala/TestUtil.scala:19-56`) — same shapes, but seeded PRNG and a
 * fixed base time instead of `math.random` + `Instant.now()` (SURVEY.md §5).
 */
object Fixtures {

  /** Fixed anchor: 2026-01-01T00:00:00Z, in epoch seconds. */
  val baseEpochS: Long = 1767225600L

  private def ts(epochS: Long): Timestamp = Timestamp.from(java.time.Instant.ofEpochSecond(epochS))

  /** n actions evenly spread over `intervalS` seconds ending at base time,
   * 50/50 click/view (seeded) — `TestUtil.generateRequestsPerInterval`. */
  def requestsPerInterval(ip: String, n: Int, intervalS: Long = 600L, seed: Long = 42L): Seq[LogRecord] = {
    val rnd = new Random(seed ^ ip.hashCode.toLong)
    (0 until n).map { i =>
      val t = baseEpochS - intervalS + (i.toLong * intervalS / math.max(n, 1))
      val click = rnd.nextBoolean()
      LogRecord(ip, ts(t), if (click) 1L else 0L, if (click) 0L else 1L, "cat0")
    }
  }

  /** views = n/(ratio+1), clicks = n-views, single category —
   * `TestUtil.generateClicksToViewsPerInterval` (exact split), except clicks
   * and views are interleaved round-robin (ratio clicks then 1 view) rather
   * than the reference's two overlaid runs: the reference shape only avoids
   * click-only partial windows thanks to its seconds-as-millis bug
   * (`ImplStructured.scala:113`) compressing 600 s to 0.6 s; with correct
   * timestamps the interleaving keeps every window slice at the global ratio. */
  def clicksToViewsPerInterval(ip: String, n: Int, ratio: Int, intervalS: Long = 600L): Seq[LogRecord] = {
    (0 until n).map { i =>
      val t = baseEpochS - intervalS + (i.toLong * intervalS / math.max(n, 1))
      val isView = i % (ratio + 1) == ratio
      LogRecord(ip, ts(t), if (isView) 0L else 1L, if (isView) 1L else 0L, "cat0")
    }
  }

  /** n views round-robin over k categories — `TestUtil.generateCategoriesPerInterval`. */
  def categoriesPerInterval(ip: String, n: Int, k: Int, intervalS: Long = 600L): Seq[LogRecord] =
    (0 until n).map { i =>
      val t = baseEpochS - intervalS + (i.toLong * intervalS / math.max(n, 1))
      LogRecord(ip, ts(t), 0L, 1L, s"cat${i % k}")
    }
}
