package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: match fact rows whose scalar falls inside a dim
 * row's [lo, hi) interval. Spark's own planner turns an inequality-only join
 * into a nested-loop — fine when the interval side broadcasts, quadratic
 * when it doesn't. Two shapes:
 *
 *   - [[broadcastRange]]: the direct BETWEEN join for small interval tables
 *     (broadcast nested loop; per-row cost ∝ #intervals).
 *   - [[bucketedRange]]: the scale path — both sides are keyed by coarse
 *     buckets of width `bucketWidth` (intervals explode into every bucket
 *     they overlap via `sequence`), the join becomes an EQUI-join on the
 *     bucket key (shuffle-hash/sort-merge capable, AQE-skew-splittable),
 *     and the exact [lo, hi) predicate filters the bucket-collision
 *     candidates. Shuffle ∝ facts + intervals×(span/bucketWidth) — never
 *     facts × intervals. The standard trick for interval joins at 100 TB
 *     (pick bucketWidth ≈ median interval span so each interval explodes
 *     into O(1) buckets).
 */
object RangeJoin {

  def broadcastRange(fact: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    fact.join(broadcast(intervals),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /**
   * Interval × interval OVERLAP join (half-open: `[aLo, aHi) ∩ [bLo, bHi)
   * ≠ ∅` ⇔ `aLo < bHi && bLo < aHi`) — sessions × campaign windows,
   * maintenance windows × incident spans. Same bucket decomposition as
   * [[bucketedRange]] on BOTH sides, with the classic spatial-join dedup:
   * a pair sharing several buckets is emitted only in the bucket of
   * `max(aLo, bLo)` — the first bucket the two intervals genuinely share
   * (floor is monotone, and each side's explode covers its own endpoints)
   * — so no post-join `distinct` shuffle is needed at all. Shuffle ∝
   * Σ spans/bucketWidth on each side, never |A| × |B|.
   */
  def bucketedOverlap(a: DataFrame, aLoCol: String, aHiCol: String,
      b: DataFrame, bLoCol: String, bHiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketedOverlap: bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    def keyed(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bucket",
        explode(sequence(bucketOf(col(lo)),
          greatest(bucketOf(col(hi)), bucketOf(col(lo))))))
    keyed(a, aLoCol, aHiCol).join(keyed(b, bLoCol, bHiCol), Seq("__bucket"))
      .filter(col(aLoCol) < col(bHiCol) && col(bLoCol) < col(aHiCol))
      .filter(col("__bucket") ===
        greatest(bucketOf(col(aLoCol)), bucketOf(col(bLoCol))))
      .drop("__bucket")
  }

  def bucketedRange(fact: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    // hi is exclusive: an interval [lo, hi) overlaps buckets
    // floor(lo/w) .. floor(hi/w). When hi lands exactly on a bucket edge the
    // last bucket holds no true matches, but trimming it is only safe when
    // bucketWidth divides hi EXACTLY in doubles — under rounding, a fact one
    // ulp below hi can share floor(x/w) with hi and the trim would silently
    // drop a true pair. The exact [lo, hi) filter below already removes every
    // false candidate, so always explode through floor(hi/w): one spurious
    // candidate bucket per edge-aligned interval at worst, never a miss.
    val keyedIntervals = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)),
        greatest(bucketOf(col(hiCol)), bucketOf(col(loCol))))))
    fact.withColumn("__bucket", bucketOf(col(valueCol)))
      .join(keyedIntervals, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
