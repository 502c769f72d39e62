package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val intervals = Seq(
    (0.0, 10.0, "a"),     // exactly one bucket at width 10
    (10.0, 30.0, "b"),    // spans two buckets
    (25.0, 26.0, "c"),    // overlaps interval b (facts can match both)
    (90.0, 100.0, "d")    // hi exactly on a bucket edge
  ).toDF("lo", "hi", "band")

  private lazy val facts = Seq(
    (1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 25.5),
    (5L, 29.999), (6L, 30.0), (7L, 95.0), (8L, 100.0), (9L, 250.0)
  ).toDF("fact_id", "x")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("fact_id", "band").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private val expected = Set(
    (1L, "a"), (2L, "a"),          // [0,10): 0.0 in, 9.999 in, 10.0 out
    (3L, "b"), (4L, "b"), (5L, "b"), // [10,30): 30.0 excluded
    (4L, "c"),                      // overlapping interval also matches
    (7L, "d"))                      // [90,100): 95 in, 100 out (hi exclusive)

  test("bucketed range join matches [lo, hi) semantics incl. edge cases") {
    assert(pairsOf(RangeJoin.bucketedRange(facts, "x", intervals, "lo", "hi", 10.0)) === expected)
  }

  test("bucketed equals broadcast for any bucket width") {
    val broad = pairsOf(RangeJoin.broadcastRange(facts, "x", intervals, "lo", "hi"))
    assert(broad === expected)
    for (w <- Seq(1.0, 7.0, 50.0, 1000.0)) {
      assert(pairsOf(RangeJoin.bucketedRange(facts, "x", intervals, "lo", "hi", w)) === broad,
        s"width $w")
    }
  }

  test("bucketed plan is an equi-join, not a nested loop") {
    val out = RangeJoin.bucketedRange(facts, "x", intervals, "lo", "hi", 10.0)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      s"range join must hash/merge on the bucket key, got:\n$physical")
  }

  private lazy val spansA = Seq(
    (1L, 0.0, 5.0),    // touches b20 at 5 — half-open, no overlap
    (2L, 4.0, 12.0),   // spans a bucket edge, overlaps b20 and b21
    (3L, 30.0, 31.0),  // inside b22
    (4L, 50.0, 60.0)   // overlaps nothing
  ).toDF("a_id", "a_lo", "a_hi")

  private lazy val spansB = Seq(
    (20L, 5.0, 10.0),
    (21L, 10.0, 20.0),
    (22L, 25.0, 40.0),
    (23L, 30.0, 31.0)  // identical to a3's span
  ).toDF("b_id", "b_lo", "b_hi")

  private def overlapPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("bucketedOverlap matches the naive inequality join, no duplicates") {
    val naive = overlapPairs(spansA.crossJoin(spansB)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")))
    assert(naive === Seq((2L, 20L), (2L, 21L), (3L, 22L), (3L, 23L)))
    for (w <- Seq(1.0, 3.0, 10.0, 1000.0)) {
      // Seq (not Set) equality: a pair sharing several buckets must be
      // emitted exactly once — the max(aLo,bLo)-bucket rule, not a distinct
      assert(overlapPairs(RangeJoin.bucketedOverlap(
        spansA, "a_lo", "a_hi", spansB, "b_lo", "b_hi", w)) === naive,
        s"width $w")
    }
  }

  test("bucketedOverlap plan is an equi-join on the bucket key") {
    val physical = RangeJoin.bucketedOverlap(
        spansA, "a_lo", "a_hi", spansB, "b_lo", "b_hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop") && !physical.contains("CartesianProduct"),
      physical)
  }

  test("empty intervals and empty facts yield empty results, not errors") {
    val noIntervals = intervals.filter(col("band") === "none")
    assert(RangeJoin.bucketedRange(facts, "x", noIntervals, "lo", "hi", 10.0).count() === 0)
    val noFacts = facts.filter(col("fact_id") === -1L)
    assert(RangeJoin.bucketedRange(noFacts, "x", intervals, "lo", "hi", 10.0).count() === 0)
  }
}
