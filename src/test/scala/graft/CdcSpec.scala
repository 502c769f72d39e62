package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, change_id, op, value) — change_id is the total order
  private def changelog(rows: (String, Long, String, Double)*) =
    rows.toDF("k", "cid", "op", "v")

  private def apply(df: org.apache.spark.sql.DataFrame) =
    Cdc.applyChangelog(df, col("k"), "k",
      ordCols = Seq(col("cid")),
      payloadCols = Seq(col("cid") -> "last_cid", col("v") -> "last_v"),
      deletePred = col("op") === "D")

  test("latest version per key wins; tombstones erase; later upserts resurrect") {
    val out = apply(changelog(
      ("a", 1, "U", 1.0), ("a", 3, "U", 3.0), ("a", 2, "U", 2.0), // a → cid 3
      ("b", 1, "U", 1.0), ("b", 2, "D", 0.0),                     // b deleted
      ("c", 1, "D", 0.0), ("c", 2, "U", 9.0)                      // c resurrected
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map("a" -> (3L, 3.0), "c" -> (2L, 9.0)))
  }

  test("apply is idempotent and prefix-consistent (replay-safe)") {
    val full = changelog(
      ("a", 1, "U", 1.0), ("a", 2, "U", 2.0), ("b", 1, "U", 5.0), ("b", 2, "D", 0.0))
    val once = apply(full).collect().toSet
    // re-applying the snapshot's own changelog (same rows again) changes nothing
    val replayed = apply(full.union(full)).collect().toSet
    assert(replayed === once)
    // a prefix of the log yields the snapshot as of that point
    val prefix = apply(full.filter(col("cid") <= 1))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(prefix === Map("a" -> 1.0, "b" -> 5.0))
  }

  test("latest-per-key is a partial-aggregatable max_by, not a window funnel") {
    val p = apply(changelog(("a", 1, "U", 1.0)))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("partial_max_by"),
      "hot keys must collapse map-side before the exchange: " + p.take(400))
    assert(!p.contains("Window"), "no row_number window over the key")
  }

  test("a hot key (100k versions of one entity) stays bounded and correct") {
    val hot = spark.range(100000).select(
      lit("hot").as("k"), col("id").as("cid"),
      when(col("id") === 99999, "D").otherwise("U").as("op"),
      col("id").cast("double").as("v"))
    // last version is a delete → empty snapshot
    assert(apply(hot).count() === 0)
    // one earlier cold key survives alongside
    val out = apply(hot.union(changelog(("cold", 1, "U", 7.0))))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out === Map("cold" -> 7.0))
  }
}
