package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some("a"), 10.0, "OK"),
    (2L, Some("b"), 20.0, "OK"),
    (3L, None, 30.0, "BAD"),
    (4L, Some("d"), 999.0, "OK"),
    (4L, Some("e"), 40.0, "OK") // duplicate key
  ).toDF("id", "opt", "amount", "status")

  test("report computes completeness/distinctness/bounds/in_set fractions") {
    val rep = DataQuality.report(t, Seq(
        Completeness("opt", minFraction = 0.9),
        Distinctness("id"),
        Bounds("amount", 0.0, 100.0, minFraction = 0.8),
        InSet("status", Seq("OK"), minFraction = 0.7)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("completeness(opt)") === ((0.8, false)))
    assert(rep("distinctness(id)") === ((0.8, false)))
    assert(rep("bounds(amount)") === ((0.8, true)))
    assert(rep("in_set(status)") === ((0.8, true)))
  }

  test("report is a single aggregation pass (one row before unpivot)") {
    // the explode runs over the agg's single output row, so the plan has
    // exactly one Aggregate chain and no join/window
    val rep = DataQuality.report(t, Seq(Completeness("opt"), Bounds("amount", 0, 50)))
    val plan = rep.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in report plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in report plan:\n$plan")
  }

  test("uniqueness counts exactly-once values; nulls and dups violate") {
    // values: 1 (once), 2 (twice), null (once) -> unique rows = 1 of 4
    val df = Seq(Some(1L), Some(2L), Some(2L), None).toDF("v")
    val row = DataQuality.uniqueness(df, "v", minFraction = 0.5).collect().head
    assert(row.getString(0) === "uniqueness(v)")
    assert(row.getDouble(1) === 0.25)
    assert(row.getBoolean(2) === false)
    // a clean key column scores 1.0
    val clean = DataQuality.uniqueness(Seq(1L, 2L, 3L).toDF("v"), "v").collect().head
    assert(clean.getDouble(1) === 1.0 && clean.getBoolean(2))
  }

  test("refIntegrity counts unmatched and null FKs as violations") {
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val row = DataQuality.refIntegrity(fact, "fk", dim, "pk", minFraction = 0.9)
      .collect().head
    assert(row.getString(0) === "ref_integrity(fk)")
    assert(row.getDouble(1) === 0.5)
    assert(row.getBoolean(2) === false)
    // clean FK set passes
    val ok = DataQuality.refIntegrity(Seq(1L, 2L).toDF("fk"), "fk", dim, "pk")
      .collect().head
    assert(ok.getDouble(1) === 1.0 && ok.getBoolean(2))
  }

  test("refIntegrity is robust to duplicate dimension keys") {
    val dim = Seq(1L, 1L, 2L).toDF("pk") // dup pk must not double-count matches
    val fact = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val row = DataQuality.refIntegrity(fact, "fk", dim, "pk").collect().head
    assert(row.getDouble(1) === 0.75)
  }

  test("empty check list is rejected loudly") {
    intercept[IllegalArgumentException] {
      DataQuality.report(t, Seq.empty)
    }
  }
}
