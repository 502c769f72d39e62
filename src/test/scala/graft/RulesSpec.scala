package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RulesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark // rule registered by TestSpark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", "x"), ("a", "y"), ("a", "x"), ("b", "x"), ("b", null)
  ).toDF("k", "v")

  test("size(collect_set) rewrites to count(distinct): plan leaves ObjectHashAggregate") {
    val q = df.groupBy($"k").agg(size(collect_set($"v")).as("n"))
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("ObjectHashAggregate"),
      s"rewrite should avoid the object hash aggregate:\n$phys")
    assert(!phys.contains("collect_set"), "collect_set should be gone from the plan")
    // null is not collected and not counted — identical semantics
    val got = q.collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got === Map("a" -> 2, "b" -> 1))
  }

  test("a sibling projection of the raw set is preserved") {
    val q = df.groupBy($"k")
      .agg(size(collect_set($"v")).as("n"), sort_array(collect_set($"v")).as("set"))
    val row = q.filter($"k" === "a").collect()(0)
    assert(row.getAs[Int]("n") === 2)
    assert(row.getAs[Seq[String]]("set") === Seq("x", "y"))
  }

  test("streaming aggregates are not rewritten (distinct agg is unsupported there)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, String)](spark)
    val agg = input.toDF().toDF("k", "v")
      .groupBy($"k").agg(size(collect_set($"v")).as("n"))
    val q = agg.writeStream.format("memory").queryName("rules_stream")
      .outputMode("complete").start()
    try {
      input.addData(("a", "x"), ("a", "y"), ("a", "x"))
      q.processAllAvailable() // would throw if rewritten to count(distinct)
      val got = spark.table("rules_stream").collect().map(r => (r.getString(0), r.getInt(1)))
      assert(got.toSeq === Seq(("a", 2)))
    } finally q.stop()
  }

  test("mixed-distinct aggregates are left alone (no second distinct group introduced)") {
    val df3 = Seq(("a", "x", 1), ("a", "y", 1), ("a", "x", 2), ("b", "x", 3)).toDF("k", "v", "u")
    // a distinct on ANOTHER column: rewriting would create a second
    // unexpanded distinct group after RewriteDistinctAggregates already ran
    // (extraOptimizations registration) and crash the planner — must skip
    val mixed = df3.groupBy($"k")
      .agg(size(collect_set($"v")).as("n"), countDistinct($"u").as("d"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(mixed === Set(("a", 2, 2L), ("b", 1, 1L)))
    // two set-sizes over DIFFERENT columns: same reason, must skip and stay correct
    val two = df3.groupBy($"k")
      .agg(size(collect_set($"v")).as("nv"), size(collect_set($"u".cast("string"))).as("nu"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(two === Set(("a", 2, 2), ("b", 1, 1)))
    // same column twice IS rewritten (one distinct group)
    val same = df3.groupBy($"k")
      .agg(size(collect_set($"v")).as("n1"), size(collect_set($"v")).as("n2"))
    assert(!same.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
    assert(same.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet ===
      Set(("a", 2, 2), ("b", 1, 1)))
  }

  test("flagship sliding aggregate plans codegen'd under the rule, results unchanged") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("a3_windowed_agg")(spark, dir)
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("ObjectHashAggregate"), "exact-distinct agg should be hash/codegen")
    assert(q.count() > 0)
  }
}
