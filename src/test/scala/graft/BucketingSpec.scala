package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Count shuffle exchanges in the FINAL plan: AQE hides the real plan
   * inside AdaptiveSparkPlanExec (a leaf to `collect`), so execute first and
   * scan the finalized plan string. */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("co-located bucketed join and aggregation plan with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    try {
      Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "okey"),
        "b_orders", "okey", buckets = 4)
      Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "okey"),
        "b_lineitem", "okey", buckets = 4)
      val bo = Bucketing.table(spark, "b_orders")
      val bl = Bucketing.table(spark, "b_lineitem")

      // the unbucketed join shuffles both sides; the bucketed one, neither
      val joined = bl.join(bo, "okey")
        .groupBy(col("okey")).agg(sum(col("l_quantity")).as("qty"))
      assert(joined.count() > 0)
      assert(shuffles(joined) === 0,
        s"bucketed join+agg should be shuffle-free:\n${joined.queryExecution.executedPlan}")

      val unbucketed = lineitem.join(
          orders.withColumnRenamed("o_orderkey", "l_orderkey").hint("merge"), "l_orderkey")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty"))
      assert(shuffles(unbucketed) > 0, "sanity: the raw join does shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
