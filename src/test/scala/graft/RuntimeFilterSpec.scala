package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/**
 * Runtime (bloom) filter injection: Spark's InjectRuntimeFilter plants a
 * bloom-filter aggregate of the small filtered side into the big side's
 * scan, pruning shuffle input at RUN time — the built-in complement to our
 * static pushdown story. Default thresholds target 10 GB scans, so the
 * spec lowers them to demonstrate (and pin) the mechanism at test scale.
 */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a runtime bloom filter into the fact scan") {
    val dir = "/root/testdata/sf0.01"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // a broadcastable creation side SKIPS bloom injection (the broadcast
      // join prunes by itself) — disable auto-broadcast to model the
      // at-scale shape where both sides shuffle
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.load(spark, dir, "orders").filter(col("o_totalprice") > 400000)
      val joined = Tables.load(spark, dir, "lineitem")
        .join(orders.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"expected an injected bloom filter in:\n${optimized.take(2000)}")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
