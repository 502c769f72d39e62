package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.CosineTopK

class CosineTopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("custom operator matches the built-in broadcast+window composition") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val builtin = Similarity.bruteForceTopK(e, "vec_id", "embedding", col("vec_id") < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val native = CosineTopK.topK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(native === builtin)
    assert(native.size === 100)
  }

  test("physical plan uses the custom exec with a broadcast query side") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = CosineTopK.topK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopKPartial"), s"custom exec missing from:\n$plan")
    assert(plan.contains("BroadcastExchange"), "query side should be broadcast")
  }

  test("partial emission bound: k rows per query per partition before the rank") {
    val spark2 = spark
    import spark2.implicits._
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .repartition(4)
    CosineTopK.ensureRegistered(spark)
    val partial = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      graft.plans.CosineTopKPartial(
        org.apache.spark.sql.graftbridge.Bridge.planOf(
          e.select(col("vec_id").as("id"), col("embedding").as("vec"))),
        org.apache.spark.sql.graftbridge.Bridge.planOf(
          e.filter(col("vec_id") < 7).select(col("vec_id").as("id"), col("embedding").as("vec"))),
        5))
    // ≤ queries × k × partitions rows ever cross to the rank stage
    assert(partial.count() <= 7L * 5L * 4L)
  }
}
