package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.sources.Tables

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val events = Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("rolled-up sketch estimate is within HLL error of the exact distinct") {
    val daily = Sketches.dailySketches(events, "ts", "user_id", Seq("event_type"))
    val est = Sketches.rollup(daily, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Sketches.exactDistinct(events, "user_id", Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      // lgK=12 → relative standard error ~1.6%; 5% is a >3σ bound
      assert(math.abs(e - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"$k: estimate $e vs exact $ex")
    }
  }

  test("sketch union is order/partitioning independent: rollup == direct sketch") {
    val daily = Sketches.dailySketches(events, "ts", "user_id", Seq("event_type"))
    val viaDaily = Sketches.rollup(daily, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("distinct_estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDaily === direct,
      "register-max union must make the merge order invisible")
    val repartitioned = Sketches.rollup(daily.repartition(13), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repartitioned === viaDaily)
  }

  test("persisted sketch table supports incremental append + re-merge") {
    val dir = java.nio.file.Files.createTempDirectory("sketches").toString + "/t"
    val firstHalf = events.filter(dayofmonth(col("ts")) <= 15)
    val secondHalf = events.filter(dayofmonth(col("ts")) > 15)
    Sketches.dailySketches(firstHalf, "ts", "user_id", Seq("event_type"))
      .write.mode("append").parquet(dir)
    Sketches.dailySketches(secondHalf, "ts", "user_id", Seq("event_type"))
      .write.mode("append").parquet(dir)
    val merged = Sketches.rollup(spark.read.parquet(dir), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.rollup(
        Sketches.dailySketches(events, "ts", "user_id", Seq("event_type")),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
  }

  test("sketch aggregation works in a streaming window: stream estimate == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val streamed = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("distinct_estimate"))
    val q = streamed.writeStream.format("memory").queryName("sketch_stream")
      .outputMode("update").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = (1L to 500L).map(i => (ts(i * 3), i % 97, if (i % 2 == 0) "click" else "view"))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedEst = spark.table("sketch_stream")
      .groupBy("event_type").agg(max(col("distinct_estimate")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEst = rows.toDF("ts", "user_id", "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .groupBy("event_type").agg(max(col("e")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedEst === batchEst)
  }
}
