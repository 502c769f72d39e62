package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Observability

class ObservabilitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("batch observe rides the caller's action — no extra job, right numbers") {
    import spark.implicits._
    val df = Seq((Some(1L), 10.0), (Some(2L), 20.0), (None, 5.0),
      (Some(4L), 0.0)).toDF("k", "w")
    val obs = Observation("ingest")
    val observed = Observability.observeBatch(df, obs, col("k"), col("w"))
    // the action that carries the metrics; nothing else runs
    assert(observed.filter(col("k").isNotNull).count() === 3L)
    val m = obs.get
    // metrics cover the FULL observed frame (pre-filter), not the action's
    // output — observe sits where it was attached in the plan
    assert(m("n_rows") === 4L)
    assert(m("null_keys") === 1L)
    assert(m("weight_sum") === 35.0)
  }

  test("streaming observe reports per-batch metrics on query progress") {
    import spark.implicits._
    val input = MemoryStream[(Long, Double)](spark)
    val observed = Observability.observeStream(
      input.toDF().toDF("k", "w"), "batch_ingest", col("k"), col("w"))
    val q = observed.writeStream.format("noop").outputMode("append").start()
    try {
      input.addData((1L, 1.5), (2L, 2.5), (3L, 6.0))
      q.processAllAvailable()
      val m = Observability.lastProgressMetrics(q, "batch_ingest")
      assert(m("n_rows") === 3L)
      assert(m("null_keys") === 0L)
      assert(m("weight_sum") === 10.0)
      // next batch replaces, not accumulates — per-batch accounting
      input.addData((4L, 1.0))
      q.processAllAvailable()
      val m2 = Observability.lastProgressMetrics(q, "batch_ingest")
      assert(m2("n_rows") === 1L && m2("weight_sum") === 1.0)
    } finally q.stop()
    // unknown name → empty, never a throw
    assert(Observability.lastProgressMetrics(q, "nope") === Map.empty)
  }
}
