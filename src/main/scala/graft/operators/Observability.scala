package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Zero-extra-pass pipeline accounting via Spark's observed metrics
 * (`Dataset.observe` → `CollectMetrics`): the declared aggregates ride the
 * job that materializes the frame as ACCUMULATORS — no second scan, no
 * extra shuffle, no cache. This is how a 100 TB ingest reports "rows seen /
 * null keys / token volume this run" for free, where a separate
 * `df.agg(...)` accounting query would re-read the entire input.
 *
 * Only deterministic aggregate expressions are legal inside `observe`
 * (Spark enforces this — accumulators may double-count retried tasks for
 * non-deterministic exprs); everything here sticks to count/count_if/sum.
 *
 * Batch: pass an `Observation`, run any action, read `observation.get`.
 * Streaming: metrics surface per micro-batch on
 * `StreamingQueryProgress.observedMetrics` — [[lastProgressMetrics]] pulls
 * them off a running query by name.
 */
object Observability {

  /** The standard ingest-accounting metric set over a (key, weight) pair:
   * row count, null-key count (completeness violations riding along), and
   * the weight sum (e.g. token volume). */
  def ingestMetrics(keyCol: Column, weightCol: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    count_if(keyCol.isNull).as("null_keys"),
    coalesce(sum(weightCol.cast("double")), lit(0.0)).as("weight_sum"))

  /** Batch accounting: metrics materialize with the caller's own action
   * (`observation.get` blocks until one ran). */
  def observeBatch(df: DataFrame, observation: Observation, keyCol: Column,
      weightCol: Column): DataFrame = {
    val ms = ingestMetrics(keyCol, weightCol)
    df.observe(observation, ms.head, ms.tail: _*)
  }

  /** Streaming accounting: named observation, one metrics row per
   * micro-batch on the query's progress events. */
  def observeStream(df: DataFrame, name: String, keyCol: Column,
      weightCol: Column): DataFrame = {
    val ms = ingestMetrics(keyCol, weightCol)
    df.observe(name, ms.head, ms.tail: _*)
  }

  /** The named observation's metrics from the query's LAST progress, as
   * (metricName → value); empty until a batch with data ran. */
  def lastProgressMetrics(q: StreamingQuery, name: String): Map[String, Any] =
    Option(q.lastProgress)
      .flatMap(p => Option(p.observedMetrics.get(name)))
      .map { row =>
        row.schema.fieldNames.zipWithIndex
          .map { case (f, i) => f -> row.get(i) }.toMap
      }
      .getOrElse(Map.empty)
}
