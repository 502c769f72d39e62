package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DataQuality

/**
 * Continuous distribution-drift monitor: per micro-batch, the Jensen–
 * Shannon divergence of the batch's categorical mix against a
 * BATCH-TRAINED reference ([[DataQuality.categoryCounts]] over the
 * persisted corpus), written as one audit row per batch. The streaming
 * twin of `q_js_drift`, with the same arithmetic via
 * [[DataQuality.jsDivergenceCounts]] — a drifted upstream (a crawler
 * suddenly feeding one domain, a schema change collapsing a label) shows
 * up within one trigger interval instead of at the next corpus sweep.
 *
 * Shape per batch: one partial-aggregatable category count over the batch
 * (shuffle ≤ batch categories), a full-outer join against the bounded
 * reference counts, one scalar sum — never a corpus rescan. The reference
 * is materialized ONCE at wiring time (it is a collapsed ≤-categories
 * table; re-train and restart to move it, same contract as the
 * percentile quality gate).
 *
 * Output rows: (batch_id, n_rows, n_cats, jsd, drifted). Replayed batches
 * re-append their row (at-least-once, the repo's sink contract) —
 * downstream reads `max(batch_id)` or dedups on batch_id. JSD is rounded
 * at 6dp like the batch operator, so a replayed row is bit-identical to
 * the original.
 */
object StreamingDrift {

  /**
   * Numeric twin of [[startJsDriftMonitor]]: per micro-batch PSI against
   * the reference's equal-mass quantile buckets
   * ([[DataQuality.quantileBoundaries]] + [[DataQuality.psiFromCounts]],
   * the same arithmetic as `q_drift_psi`). Boundaries AND reference bucket
   * counts are bounded one-row/≤-nBuckets artifacts materialized once at
   * wiring; per batch the work is one map-side bucket projection and a
   * ≤-nBuckets count. Output rows: (batch_id, n_rows, psi, drifted) —
   * the standard gates read: < 0.1 stable, > 0.25 drifted.
   */
  def startPsiDriftMonitor(stream: DataFrame, reference: DataFrame,
      valueCol: String, threshold: Double, outDir: String,
      checkpoint: String, nBuckets: Int = 10): StreamingQuery = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val bnds = graft.Materialize(
      DataQuality.quantileBoundaries(reference, col(valueCol), nBuckets))
    val refCounts = graft.Materialize(
      DataQuality.bucketCounts(reference, col(valueCol), bnds, "n_ref"))
    val spark = reference.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // "no valid observations → emit nothing": an all-NULL-value batch
        // (exactly what an upstream schema break produces) must not append
        // a fabricated smoothing-only "stable" verdict
        val cur = DataQuality.bucketCounts(batch, col(valueCol), bnds, "n_cur")
        if (!cur.isEmpty) {
          val summary = DataQuality.psiFromCounts(refCounts, cur, nBuckets, spark)
            .agg((round(sum(col("contrib")), 6) + lit(0.0)).as("psi"),
              sum(col("n_cur")).as("n_rows"))
            .select(lit(id).as("batch_id"),
              coalesce(col("n_rows"), lit(0L)).as("n_rows"),
              col("psi"), (col("psi") > threshold).as("drifted"))
          summary.write.mode("append").parquet(outDir)
        }
      }
      .start()
  }

  def startJsDriftMonitor(stream: DataFrame, reference: DataFrame,
      catCol: String, threshold: Double, outDir: String,
      checkpoint: String): StreamingQuery = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val refCounts = graft.Materialize(
      DataQuality.categoryCounts(reference, col(catCol), "n_ref"))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // a batch with no valid categories (empty OR all-NULL column)
        // carries no distribution evidence — emit nothing rather than a
        // zero-observation verdict
        val cur = DataQuality.categoryCounts(batch, col(catCol), "n_cur")
        if (!cur.isEmpty) {
          val summary = DataQuality.jsDivergenceCounts(refCounts, cur)
            .agg(count(lit(1)).as("n_cats"),
              (round(sum(col("contrib")), 6) + lit(0.0)).as("jsd"),
              sum(col("n_cur")).as("n_rows"))
            .select(lit(id).as("batch_id"),
              coalesce(col("n_rows"), lit(0L)).as("n_rows"), col("n_cats"),
              col("jsd"), (col("jsd") > threshold).as("drifted"))
          summary.write.mode("append").parquet(outDir)
        }
      }
      .start()
  }
}
