package graft.sinks.v2

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/**
 * DSv2 custom metrics for graft-kv scans — the Spark-UI answer to "why did
 * this query read N segments?": planning-time pruning counters reported as
 * driver metrics ([[KvScan.reportDriverMetrics]]) and the merge-on-read
 * visibility counter (rows skipped by deletion vectors) as a task metric
 * summed across readers. Names show up on the BatchScan node in the SQL
 * tab and in `executedPlan` metrics, so pruning regressions are observable
 * in production, not just in specs.
 *
 * Each metric is a TOP-LEVEL zero-arg class: Spark re-instantiates them
 * reflectively in the UI listener to aggregate task values.
 */
class KvSegsTotalMetric extends CustomSumMetric {
  override def name(): String = KvMetrics.SegsTotal
  override def description(): String = "committed segments visible to the scan"
}
class KvSegsStatsPrunedMetric extends CustomSumMetric {
  override def name(): String = KvMetrics.SegsStatsPruned
  override def description(): String = "segments pruned by min/max stats"
}
class KvSegsBloomPrunedMetric extends CustomSumMetric {
  override def name(): String = KvMetrics.SegsBloomPruned
  override def description(): String = "segments pruned by bloom side files"
}
class KvSegsScannedMetric extends CustomSumMetric {
  override def name(): String = KvMetrics.SegsScanned
  override def description(): String = "segments actually scanned"
}
class KvRowsDvSkippedMetric extends CustomSumMetric {
  override def name(): String = KvMetrics.RowsDvSkipped
  override def description(): String = "rows skipped by deletion vectors"
}

private[v2] object KvMetrics {

  val SegsTotal = "kvSegmentsTotal"
  val SegsStatsPruned = "kvSegmentsStatsPruned"
  val SegsBloomPruned = "kvSegmentsBloomPruned"
  val SegsScanned = "kvSegmentsScanned"
  val RowsDvSkipped = "kvRowsDvSkipped"

  val supported: Array[CustomMetric] = Array(
    new KvSegsTotalMetric, new KvSegsStatsPrunedMetric,
    new KvSegsBloomPrunedMetric, new KvSegsScannedMetric,
    new KvRowsDvSkippedMetric)

  def value(n: String, v: Long): CustomTaskMetric = new CustomTaskMetric {
    override def name(): String = n
    override def value(): Long = v
  }
}
