package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scan observability: the DSv2 custom metrics on the BatchScan node must
 * tell the pruning story (total / stats-pruned / bloom-pruned / scanned)
 * and the merge-on-read story (rows skipped by deletion vectors) — the
 * production answer to "why did this query read N segments?".
 */
class KvMetricsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft_kvmetrics_").toString + "/store"

  private def metricsOf(df: DataFrame): Map[String, Long] = {
    df.collect()
    // SQLMetrics are accumulators: task updates merge on the driver at
    // task completion, before collect() returns — no listener wait needed
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
    scan.metrics.collect {
      case (name, m) if name.startsWith("kv") => name -> m.value
    }
  }

  test("driver metrics narrate pruning; task metric counts dv skips") {
    val p = tmp()
    // 4 epochs: two key ranges x two parities — stats prune the range,
    // blooms prune the parity, so both counters light up distinctly
    spark.range(0, 50).selectExpr("id * 2 as k", "'lo-even' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(0, 50).selectExpr("id * 2 + 1 as k", "'lo-odd' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(0, 50).selectExpr("1000 + id * 2 as k", "'hi-even' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(0, 50).selectExpr("1000 + id * 2 + 1 as k", "'hi-odd' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()

    // k = 40: the hi segments prune on stats, lo-odd prunes on bloom
    val m = metricsOf(KvStore.read(spark, p).filter(col("k") === 40L))
    assert(m(KvMetrics.SegsTotal) === 4L, m.toString)
    assert(m(KvMetrics.SegsStatsPruned) === 2L, m.toString)
    assert(m(KvMetrics.SegsBloomPruned) === 1L, m.toString)
    assert(m(KvMetrics.SegsScanned) === 1L, m.toString)
    assert(m(KvMetrics.RowsDvSkipped) === 0L, m.toString)

    // unfiltered scan: nothing prunes, nothing is skipped
    val all = metricsOf(KvStore.read(spark, p))
    assert(all(KvMetrics.SegsScanned) === 4L && all(KvMetrics.SegsTotal) === 4L)

    // k < 20 row-deletes 10 lo-even + 10 lo-odd rows -> the dv skip
    // counter reports exactly the 20 tombstoned ordinals
    KvCatalogTable.deleteRows(spark, p, KvStore.readSchema(conf = spark
      .sessionState.newHadoopConf(), p).get,
      Array(org.apache.spark.sql.sources.LessThan("k", 20L)), p)
    val afterDelete = metricsOf(KvStore.read(spark, p))
    assert(afterDelete(KvMetrics.RowsDvSkipped) === 20L, afterDelete.toString)
  }
}
