package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Reproducible sampling for training-data pipelines. `df.sample()` /
 * TABLESAMPLE draw per-partition, so the selected ROWS change whenever file
 * splits, partition counts, or Spark versions do — useless for a sample
 * that must be re-derivable (held-out sets, eval slices, debugging cohorts).
 *
 * Hash sampling keys the decision on the ROW, not the partition: keep a row
 * iff the hex md5 of its key is below a threshold prefix. Fraction =
 * threshold/16^len (e.g. "28" → 0x28/0x100 ≈ 15.6%). Properties:
 *
 *   - deterministic across runs, partitionings, engines (md5 is the one
 *     hash DuckDB/Spark/everything computes identically — the repo's
 *     oracle-compare convention);
 *   - nested samples: a lower threshold's sample is a SUBSET of a higher
 *     one's (both are prefix cuts of the same hash order), so a 1% debug
 *     slice sits inside the 10% eval slice by construction;
 *   - map-side only — the filter pushes into the scan stage, no shuffle.
 */
object Sampling {

  private def hexKey(keyCol: Column): Column =
    md5(keyCol.cast("string").cast("binary"))

  /** Keep rows with md5(key) below the 2-hex-digit threshold prefix. */
  def hashSample(df: DataFrame, keyCol: Column, hexThreshold: String): DataFrame =
    df.filter(hexKey(keyCol) < lit(hexThreshold))

  /**
   * Deterministic balanced shard id in [0, nShards): the first two hex
   * digits of the row key's md5 (256 uniform buckets) scaled down to
   * nShards contiguous ranges. The write-side companion of [[hashSample]]
   * — training output lands in N reproducible, size-balanced shards that
   * are STABLE under repartitioning, engine version, and re-runs (unlike
   * `spark_partition_id` or round-robin), so a shard can be re-derived or
   * re-written in isolation. Map-side only; callers repartition by the
   * shard column to align file layout with shard identity.
   */
  def hashShard(df: DataFrame, keyCol: Column, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 256, s"nShards must be in [1,256], got $nShards")
    val bucket = conv(substring(hexKey(keyCol), 1, 2), 16, 10).cast("int")
    df.withColumn("shard", ((bucket * nShards) / 256).cast("int"))
  }

  /** Per-stratum thresholds (e.g. oversample rare classes): rows in a
   * stratum not listed fall back to `defaultThreshold`. */
  def stratifiedHashSample(df: DataFrame, keyCol: Column, strataCol: Column,
      thresholds: Map[String, String], defaultThreshold: String): DataFrame = {
    val thresholdCol = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (stratum, t)) => when(strataCol === stratum, lit(t)).otherwise(acc)
    }
    df.filter(hexKey(keyCol) < thresholdCol)
  }

  /**
   * Token-budget stratified mix (the "data mixing" step of a training run):
   * within each stratum (language, source, domain), admit rows in the
   * deterministic md5-hash order until the stratum's cumulative weight
   * (token count) reaches `budget` — every stratum contributes at most
   * `budget` tokens, and the SAME rows are chosen on any partitioning or
   * engine (the order key is the same md5 the hash sample uses, so nested
   * budgets select nested prefixes).
   *
   * One shuffle (the per-stratum window); the running sum is a single
   * ascending-order pass — no iteration, no driver loop. Emits
   * `cum_tokens` (inclusive) alongside the kept rows.
   *
   * Semantics are PREFIX-TRUNCATION: the kept set is the longest hash-order
   * prefix whose total weight fits the budget. A row too large to fit still
   * occupies its position in the prefix (its weight counts toward the
   * running sum), so it blocks later rows in its stratum rather than being
   * skipped around — by design, as skipping would make the selection
   * depend on every earlier row's weight individually rather than on the
   * prefix sum (and would need an iterative pass, not one window).
   */
  def tokenBudgetMix(df: DataFrame, keyCol: Column, strataCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(hexKey(keyCol), keyCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens", sum(weightCol).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
