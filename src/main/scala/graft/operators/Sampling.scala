package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * Deterministic named splits (train/val/test): the md5-hash order is cut
   * into contiguous prefix ranges by 2-hex-digit boundaries, so the splits
   * are DISJOINT and EXHAUSTIVE by construction (every row lands in exactly
   * one range), stable under repartitioning/engines like [[hashSample]],
   * and leakage-proof — membership depends only on the row's own key, never
   * on what else is in the dataset, so re-running on a grown corpus never
   * moves an old row across splits. `boundaries` are (name, upperHex)
   * pairs in increasing hex order; rows at or above the last boundary get
   * `lastName`. E.g. 80/10/10: `Seq("train" -> "cc", "val" -> "e6")`,
   * `"test"`. Map-side only (one string-compare CASE, no shuffle).
   */
  def hashSplit(df: DataFrame, keyCol: Column,
      boundaries: Seq[(String, String)], lastName: String): DataFrame = {
    require(boundaries.nonEmpty, "hashSplit: need at least one boundary")
    require(boundaries.map(_._2) == boundaries.map(_._2).sorted,
      s"hashSplit: boundaries must be in increasing hex order: $boundaries")
    val key = hexKey(keyCol)
    val split = boundaries.foldRight(lit(lastName): Column) {
      case ((name, upper), acc) => when(key < lit(upper), lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /**
   * Temperature-scaled domain mixing weights — the "α-sampling" recipe of
   * multilingual pretraining mixes (mBERT/XLM-R; the Llama-style data-mix
   * knob): share_i = n_i^α / Σ_j n_j^α. α = 1 keeps natural proportions,
   * α → 0 flattens toward uniform; `boost` (share over natural share) is
   * the per-domain up/down-sampling factor a mixer ([[tokenBudgetMix]])
   * then applies. One partial-aggregatable count keyed by domain plus a
   * ONE-ROW total that broadcasts; shares round at 6dp (pow/sum ulps).
   */
  def alphaMixWeights(df: DataFrame, domainCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"alphaMixWeights: alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(domainCol.as("domain")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(pow(col("n"), lit(alpha))).as("pw_total"),
      sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("domain"), col("n"),
        (round(pow(col("n"), lit(alpha)) / col("pw_total"), 6) + lit(0.0))
          .as("share"),
        (round((pow(col("n"), lit(alpha)) / col("pw_total")) /
            (col("n") / col("n_total")), 6) + lit(0.0)).as("boost"))
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
   * "Weighted random sampling with a reservoir", IPL 2006): each row draws
   * u ∈ (0,1) and ranks by u^(1/w) — the top `n` ranks are a weighted
   * sample where inclusion probability is proportional to weight. Here u
   * is DETERMINISTIC — the first 13 hex digits of md5(key) scaled to (0,1)
   * — so the sample is re-derivable on any partitioning or engine (and
   * DuckDB replays it exactly: same md5, same hex parse, same ln).
   * Ranking uses the equivalent ln(u)/w (monotone in u^(1/w), avoids
   * pow-near-1 precision loss at large weights).
   *
   * Shape: the rank key is a map-side projection; the top-n is a global
   * TakeOrdered (per-partition bounded heaps, no single-partition sort).
   * Rows with NULL or non-positive weight are excluded (a zero weight has
   * zero inclusion probability; A-ES is undefined there).
   */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1, got $n")
    // 13 hex digits = 52 bits: v and v + 0.5 are both EXACT doubles, so u is
    // bit-identical in any IEEE engine (15+ digits would round at 2^53)
    val u = (conv(substring(hexKey(keyCol), 1, 13), 16, 10).cast("long") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__ws_rank", log(u) / weightCol.cast("double"))
      .orderBy(col("__ws_rank").desc, keyCol)
      .limit(n)
      .drop("__ws_rank")
  }

  /**
   * Deterministic curriculum ordering key: sorting by `ord_key` yields a
   * training order that is (a) easy→hard WITHIN each stratum at
   * `nBuckets`-quantile granularity and (b) stratum-PROPORTIONAL in every
   * prefix — bucket b of every stratum holds ~1/nBuckets of that stratum's
   * mass (per-stratum quantile boundaries), so the first k buckets of the
   * global order contain ~k/nBuckets of EVERY stratum: no domain is
   * front-loaded while difficulty still ramps. Within a bucket, rows
   * spread uniformly by the row key's md5 (the [[hashSample]] 52-bit
   * dyadic-uniform idiom) — deterministic across runs, partitionings,
   * and engines.
   *
   * Output: (input columns…, bucket, ord_key). The writer pairs it with
   * `repartitionByRange(ord_key) + sortWithinPartitions` exactly like the
   * shard emitter — NO global row_number (a single-task window) exists or
   * is needed; the key itself carries the order.
   *
   * Shape: one bounded per-stratum exact-percentile aggregate (≤ strata
   * rows, broadcast back), then everything is a map-side projection —
   * curriculum assignment costs one scan and shuffles only the boundary
   * table. Rows with NULL stratum or difficulty are excluded (they have
   * no place in the ramp; filter them, don't guess).
   */
  def curriculumOrder(df: DataFrame, keyCol: Column, stratumCol: Column,
      difficultyCol: Column, nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 2, s"curriculumOrder: nBuckets must be >= 2, got $nBuckets")
    val qs = (1 until nBuckets).map(i => (BigDecimal(i) / nBuckets).toString)
      .mkString(", ")
    val rows = df.filter(stratumCol.isNotNull && difficultyCol.isNotNull)
      .withColumn("__cu_s", stratumCol)
      .withColumn("__cu_d", difficultyCol.cast("double"))
    val bnds = rows.groupBy(col("__cu_s"))
      .agg(expr(s"percentile(__cu_d, array($qs))").as("__cu_bnds"))
    val u = (conv(substring(hexKey(keyCol), 1, 13), 16, 10).cast("long") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52 — exact dyadic, engine-portable
    // clamp u below 1 − 6e-7·nBuckets: without it a key with u ≈ 1 has
    // (bucket + u)/nBuckets within half an ulp-of-6dp of the NEXT band's
    // boundary, and the 6dp round would land it exactly ON (b+1)/nBuckets,
    // breaking the strict [b/n, (b+1)/n) band invariant. The clamp keeps
    // the rounded key ≤ boundary − 1e-6; decimal-parsed constant so the
    // oracle's literal is bit-identical
    val clamp = (BigDecimal(1) - BigDecimal("0.0000006") * nBuckets).toDouble
    rows.join(broadcast(bnds), "__cu_s")
      .withColumn("bucket",
        size(filter(col("__cu_bnds"), b => col("__cu_d") > b)).cast("long"))
      .withColumn("ord_key",
        round((col("bucket") + least(u, lit(clamp))) / nBuckets, 6) + lit(0.0))
      .drop("__cu_s", "__cu_d", "__cu_bnds")
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
   * budgets select nested prefixes). Emits `cum_tokens` (inclusive)
   * alongside the kept rows.
   *
   * Semantics are PREFIX-TRUNCATION: the kept set is the longest hash-order
   * prefix whose total weight fits the budget. A row too large to fit still
   * occupies its position in the prefix (its weight counts toward the
   * running sum), so it blocks later rows in its stratum rather than being
   * skipped around — by design, as skipping would make the selection
   * depend on every earlier row's weight individually rather than on the
   * prefix sum (and would need an iterative pass, not one window).
   *
   * Skew note: the per-stratum running sum is NOT one window per stratum —
   * `Window.partitionBy(stratum)` would funnel every row of a hot stratum
   * ("en" is half the web) into ONE task. Instead the same two-phase
   * distributed scan [[Packing.packSequences]] uses, keyed by hash order:
   *
   *   1. rows bucket by the first two hex digits of the order key — 256
   *      sub-ranges of each stratum's hash order, so a hot stratum spreads
   *      across 256 tasks;
   *   2. per-(stratum, bucket) weight totals become exclusive prefix
   *      OFFSETS via a window over the TOTALS frame — ≤256 rows per
   *      stratum, bounded work however large the data — then join back
   *      (no driver collect: strata count is unbounded, so offsets stay
   *      a distributed frame, unlike packSequences' bounded id-bucket
   *      array);
   *   3. the within-bucket running sum (a window partitioned by
   *      (stratum, bucket), which reuses the join's hash partitioning)
   *      plus the bucket's offset is the global per-stratum running sum.
   */
  def tokenBudgetMix(df: DataFrame, keyCol: Column, strataCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    val outCols = df.columns.toSeq.map(col) :+ col("cum_tokens")
    val base = df.withColumn("__mix_s", strataCol)
      .withColumn("__mix_ord", hexKey(keyCol))
      .withColumn("__mix_b", conv(substring(col("__mix_ord"), 1, 2), 16, 10).cast("int"))
    // per-(stratum, bucket) totals; `nn` (non-null weight count) preserves
    // SQL sum-over-window null semantics exactly: the running sum is NULL
    // only while the prefix has seen no non-null weight at all
    val totals = base.groupBy(col("__mix_s"), col("__mix_b"))
      .agg(coalesce(sum(weightCol), lit(0)).as("__mix_t"),
        count(weightCol).as("__mix_nn"))
    val wOff = Window.partitionBy(col("__mix_s")).orderBy(col("__mix_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__mix_s").as("__mix_os"), col("__mix_b").as("__mix_ob"),
      coalesce(sum(col("__mix_t")).over(wOff), lit(0)).as("__mix_off"),
      coalesce(sum(col("__mix_nn")).over(wOff), lit(0L)).as("__mix_nn_off"))
    val wRun = Window.partitionBy(col("__mix_s"), col("__mix_b"))
      .orderBy(col("__mix_ord"), keyCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    // null-safe join keys: a NULL stratum (and the NULL bucket of a NULL
    // order key) is a legitimate group — `Window.partitionBy` grouped NULLs
    // together in the formulation this replaced, so a plain equi-join would
    // silently drop those rows. The offsets side carries renamed keys so the
    // self-derived join needs no lineage disambiguation.
    base.join(offsets,
        col("__mix_s") <=> col("__mix_os") && col("__mix_b") <=> col("__mix_ob"))
      .drop("__mix_os", "__mix_ob")
      .withColumn("__mix_run", sum(weightCol).over(wRun))
      .withColumn("cum_tokens",
        when(col("__mix_run").isNotNull, col("__mix_off") + col("__mix_run"))
          .when(col("__mix_nn_off") > 0, col("__mix_off"))
          .otherwise(lit(null)))
      .filter(col("cum_tokens") <= budget)
      .select(outCols: _*)
  }

  /**
   * Per-key row cap (repetition control): keep at most `n` rows per key —
   * at most `n` documents per domain/source, the C4/RefinedWeb-style guard
   * against any single site dominating a training mix. The kept rows are
   * the first `n` of each key in deterministic md5-hash order of `idCol`
   * (the repo's cross-engine convention: re-derivable on any partitioning
   * or engine, and a smaller cap's pick is a prefix of a larger cap's).
   *
   * Skew is the entire design problem here — the hot key is the REASON the
   * operator runs (one domain with 10⁸ pages). A `row_number` window would
   * funnel that key into one task; an uncapped `collect_list` would buffer
   * 10⁸ entries before truncating. Instead the per-group state is a bounded
   * ordered set ([[graft.functions.TopNExpressions.TopNByOrderAgg]], ≤ n
   * entries at every stage, partial-aggregated map-side), so the exchange
   * carries ≤ n candidate ids per key per map partition. Kept ids then
   * semi-join back to the input — one shuffle on the (unique, non-null,
   * integral) id, skew-free by uniqueness.
   */
  def capPerKey(df: DataFrame, keyCol: Column, idCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val kept = df.groupBy(keyCol)
      .agg(graft.functions.TopNExpressions
        .topNByOrder(hexKey(idCol), idCol.cast("long"), n).as("__cap_ids"))
      .select(explode(col("__cap_ids")).as("__cap_id"))
    df.join(kept, idCol.cast("long") === col("__cap_id"), "left_semi")
  }

  /**
   * Quantile-stratified balanced sample: bucket rows by score into
   * `nBuckets` equal-probability-mass strata (internal type-7 percentiles
   * as boundaries) and keep the first `perBucket` rows of each stratum in
   * deterministic md5 order — the "equal mass from every quality decile"
   * mix that counteracts a curation pipeline's tendency to oversample the
   * high-score head.
   *
   * Shape: the boundary array is ONE one-row aggregate broadcast back over
   * the corpus (same gate shape as [[TextAnalysis.qualityGate]] — never a
   * global ntile window, which would funnel the corpus through one task);
   * bucket assignment is a map-side count of boundaries strictly below the
   * score (ties fall to the lower bucket, identically in DuckDB); the
   * per-bucket pick is the bounded ordered-set aggregate of [[capPerKey]].
   * The exact percentile buffers values on one reducer — at true scale swap
   * the boundary aggregate for the KLL sketch exactly as qualityGate does.
   *
   * Output = input columns + `qss_score` (DOUBLE) + `bucket` (0-based
   * BIGINT).
   */
  def quantileStratifiedSample(df: DataFrame, scoreCol: Column, idCol: Column,
      nBuckets: Int, perBucket: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val scored = df.withColumn("qss_score", scoreCol.cast("double"))
    val qs = (1 until nBuckets).map(i =>
      (BigDecimal(i) / nBuckets).toString).mkString(", ")
    val bnds = scored.agg(
      expr(s"percentile(qss_score, array($qs))").as("__qss_bnds"))
    val bucketed = scored.crossJoin(broadcast(bnds))
      .withColumn("bucket",
        size(filter(col("__qss_bnds"), b => col("qss_score") > b)).cast("long"))
      .drop("__qss_bnds")
    capPerKey(bucketed, col("bucket"), idCol, perBucket)
  }
}
