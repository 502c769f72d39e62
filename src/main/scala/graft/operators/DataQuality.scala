package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deequ-style declarative data-quality constraint report (Schelter et al.,
 * VLDB'18 "Automating Large-Scale Data Quality Verification": compile all
 * declared constraints into ONE aggregation pass, then assert on the scalar
 * metrics). Each check yields a `(check_name, metric, passed)` row where
 * `metric` is the satisfied fraction in [0, 1] and `passed` compares it to
 * the check's `minFraction`.
 *
 * Scale shape: every column check is an aggregate EXPRESSION, so [[report]]
 * is a single `agg` over the table — partial aggregation absorbs everything
 * map-side and the shuffle is one row per partition regardless of table
 * size. The lone exception is [[Distinctness]] (a true `count(DISTINCT)`),
 * which Catalyst plans via Expand in the same stage — still one pass over
 * the data, at ×(distinct-checks+1) row expansion; use it deliberately.
 * Referential integrity is the one check that genuinely needs a second
 * relation, so it is a separate one-row frame ([[refIntegrity]]) unioned
 * onto the report — the join carries only the distinct-projected key column
 * of the dimension.
 */
object DataQuality {

  /** One declarative constraint; `metric` must be an aggregate expression
   * evaluating to the satisfied fraction of rows (DOUBLE in [0, 1]). */
  sealed trait Check {
    def name: String
    def metric: Column
    def minFraction: Double
  }

  /** Fraction of rows where `colName` is non-null. */
  final case class Completeness(colName: String, minFraction: Double = 1.0)
      extends Check {
    val name = s"completeness($colName)"
    def metric: Column = count(col(colName)).cast("double") / count(lit(1))
  }

  /** Distinct values over total rows — 1.0 iff the column is a key.
   * (Deequ's "distinctness"; its "uniqueness" — values occurring exactly
   * once — needs a per-value groupBy and is out of the one-pass budget.) */
  final case class Distinctness(colName: String, minFraction: Double = 1.0)
      extends Check {
    val name = s"distinctness($colName)"
    def metric: Column =
      count_distinct(col(colName)).cast("double") / count(lit(1))
  }

  /** Fraction of rows with `lo <= colName <= hi` (nulls count as
   * violations, same as Deequ's isContainedIn over an interval). */
  final case class Bounds(colName: String, lo: Double, hi: Double,
      minFraction: Double = 1.0) extends Check {
    val name = s"bounds($colName)"
    def metric: Column =
      count_if(col(colName).between(lo, hi)).cast("double") / count(lit(1))
  }

  /** Fraction of rows whose value is one of `values` (nulls violate). */
  final case class InSet(colName: String, values: Seq[String],
      minFraction: Double = 1.0) extends Check {
    val name = s"in_set($colName)"
    def metric: Column =
      count_if(col(colName).isin(values: _*)).cast("double") / count(lit(1))
  }

  /**
   * All column checks compiled into one aggregation pass, unpivoted to
   * `(check_name, metric, passed)` rows via a post-agg explode — the
   * explode runs over the SINGLE result row, never the data.
   */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "DataQuality.report: no checks declared")
    val metricCols = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"m$i") }
    val row = df.agg(metricCols.head, metricCols.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"m$i").as("metric"),
        (col(s"m$i") >= lit(c.minFraction)).as("passed"))
    }
    row.select(explode(array(entries: _*)).as("e"))
      .select(col("e.check_name"), col("e.metric"), col("e.passed"))
  }

  /**
   * Deequ's true uniqueness as a one-row report fragment: the fraction of
   * ROWS whose value occurs exactly once (1.0 iff `colName` is a duplicate
   * -free key; differs from [[Distinctness]], which counts distinct VALUES
   * over rows). Needs a per-value count, so it is outside [[report]]'s
   * one-pass budget — but both stages partial-aggregate (a hot value
   * collapses map-side before either exchange) and the second stage runs
   * over ≤ distinct-values rows. Null rows violate (count toward the
   * denominator, never the numerator), matching Deequ. Union the result
   * onto [[report]]'s output (same schema).
   */
  def uniqueness(df: DataFrame, colName: String,
      minFraction: Double = 1.0): DataFrame = {
    df.groupBy(col(colName)).agg(count(lit(1)).as("__dq_cnt"))
      .agg((coalesce(sum(when(col("__dq_cnt") === 1 && col(colName).isNotNull,
          lit(1L))), lit(0L)).cast("double") / sum(col("__dq_cnt"))).as("metric"))
      .select(lit(s"uniqueness($colName)").as("check_name"), col("metric"),
        (col("metric") >= lit(minFraction)).as("passed"))
  }

  /**
   * Referential-integrity check as a one-row report fragment: fraction of
   * `df` rows whose `fkCol` has a match in `dim(pkCol)` (null FKs violate).
   * The dimension is reduced to its distinct key column before the join —
   * the only payload that ever shuffles is the key itself; Catalyst/AQE
   * picks broadcast vs shuffle from the projected size. Union the result
   * onto [[report]]'s output (same schema).
   */
  def refIntegrity(df: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String, minFraction: Double = 1.0): DataFrame = {
    val keys = dim.select(col(pkCol).as("__dq_pk")).distinct()
    df.join(keys, col(fkCol) === col("__dq_pk"), "left")
      .agg((count(col("__dq_pk")).cast("double") / count(lit(1))).as("metric"))
      .select(lit(s"ref_integrity($fkCol)").as("check_name"), col("metric"),
        (col("metric") >= lit(minFraction)).as("passed"))
  }

  /**
   * Robust per-group outlier profile (Hampel identifier): a value is an
   * outlier when |v − median| > k × MAD (median absolute deviation). The
   * classic mean/stddev z-score breaks precisely when outliers exist — the
   * outliers inflate the stddev that is supposed to expose them — while
   * both medians have a 50% breakdown point.
   *
   * Shape: three passes over the data (group medians; MADs against the
   * broadcast medians; the flag count against broadcast thresholds), each
   * map-side except the percentile aggregates themselves. Exact percentile
   * buffers a group's values on one reducer — the same accepted exact-path
   * cost as `q_percentiles`; at true scale swap `percentile` for the KLL
   * sketch exactly as `TextAnalysis.qualityGate` does. Output: one row per
   * group — (group, n, n_outliers, med, mad), medians rounded to 6 digits
   * for cross-engine comparison. Null values are excluded up front (a null
   * is a completeness failure, not an outlier).
   */
  /**
   * Population stability index (drift monitor): how far a current batch's
   * value distribution moved from a reference snapshot — the standard
   * train/serve drift gate (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25
   * drifted). Buckets are the REFERENCE's `nBuckets` equal-mass quantile
   * ranges, so "no drift" always means ~1/n mass per bucket; both sides
   * then bucket map-side against the broadcast boundary array and PSI =
   * Σ (p_cur − p_ref) · ln(p_cur / p_ref) over buckets. Counts are
   * +0.5-smoothed (Laplace) so an empty bucket — the strongest drift
   * signal — contributes a large finite term instead of ±∞.
   *
   * Output: one row per bucket (bucket, n_ref, n_cur, contrib) — `contrib`
   * rounded to 6 digits for cross-engine comparison; total PSI = sum of
   * contribs. Shape: one exact-percentile aggregate on the reference (KLL
   * at true scale, as ever), then both scans are map-side with
   * partial-aggregated bucket counts — drift monitoring costs two scans
   * and shuffles ≤ nBuckets rows per side. Nulls are excluded on both
   * sides (they are completeness failures, not distribution mass).
   */
  def populationStability(ref: DataFrame, cur: DataFrame, valueCol: Column,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"populationStability: nBuckets must be >= 2, got $nBuckets")
    val bnds = quantileBoundaries(ref, valueCol, nBuckets)
    psiFromCounts(bucketCounts(ref, valueCol, bnds, "n_ref"),
      bucketCounts(cur, valueCol, bnds, "n_cur"), nBuckets, spark(ref))
  }

  /** The reference's equal-mass quantile boundaries as a one-row frame —
   * the bounded drift-reference artifact a monitor trains once (see
   * [[graft.streaming.StreamingDrift]]). */
  def quantileBoundaries(ref: DataFrame, valueCol: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"quantileBoundaries: nBuckets must be >= 2, got $nBuckets")
    val qs = (1 until nBuckets).map(i => (BigDecimal(i) / nBuckets).toString)
      .mkString(", ")
    // boundaries ROUNDED to 1e-6: interpolated percentiles are computed
    // with different (mathematically equal) FP orderings across engines
    // (a + f·(b−a) vs a·(1−f) + f·b), and a 1-ulp boundary difference
    // around an actual data value flips that value's whole duplicate set
    // into the adjacent bucket (the r13 sf10 sweep measured a 200-row
    // bucket shift from exactly this). Rounding makes the edge identical
    // everywhere; a data value within 1 ulp of a .5e-6 rounding edge is
    // the only residual hazard — vanishingly unlikely and stable per
    // dataset.
    ref.filter(valueCol.isNotNull)
      .select(valueCol.cast("double").as("__psi_v"))
      .agg(expr(s"transform(percentile(__psi_v, array($qs)), x -> round(x, 6))")
        .as("__psi_bnds"))
  }

  /** Map-side bucket counts against broadcast boundaries, in
   * [[psiFromCounts]]'s expected (bucket, count) shape. */
  def bucketCounts(df: DataFrame, valueCol: Column, bnds: DataFrame,
      cntName: String): DataFrame =
    df.filter(valueCol.isNotNull)
      .select(valueCol.cast("double").as("__psi_v"))
      .crossJoin(broadcast(bnds))
      .select(size(filter(col("__psi_bnds"), b => col("__psi_v") > b))
        .cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(cntName))

  /** [[populationStability]] over already-collapsed (bucket, n_ref) /
   * (bucket, n_cur) count tables — the shared core for the batch and
   * streaming drift paths. */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      nBuckets: Int, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val buckets = spark.range(nBuckets).select(col("id").as("bucket"))
    val joined = buckets
      .join(refCounts, Seq("bucket"), "left")
      .join(curCounts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("__psi_tr"),
      sum(col("n_cur")).as("__psi_tc"))
    val half = lit(0.5)
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(((col("n_cur") + half) / (col("__psi_tc") + half * nBuckets) -
               (col("n_ref") + half) / (col("__psi_tr") + half * nBuckets)) *
          log(((col("n_cur") + half) / (col("__psi_tc") + half * nBuckets)) /
              ((col("n_ref") + half) / (col("__psi_tr") + half * nBuckets))), 6)
          .as("contrib"))
  }

  /**
   * k-anonymity report over a set of quasi-identifier columns (Sweeney
   * 2002): every combination of quasi-identifier values is an equivalence
   * class; rows in classes smaller than `k` are re-identifiable. Returns
   * one row per class — (quasi cols..., class_size, at_risk) — the audit a
   * release pipeline runs before publishing, and the input to suppression.
   *
   * Shape: one partial-aggregatable count keyed by the quasi-identifier
   * tuple — map-side combine absorbs hot classes (the big classes are
   * exactly the safe ones), shuffle carries one row per class.
   */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityReport: need at least one quasi-identifier")
    require(k >= 2, s"kAnonymityReport: k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /**
   * Shannon entropy of a categorical distribution per group — the
   * data-DIVERSITY metric of a curation pipeline (a domain whose label/
   * source distribution collapsed is a sampling bug; a near-uniform one is
   * healthy). Returns (grp, n, n_cats, entropy, norm_entropy) with
   * norm_entropy = H / ln(n_cats) ∈ [0,1] (0 when a single category).
   *
   * Shape: two partial-aggregatable shuffles — (group, category) counts,
   * then per-group Σ −p·ln p over the already-collapsed category rows
   * (≤ categories per group, never raw data). 4dp round (float-sum order
   * + ln parity, the importanceWeights rule).
   */
  def categoricalEntropy(df: DataFrame, groupCol: Column,
      catCol: Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("grp"), catCol.as("cat"))
      .agg(count(lit(1)).as("cnt"))
    val p = col("cnt") / col("n")
    counts
      .join(counts.groupBy(col("grp"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_cats")), "grp")
      .groupBy(col("grp"), col("n"), col("n_cats"))
      .agg((-sum(p * log(p))).as("h"))
      .select(col("grp"), col("n"), col("n_cats"),
        (round(col("h"), 4) + lit(0.0)).as("entropy"),
        when(col("n_cats") > 1,
            round(col("h") / log(col("n_cats").cast("double")), 4) + lit(0.0))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /**
   * Welch's two-sample t-test per group — the A/B-experiment readout:
   * for each group, compare `valueCol` between the rows where `variantCol`
   * is true (variant A) and false (variant B). Reports per-variant
   * n/mean/variance and the Welch t statistic with Satterthwaite degrees
   * of freedom; t and df are NULL when either variant has < 2 rows or both
   * variances are zero (the statistic is undefined there, and NULL is
   * honest where a sentinel would corrupt downstream thresholds).
   *
   * Shape: ONE partial-aggregatable hash aggregate over the group key
   * (conditional aggregates, not a self-join per variant); everything
   * after is a map-side scalar projection. Means and variances round at
   * 4dp first, so the t/df arithmetic runs on already-stable inputs —
   * and sqrt is IEEE-correctly-rounded, unlike exp/ln, so the composite
   * stays engine-portable under the final 4dp round.
   */
  def welchTTest(df: DataFrame, groupCol: Column, variantCol: Column,
      valueCol: Column): DataFrame = {
    val va = when(variantCol, valueCol)
    val vb = when(!variantCol, valueCol)
    val g = df.groupBy(groupCol.as("grp")).agg(
      count(va).as("n_a"), count(vb).as("n_b"),
      (round(avg(va), 4) + lit(0.0)).as("mean_a"),
      (round(avg(vb), 4) + lit(0.0)).as("mean_b"),
      (round(var_samp(va), 4) + lit(0.0)).as("var_a"),
      (round(var_samp(vb), 4) + lit(0.0)).as("var_b"))
    val seA = col("var_a") / col("n_a")
    val seB = col("var_b") / col("n_b")
    val se = seA + seB
    val defined = col("n_a") > 1 && col("n_b") > 1 && se > 0
    g.select(col("grp"), col("n_a"), col("n_b"),
      col("mean_a"), col("mean_b"), col("var_a"), col("var_b"),
      when(defined,
        round((col("mean_a") - col("mean_b")) / sqrt(se), 4) + lit(0.0))
        .as("t_stat"),
      when(defined,
        round(se * se /
          (seA * seA / (col("n_a") - 1) + seB * seB / (col("n_b") - 1)), 4)
          + lit(0.0))
        .as("df_welch"))
  }

  /**
   * ε-differentially-private count release (Dwork, McSherry, Nissim, Smith
   * 2006): per-group counts plus Laplace(1/ε) noise via the inverse CDF,
   * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|). The uniform `u` derives from an
   * md5 hash of (group key, `salt`) — 13 hex chars = 52 bits, so u and
   * every pre-ln term are EXACT dyadic doubles (the
   * [[graft.operators.Sampling]] idiom): deterministic per (key, salt),
   * replayable for release audits, and identically recomputable by a SQL
   * oracle. A production release swaps in a sealed per-release seed as the
   * salt; determinism given the seed is a feature (audit trail), not a
   * leak, as long as the seed itself stays private.
   *
   * Shape: one partial-aggregatable count keyed by the group tuple; the
   * noise is a map-side scalar expression over the aggregated rows. Group
   * columns must render stably as strings (they key the hash).
   */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty, "dpNoisyCounts: need at least one group column")
    require(eps > 0, s"dpNoisyCounts: eps must be positive, got $eps")
    val key = concat_ws("|",
      groupCols.map(c => col(c).cast("string")) :+ lit(salt): _*)
    // (v + 0.5) / 2^52: exact dyadic uniform in (0,1), never 0 or 1
    val u = (conv(substring(md5(key), 1, 13), 16, 10).cast("long") + lit(0.5)) /
      lit(4503599627370496.0)
    val centered = u - lit(0.5)
    val noise = -lit(1.0 / eps) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) :+
        (round(col("__n") + noise, 4) + lit(0.0)).as("noisy_n"): _*)
  }

  /** Suppression to k-anonymity: drop every row whose equivalence class
   * has fewer than `k` members — the minimal-distortion release transform.
   * The class sizes are a broadcast of [[kAnonymityReport]]'s RISKY rows
   * only (small by definition: each holds < k rows), so the data-side pass
   * is one map-side anti-join — the corpus never shuffles. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val risky = kAnonymityReport(df, quasiCols, k)
      .filter(col("at_risk")).select(quasiCols.map(col): _*)
    df.join(broadcast(risky), quasiCols, "left_anti")
  }

  /**
   * Equi-width histogram per group — the numeric-profile companion of
   * [[categoricalEntropy]]: each group's non-null values are bucketed into
   * `nBins` equal-width bins over the group's own [min, max] range, giving
   * the distribution shape a drift/quality dashboard plots. Returns one row
   * per NON-EMPTY (group, bin): (grp, bin ∈ [1, nBins], cnt, lo, hi) with
   * lo/hi the group's value range (rounded to 6 digits for cross-engine
   * comparison). A group with a single distinct value lands entirely in
   * bin 1.
   *
   * Shape: one partial-aggregatable bounds pass (per-group min/max — one
   * row per group), broadcast back, then a map-side bucket expression and
   * one partial-aggregatable (group, bin) count. Bucket arithmetic is
   * written as `floor((v − lo) · nBins / (hi − lo))` — the exact same
   * left-associated IEEE double operation order the SQL oracle uses, so
   * bucket boundaries can never disagree between engines. The value `hi`
   * itself clamps into bin `nBins` (`least`), matching width_bucket's
   * closed-top convention without relying on any engine's width_bucket
   * edge-case behavior.
   */
  def histogram(df: DataFrame, groupCol: Column, valueCol: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"histogram: nBins must be >= 1, got $nBins")
    val rows = df.filter(valueCol.isNotNull)
      .select(groupCol.as("__dq_g"), valueCol.cast("double").as("__dq_v"))
    val bounds = rows.groupBy(col("__dq_g"))
      .agg(min(col("__dq_v")).as("__dq_lo"), max(col("__dq_v")).as("__dq_hi"))
    rows.join(broadcast(bounds), "__dq_g")
      .select(col("__dq_g"), col("__dq_lo"), col("__dq_hi"),
        when(col("__dq_hi") === col("__dq_lo"), lit(1))
          .otherwise(least(lit(nBins),
            floor((col("__dq_v") - col("__dq_lo")) * nBins /
              (col("__dq_hi") - col("__dq_lo"))).cast("int") + 1))
          .as("bin"))
      .groupBy(col("__dq_g"), col("bin"))
      .agg(count(lit(1)).as("cnt"),
        (round(first(col("__dq_lo")), 6) + lit(0.0)).as("lo"),
        (round(first(col("__dq_hi")), 6) + lit(0.0)).as("hi"))
      .withColumnRenamed("__dq_g", "grp")
  }

  private def spark(df: DataFrame) = df.sparkSession

  def robustOutliers(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Double = 5.0): DataFrame = {
    val rows = df.filter(valueCol.isNotNull)
      .select(groupCol.as("__dq_g"), valueCol.cast("double").as("__dq_v"))
    val meds = rows.groupBy(col("__dq_g")).agg(
      expr("percentile(__dq_v, 0.5)").as("__dq_med"))
    val withMed = rows.join(broadcast(meds), "__dq_g")
    val mads = withMed.groupBy(col("__dq_g")).agg(
      expr("percentile(abs(__dq_v - __dq_med), 0.5)").as("__dq_mad"))
    withMed.join(broadcast(mads), "__dq_g")
      .groupBy(col("__dq_g"))
      .agg(count(lit(1)).as("n"),
        count_if(abs(col("__dq_v") - col("__dq_med")) > lit(k) * col("__dq_mad"))
          .as("n_outliers"),
        round(first(col("__dq_med")), 6).as("med"),
        round(first(col("__dq_mad")), 6).as("mad"))
      .withColumnRenamed("__dq_g", "grp")
  }

  /**
   * Cross-group quantile normalization: map each group's value
   * distribution onto the GLOBAL one by rank — piecewise-linear
   * interpolation between per-group and global quantile grids (inclusive
   * 0..1 endpoints, `nBuckets` segments). The curation use: per-domain
   * quality scores are not comparable (one domain's 0.6 is another's
   * 0.9), so a single global filter threshold silently over-prunes some
   * domains; after normalization a group's median maps to the global
   * median and one threshold means the same thing everywhere.
   *
   * Shape: one bounded per-group exact-percentile aggregate + a one-row
   * global grid, both broadcast; the transform itself is a map-side
   * projection (bucket index + two array lookups + linear blend) — one
   * scan, no data shuffle. Within-segment position clamps to [0, 1], so
   * values at or beyond the grid edges map to the global edges.
   */
  def quantileNormalize(df: DataFrame, groupCol: Column, valueCol: Column,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"quantileNormalize: nBuckets must be >= 2, got $nBuckets")
    val qs = (0 to nBuckets).map(i => (BigDecimal(i) / nBuckets).toString)
      .mkString(", ")
    val rows = df.filter(groupCol.isNotNull && valueCol.isNotNull)
      .withColumn("__qn_g", groupCol)
      .withColumn("__qn_v", valueCol.cast("double"))
    // grids rounded at 6dp BEFORE interpolation (the cusum idiom): Spark's
    // `percentile` and an exact SQL `quantile_cont` interpolate the same
    // order statistics with arithmetic that can differ by 1 ulp, and the
    // late-corpus sweep caught one row where that ulp crossed v_norm's own
    // 6dp rounding boundary. Identically-rounded grid + IEEE-identical
    // downstream ops ⇒ the knife edge shrinks from every output row to the
    // (nBuckets+1)·groups grid points themselves — and the grid points use
    // the SAME sign-symmetric floor(x·10⁶ + 0.5)/10⁶ emulation as v_norm
    // below, NOT Spark's BigDecimal HALF_UP round(): the two families can
    // disagree by 1 ulp exactly at a .5·10⁻⁶ boundary, and a grid point on
    // that edge would shift every row interpolated in its segment.
    // NaN passes through: Spark's floor() returns LONG, so the emulation
    // would silently collapse a NaN grid point to 0.0 (poisoning every row
    // interpolated in its segment) where both round() families — and the
    // DuckDB oracle — keep NaN visible. isNotNull does not filter NaN.
    def floorRound6(x: Column): Column = {
      val scaled = x * lit(1e6)
      when(isnan(x), x).otherwise(
        (when(scaled >= 0, floor(scaled + lit(0.5)))
          .otherwise(-floor(-scaled + lit(0.5))) / lit(1e6)) + lit(0.0))
    }
    def round6(c: Column): Column = transform(c, floorRound6(_))
    val gGrid = rows.groupBy(col("__qn_g"))
      .agg(round6(expr(s"percentile(__qn_v, array($qs))")).as("__qn_gq"))
    val glGrid = rows.agg(round6(expr(s"percentile(__qn_v, array($qs))")).as("__qn_lq"))
    // interior cuts strictly below v → segment index in [0, nBuckets-1]
    val b = least(lit(nBuckets - 1),
      size(filter(slice(col("__qn_gq"), 2, nBuckets - 1), c => col("__qn_v") > c)))
    val lo = element_at(col("__qn_gq"), col("__qn_b") + 1)
    val hi = element_at(col("__qn_gq"), col("__qn_b") + 2)
    val glo = element_at(col("__qn_lq"), col("__qn_b") + 1)
    val ghi = element_at(col("__qn_lq"), col("__qn_b") + 2)
    val t = when(hi > lo,
      least(lit(1.0), greatest(lit(0.0), (col("__qn_v") - lo) / (hi - lo))))
      .otherwise(lit(0.0))
    // final rounding replicates SQL-engine double semantics — sign-symmetric
    // floor(x·10⁶ + 0.5)/10⁶ — instead of Spark's exact-binary-expansion
    // HALF_UP: the late-corpus sweep found a row whose raw value is exactly
    // 39.8790625 in real arithmetic but 1 ulp BELOW it as a double; the
    // ·10⁶ product snaps back onto …62.5 and rounds away-from-zero, while
    // BigDecimal HALF_UP on the ulp-low double rounds down — the one spot
    // where the two round() families can disagree. On every non-boundary
    // value the formulas agree bit-for-bit.
    val raw = glo + t * (ghi - glo)
    rows.join(broadcast(gGrid), "__qn_g").crossJoin(broadcast(glGrid))
      .withColumn("__qn_b", b)
      .withColumn("v_norm", floorRound6(raw))
      .drop("__qn_g", "__qn_v", "__qn_gq", "__qn_lq", "__qn_b")
  }

  /**
   * Join-key skew audit: the top-k heaviest keys with their mass fraction
   * and load factor (n·n_keys/total — multiples of perfect balance), plus
   * the Σn² self-equi-join row count carried on every row. This is the
   * BEFORE-the-join diagnostic that decides the salting/AQE strategy:
   * load factors tell you how hot the hot keys are (a task processing the
   * top key does `load_factor`× the average work), and `self_join_rows`
   * estimates the output size a self-join on this key would produce
   * (double-summed Σn², so exact below 2^53 total and n≈2^26 per key —
   * the magnitude, which is what the decision needs, survives far beyond)
   * — checked BEFORE burning cluster-hours on an exploding join.
   *
   * Shape: one partial-aggregatable key count; everything downstream runs
   * on the collapsed ≤|keys| table (a one-row summary aggregate broadcast
   * back, TakeOrdered top-k, and a ≤ topK-row ranking window).
   */
  def keySkewAudit(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"keySkewAudit: topK must be >= 1, got $topK")
    val counts = df.filter(keyCol.isNotNull)
      .groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
    val summary = counts.agg(count(lit(1)).as("__ks_keys"),
      sum(col("n")).as("__ks_total"),
      // Σn² in double: exact for key counts below 2^26, and the estimate
      // (not the join) is the product at scale anyway
      sum(col("n").cast("double") * col("n")).as("__ks_self"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topK)
    BoundedRank.withRank(top, col("key"), Seq(col("n").desc, col("key")))
      .crossJoin(broadcast(summary))
      .select(col("key"), col("n"), col("rank"),
        (round(col("n") / col("__ks_total"), 6) + lit(0.0)).as("frac"),
        // n·keys in double: the long product would overflow (and throw,
        // under ANSI) exactly on the corpora this audit exists for
        (round(col("n").cast("double") * col("__ks_keys") / col("__ks_total"), 4)
          + lit(0.0)).as("load_factor"),
        col("__ks_keys").as("n_keys"),
        col("__ks_self").cast("long").as("self_join_rows"))
  }

  /**
   * Schema-inference profile of a semi-structured JSON column: per key,
   * how many documents carry it, the carry fraction, and how many values
   * parse as numbers — the drift/contract audit for `props`-style columns
   * where the schema lives in the data ("did a producer start sending
   * user_id as a string?"). Typing uses `try_cast(… AS DOUBLE)` (never the
   * throwing ANSI cast), identically in the oracle engine.
   *
   * Shape: one row-local key explode + value extraction, one
   * partial-aggregatable per-key count (≤ distinct keys rows out), one
   * broadcast one-row total. NULL, malformed, and non-object JSON rows are
   * excluded from keys AND the denominator (json_object_keys returns NULL
   * for all three) — on a dirty corpus `frac` reads "fraction of parseable
   * JSON objects carrying the key", not "fraction of rows".
   */
  def jsonProfile(df: DataFrame, jsonCol: Column): DataFrame = {
    // keys are projected once and the guard filters on the alias; note
    // Catalyst still pushes the predicate below the projection (re-inlining
    // the parse into the scan filter), so the document is parsed ~twice per
    // row, not once — acceptable: the parse is row-local and the alternative
    // (a materialization barrier) costs more than it saves here
    // spread the single projected column before the parse and BARRIER the
    // parsed rows: json key enumeration + per-key get_json_object is the
    // heavy row-local work (r19 probe: a 0.61 s + 0.27 s pair of
    // single-task stages on a one-split scan). The barrier both keeps the
    // key-validity filter from being pushed below the exchange (which
    // re-inlined the parse on the serial side) and lets the total-count
    // aggregate below read the parsed rows instead of re-scanning and
    // re-parsing the corpus — the r18 "parse ~twice per row" note no
    // longer holds once the parse is exchange-spread.
    val rows = graft.Materialize(TextAnalysis.spreadForCpuWork(
        df.filter(jsonCol.isNotNull).select(jsonCol.as("__jp_j")))
      .select(col("__jp_j"), expr("json_object_keys(" +
        "__jp_j)").as("__jp_keys")))
      // key-validity filter AFTER the barrier: inside it, pushdown would
      // re-inline the parse below the spread exchange (the serial side)
      .filter(col("__jp_keys").isNotNull)
    val tot = rows.agg(count(lit(1)).as("__jp_total"))
    rows.select(explode(col("__jp_keys")).as("key"), col("__jp_j"))
      .withColumn("__jp_v",
        expr("get_json_object(__jp_j, concat('$.', key))"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        count(expr("try_cast(__jp_v AS double)")).as("n_numeric"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"), col("n_numeric"),
        (round(col("n") / col("__jp_total"), 4) + lit(0.0)).as("frac"))
  }

  /**
   * Mann–Whitney U test per group — the NONPARAMETRIC A/B readout
   * (heavy-tailed metrics like revenue or latency where Welch's
   * normality-of-means assumption is shaky), completing the family:
   * [[welchTTest]] (numeric, parametric), [[chiSquareIndependence]]
   * (categorical), this (numeric, rank-based). Returns (grp, n_a, n_b,
   * u_a, z_stat) — U for variant A with average ranks for ties, and the
   * tie-corrected normal-approximation z; z is NULL when either side is
   * empty or the variance degenerates (all values tied).
   *
   * Ranking without a per-group single-task window: values collapse to
   * (grp, value) count rows first (ONE corpus-sized partial-aggregatable
   * shuffle — ties collapse map-side); per-group quantile boundaries
   * (bounded, broadcast) bucket the collapsed rows, so the running
   * "count below" prefix is a window over (grp, bucket) — each task sees
   * ~1/nBuckets of a group's distinct values — plus broadcast per-bucket
   * offsets from a groups×buckets-sized table. The rank sum Σ n_a·(below +
   * (ties+1)/2) is a sum of exact half-integers, so it is order-exact in
   * IEEE doubles and the oracle can reproduce it bit-for-bit with plain
   * windows.
   */
  def mannWhitney(df: DataFrame, groupCol: Column, variantCol: Column,
      valueCol: Column, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 2, s"mannWhitney: nBuckets must be >= 2, got $nBuckets")
    val rows = df.filter(groupCol.isNotNull && variantCol.isNotNull &&
        valueCol.isNotNull)
      .select(groupCol.as("__mw_g"), variantCol.as("__mw_a"),
        valueCol.cast("double").as("__mw_v"))
    val qs = (1 until nBuckets).map(i => (BigDecimal(i) / nBuckets).toString)
      .mkString(", ")
    val bnds = rows.groupBy(col("__mw_g"))
      .agg(expr(s"percentile(__mw_v, array($qs))").as("__mw_bnds"))
    // barrier: `collapsed` is referenced by BOTH the bucket-offset table
    // and the ranked join below — unbarriered, the whole scan + collapse +
    // percentile-bounds subtree ran three times (r19 probe: six corpus
    // scans for one query). The collapsed table is the operator's bounded
    // intermediate (distinct (grp, value) rows), exactly what the
    // cluster-safe Materialize strategy is for.
    val collapsed = graft.Materialize(rows
      .groupBy(col("__mw_g"), col("__mw_v"))
      .agg(count_if(col("__mw_a")).as("na"),
        count_if(!col("__mw_a")).as("nb"))
      .join(broadcast(bnds), "__mw_g")
      .withColumn("__mw_b",
        size(filter(col("__mw_bnds"), b => col("__mw_v") > b)))
      .drop("__mw_bnds")
      .withColumn("t", col("na") + col("nb")))
    // per-(grp, bucket) totals → running offsets over a groups×buckets
    // table (bounded; this window's partitions are ≤ nBuckets rows)
    val offsets = collapsed.groupBy(col("__mw_g"), col("__mw_b"))
      .agg(sum(col("t")).as("__mw_bt"))
      .withColumn("__mw_off",
        coalesce(sum(col("__mw_bt")).over(
          Window.partitionBy(col("__mw_g")).orderBy(col("__mw_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__mw_bt")
    val wLocal = Window.partitionBy(col("__mw_g"), col("__mw_b"))
      .orderBy(col("__mw_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = collapsed.join(broadcast(offsets), Seq("__mw_g", "__mw_b"))
      .withColumn("below",
        col("__mw_off") + coalesce(sum(col("t")).over(wLocal), lit(0L)))
    val g = ranked.groupBy(col("__mw_g"))
      .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
        // exact: every term is a half-integer (below, t integral)
        sum(col("na").cast("double") *
          (col("below").cast("double") + (col("t").cast("double") + 1) / 2))
          .as("__mw_ra"),
        sum(col("t").cast("double") * col("t") * col("t") - col("t"))
          .as("__mw_ties"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    val uA = col("__mw_ra") - nA * (nA + 1) / 2
    val variance = nA * nB / 12 *
      ((n + 1) - col("__mw_ties") / (n * (n - 1)))
    g.select(col("__mw_g").as("grp"), col("n_a"), col("n_b"),
      (uA + lit(0.0)).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0 && variance > 0,
        round((uA - nA * nB / 2) / sqrt(variance), 4) + lit(0.0))
        .as("z_stat"))
  }

  /**
   * Pearson chi-square test of independence between two categorical
   * columns, per group — the A/B readout for CATEGORICAL outcomes (did the
   * variant shift which event types users produce?), complementing
   * [[welchTTest]] which covers numeric outcomes. Returns (grp, n, n_a,
   * n_b, dof, chi2) with dof = (n_a−1)(n_b−1); chi2 is NULL when dof = 0
   * (a degenerate table has no test).
   *
   * Uses the algebraic identity Σ_cells (o−e)²/e = Σ_observed o²/e − N
   * (cells with o = 0 contribute exactly their expected mass, which the
   * −N term accounts for), so unobserved cells never need generating —
   * the computation touches only cells that actually occur.
   *
   * Shape: ONE partial-aggregatable (grp, a, b) count shuffle over raw
   * data; margins and totals all derive from that collapsed cell table
   * (≤ |A|·|B| rows per group) via broadcast joins. Nulls in either
   * column are excluded (they are completeness failures, not categories).
   */
  def chiSquareIndependence(df: DataFrame, groupCol: Column, aCol: Column,
      bCol: Column): DataFrame = {
    val cells = df.filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(groupCol.as("__dq_g"), aCol.as("__dq_a"), bCol.as("__dq_b"))
      .agg(count(lit(1)).as("__dq_o"))
    val aTot = cells.groupBy(col("__dq_g"), col("__dq_a"))
      .agg(sum(col("__dq_o")).as("__dq_na"))
    val bTot = cells.groupBy(col("__dq_g"), col("__dq_b"))
      .agg(sum(col("__dq_o")).as("__dq_nb"))
    val gTot = cells.groupBy(col("__dq_g"))
      .agg(sum(col("__dq_o")).as("__dq_n"),
        count_distinct(col("__dq_a")).as("__dq_ka"),
        count_distinct(col("__dq_b")).as("__dq_kb"))
    cells
      .join(broadcast(aTot), Seq("__dq_g", "__dq_a"))
      .join(broadcast(bTot), Seq("__dq_g", "__dq_b"))
      .join(broadcast(gTot), Seq("__dq_g"))
      .groupBy(col("__dq_g"))
      .agg(first(col("__dq_n")).as("n"),
        first(col("__dq_ka")).as("n_a"),
        first(col("__dq_kb")).as("n_b"),
        // explicit double casts in fixed association order: long·long·long
        // would overflow at scale, and the SQL oracle replays the exact
        // same IEEE operation sequence so the 4dp round can't diverge
        sum(col("__dq_o").cast("double") * col("__dq_o").cast("double") *
          col("__dq_n").cast("double") /
          (col("__dq_na").cast("double") * col("__dq_nb").cast("double")))
          .as("__dq_s"))
      .select(col("__dq_g").as("grp"), col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        when((col("n_a") - 1) * (col("n_b") - 1) > 0,
          round(col("__dq_s") - col("n"), 4) + lit(0.0)).as("chi2"))
  }

  /**
   * Jensen–Shannon divergence between two CATEGORICAL distributions —
   * the drift monitor for label/source/type mixes, complementing
   * [[populationStability]] which buckets numeric values. Symmetric and
   * bounded in [0, ln 2], and needs no smoothing: a category absent on
   * one side contributes ½·p·ln 2 through the mixture, never ±∞ (the
   * p = 0 branch of p·ln(p/m) is 0 by continuity, encoded as a `when`).
   *
   * Output: one row per category — (cat, n_ref, n_cur, contrib) with
   * contrib rounded at 6dp; JSD = Σ contrib.
   *
   * Shape: two partial-aggregatable category counts (map-side combine
   * absorbs hot categories), a full outer join on the ≤ |categories|
   * collapsed rows, and one broadcast one-row total — raw data is scanned
   * once per side and never shuffled.
   */
  def jsDivergence(ref: DataFrame, cur: DataFrame, catCol: Column): DataFrame =
    jsDivergenceCounts(categoryCounts(ref, catCol, "n_ref"),
      categoryCounts(cur, catCol, "n_cur"))

  /** Category counts in jsDivergence's expected shape — the bounded
   * reference artifact a drift monitor trains once and reuses (see
   * [[graft.streaming.StreamingDrift]]). */
  def categoryCounts(df: DataFrame, catCol: Column,
      cntName: String): DataFrame =
    df.filter(catCol.isNotNull).groupBy(catCol.as("cat"))
      .agg(count(lit(1)).as(cntName))

  /** [[jsDivergence]] over already-collapsed (cat, n_ref) / (cat, n_cur)
   * count tables — the shared core for the batch and streaming paths. */
  def jsDivergenceCounts(refCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = refCounts
      .join(curCounts, Seq("cat"), "full_outer")
      .select(col("cat"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("__js_tr"),
      sum(col("n_cur")).as("__js_tc"))
    // a zero-total side carries zero mass everywhere: guard the division
    // (ANSI mode throws DIVIDE_BY_ZERO on 0/0) — p = 0 is the continuous
    // limit, and the other side's terms then contribute their full ln 2
    val p = when(col("__js_tr") > 0, col("n_ref") / col("__js_tr"))
      .otherwise(lit(0.0))
    val q = when(col("__js_tc") > 0, col("n_cur") / col("__js_tc"))
      .otherwise(lit(0.0))
    val m = (p + q) / 2
    val term = (x: Column) => when(x > 0, x * log(x / m)).otherwise(lit(0.0))
    joined.crossJoin(broadcast(tot))
      .select(col("cat"), col("n_ref"), col("n_cur"),
        (round((term(p) + term(q)) / 2, 6) + lit(0.0)).as("contrib"))
  }

  /**
   * Reliability diagram + expected calibration error (Naeini et al. 2015):
   * bin a classifier's [0, 1] scores into `nBins` equal-width bins; per
   * bin report n, mean predicted score (confidence), observed positive
   * rate (accuracy), and the bin's weighted |conf − acc| contribution —
   * ECE = Σ contribs. The readout that decides whether a quality/toxicity
   * classifier's scores can be thresholded as probabilities, run before
   * using any model-scored filter in a curation pipeline.
   *
   * Bin arithmetic is `least(nBins, floor(score·nBins) + 1)` — score 1.0
   * clamps into the top bin ([[histogram]]'s closed-top convention).
   * conf and acc round at 4dp BEFORE the |diff|, so the contribution is
   * computed from already-engine-stable inputs; contribs round at 6dp.
   *
   * Shape: one partial-aggregatable (bin) aggregate over a map-side bin
   * projection, plus one broadcast one-row total — one scan, shuffle
   * ≤ nBins rows.
   */
  def calibrationReport(df: DataFrame, scoreCol: Column, labelCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"calibrationReport: nBins must be >= 1, got $nBins")
    val rows = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__dq_s"),
        labelCol.cast("boolean").cast("int").as("__dq_y"))
    val binned = rows
      .select(least(lit(nBins), floor(col("__dq_s") * nBins).cast("int") + 1)
        .as("bin"), col("__dq_s"), col("__dq_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        (round(avg(col("__dq_s")), 4) + lit(0.0)).as("conf"),
        (round(avg(col("__dq_y").cast("double")), 4) + lit(0.0)).as("acc"))
    val tot = binned.agg(sum(col("n")).as("__dq_tot"))
    // floor-based 6dp rounding, NOT round(): the contribution's inputs are
    // deterministic (4dp-rounded conf/acc, integer n/tot), so its double is
    // bit-identical cross-engine — but it lands on EXACT decimal .5 ties by
    // construction (4dp factors over power-of-ten totals), where engine
    // round() tie conventions disagree. floor(x·1e6 + 0.5)/1e6 is pure IEEE
    // arithmetic on that identical double → identical everywhere.
    val raw = col("n") / col("__dq_tot") * abs(col("conf") - col("acc"))
    binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("conf"), col("acc"),
        (floor(raw * 1e6 + lit(0.5)) / 1e6 + lit(0.0)).as("ece_contrib"))
  }

  // ---------------------------------------------------- corpus health

  /**
   * Per-source corpus health dashboard — the one-glance rollup a curation
   * run reports per ingest source: volume, exact-duplicate count, language
   * spread, size distribution (total / floor-mean / median chars), token
   * mass. The ingredients exist as separate audits; this is the composed
   * per-source report a 100 TB pipeline actually pages on.
   *
   * Scale shape: ONE groupBy(source) aggregation pass. The two
   * count(DISTINCT) columns (content hash, language) plan via Catalyst's
   * Expand in the same stage — ×3 map-side row expansion, NO per-group set
   * collection, so per-group state stays bounded regardless of group size;
   * the exact median is a percentile partial-aggregate (buffer per group ∝
   * distinct lengths, the same machinery as q_percentiles — swap for a KLL
   * sketch column if a source's length domain were unbounded). Duplicate
   * detection hashes the full text map-side (md5, 16 bytes/doc into the
   * exchange — the text itself never shuffles).
   */
  def corpusHealth(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text", langCol: String = "lang",
      nCharsCol: String = "n_chars"): DataFrame =
    df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(md5(col(textCol)))).as("dup_docs"),
      countDistinct(col(langCol)).as("n_langs"),
      sum(col(nCharsCol)).as("total_chars"),
      floor(sum(col(nCharsCol)).cast("double") / count(lit(1)))
        .cast("long").as("avg_chars_floor"),
      percentile(col(nCharsCol), lit(0.5)).as("p50_chars"),
      sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("total_tokens"))
}
