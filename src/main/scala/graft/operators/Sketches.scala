package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL, built into
 * Spark 4 as `hll_sketch_agg` / `hll_union_agg`): the 100 TB pattern for
 * COUNT(DISTINCT) over any rollup grain.
 *
 * Why this matters at scale: an exact distinct over a 100 TB fact table
 * shuffles every distinct key once per query. A sketch table materialized
 * once at the finest grain (here: per day) is a few KB per group — any
 * coarser rollup (month, total, per-type) is then a register-wise union of
 * the PRE-AGGREGATED sketches, never a rescan of raw data. Unions are
 * commutative and associative (register max), so estimates are
 * deterministic regardless of partitioning or merge order — exactly the
 * property that makes them safe to persist and re-merge incrementally
 * (append today's sketch, union on read).
 */
object Sketches {

  /** Backtick-quote an identifier for splicing into `expr()` SQL — needed
   * because `approx_top_k_*` have no Column-API surface in Spark 4.1, so
   * the column name must ride through the SQL parser. Doubles embedded
   * backticks per the SQL quoting rule, so dotted/spaced/backticked names
   * all survive. */
  private def q(id: String): String = "`" + id.replace("`", "``") + "`"

  /** Finest-grain sketch table: one HLL sketch (binary, ~2^lgK registers)
   * per (group, day). This is the thing you'd persist as parquet. */
  def dailySketches(df: DataFrame, timeCol: String, keyCol: String,
      groupCols: Seq[String], lgK: Int = 12): DataFrame = {
    // floor, not cast-truncate: cast("long") truncates toward zero, which
    // buckets pre-1970 timestamps into the WRONG day and diverges from the
    // DuckDB oracles' floor-division `//`. floor of the double quotient
    // matches `//` for negative epochs too.
    val day = floor(col(timeCol).cast("long") / 86400L).cast("long") * 86400L
    df.groupBy((groupCols.map(col) :+ day.as("day_s")): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Roll daily sketches up to a coarser grain by register-wise union —
   * touches only the sketch table. */
  def rollup(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("distinct_estimate"),
        sum(col("n_rows")).as("n_rows"))

  /** Exact distinct for the same shape — the spec's accuracy yardstick. */
  def exactDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(keyCol)).as("distinct_exact"))

  // ------------------------------------------------ frequent-items sketches

  /** Mergeable TOP-K twin of [[dailySketches]]: one DataSketches
   * frequent-items sketch per (group, day) (`approx_top_k_accumulate`,
   * Spark 4.1 built-in). `maxItems` bounds sketch memory; counts are EXACT
   * while the per-group distinct domain stays under it, and
   * error-bounded (±n/maxItems) beyond. Same persist-once/merge-anywhere
   * contract as the HLL table. */
  def dailyTopKSketches(df: DataFrame, timeCol: String, keyCol: String,
      groupCols: Seq[String], maxItems: Int = 1024): DataFrame = {
    val day = floor(col(timeCol).cast("long") / 86400L).cast("long") * 86400L
    df.groupBy((groupCols.map(col) :+ day.as("day_s")): _*)
      .agg(expr(s"approx_top_k_accumulate(${q(keyCol)}, $maxItems)").as("topk_sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Roll daily top-k sketches up to a coarser grain: register-merge the
   * sketches, then estimate the k heaviest items — touches only the sketch
   * table, never raw data. Output `top_items` is ARRAY<STRUCT<item, count>>
   * ordered heaviest-first. */
  def rollupTopK(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_top_k_estimate(approx_top_k_combine(topk_sketch), $k)")
        .as("top_items"),
        sum(col("n_rows")).as("n_rows"))

  // --------------------------------------------------- quantile sketches

  /** Mergeable QUANTILE twin of [[dailySketches]]: one KLL doubles sketch
   * per (group, day) — persisted once, any coarser percentile rollup is a
   * sketch union, never a rescan (the property approx_percentile lacks:
   * its GK summaries aren't re-mergeable from a saved table). Custom
   * [[graft.functions.KllExpressions]] aggregate — Spark 4 ships HLL and
   * top-k sketch aggs but no quantile sketch. */
  def dailyQuantileSketches(df: DataFrame, timeCol: String, valueCol: String,
      groupCols: Seq[String], k: Int = graft.functions.KllExpressions.defaultK): DataFrame = {
    val day = floor(col(timeCol).cast("long") / 86400L).cast("long") * 86400L
    df.groupBy((groupCols.map(col) :+ day.as("day_s")): _*)
      .agg(graft.functions.KllExpressions
          .kllSketchAgg(col(valueCol).cast("double"), k).as("qsketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Percentile column name from the full quantile value — `0.5` → `p50`,
   * `0.995` → `p99_5` — so close quantiles can never collide (the rounded
   * `p${(q*100).round}` scheme mapped both 0.995 and 1.0 to `p100`).
   * Decimal-exact via the string form: `0.995 * 100` in binary floats is
   * 99.50000000000001. */
  private def pName(quantile: Double): String =
    "p" + (BigDecimal(quantile.toString) * 100)
      .underlying.stripTrailingZeros.toPlainString.replace(".", "_")

  /** Roll daily quantile sketches to a coarser grain and extract the asked
   * quantiles — touches only the sketch table. `k` must match the k the
   * sketches were built with ([[dailyQuantileSketches]]): merging at a
   * smaller k silently downsamples every input sketch to the coarser
   * accuracy, so the caller's build-time accuracy spend would be lost. */
  def rollupQuantiles(sketches: DataFrame, groupCols: Seq[String],
      quantiles: Seq[Double],
      k: Int = graft.functions.KllExpressions.defaultK): DataFrame = {
    val merged = sketches.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KllExpressions.kllMergeAgg(col("qsketch"), k).as("merged"),
        sum(col("n_rows")).as("n_rows"))
    val qCols = quantiles.map(q => graft.functions.KllExpressions
      .kllQuantile(col("merged"), q).as(pName(q)))
    merged.select((groupCols.map(col) ++ qCols :+ col("n_rows")): _*)
  }

  // ------------------------------------------------------- theta sketches

  /** Mergeable SET-OPERATION twin of [[dailySketches]]: one Theta sketch
   * per (group, day) ([[graft.functions.ThetaExpressions]]). HLL answers
   * "how many distinct"; the Theta table additionally answers INTERSECTION
   * and DIFFERENCE between any two sketched groups — audience overlap,
   * train/val split leakage, cross-source key sharing — without ever
   * re-scanning raw data or sketching pairs up front. */
  def dailyThetaSketches(df: DataFrame, timeCol: String, keyCol: String,
      groupCols: Seq[String],
      lgK: Int = graft.functions.ThetaExpressions.defaultLgK): DataFrame = {
    val day = floor(col(timeCol).cast("long") / 86400L).cast("long") * 86400L
    df.groupBy((groupCols.map(col) :+ day.as("day_s")): _*)
      .agg(graft.functions.ThetaExpressions.thetaSketchAgg(col(keyCol), lgK)
          .as("theta_sketch"),
        count(lit(1)).as("n_rows"))
  }

  /**
   * Pairwise key-overlap matrix between the groups of `groupCol`: for every
   * unordered group pair (a < b), the distinct-key counts of each side,
   * their intersection, union, exclusive-to-a count, and Jaccard — the
   * "how much audience do these segments share" / "how many keys leak
   * across splits" question.
   *
   * Shape: ONE pass over raw data into per-group Theta sketches (map-side
   * partial union, ≤ groups × 2^lgK bytes out), then the pair grid is a
   * broadcast self-join over the GROUPS-row sketch table — all set algebra
   * runs on sketches, so cost is groups² × sketch size, independent of raw
   * data volume. Estimates are EXACT while per-group distinct counts stay
   * under 2^lgK (counts here are emitted as rounded longs, which is what
   * makes the query oracle-checkable at test scale); above resolution they
   * carry DataSketches' ~2% error, spec-pinned.
   */
  def groupOverlap(df: DataFrame, groupCol: String, keyCol: String,
      lgK: Int = graft.functions.ThetaExpressions.defaultLgK): DataFrame = {
    import graft.functions.ThetaExpressions._
    val sk = df.groupBy(col(groupCol))
      .agg(thetaSketchAgg(col(keyCol), lgK).as("sk"))
    val a = sk.select(col(groupCol).as("type_a"), col("sk").as("sk_a"))
    val b = sk.select(col(groupCol).as("type_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        round(thetaEstimate(col("sk_a"))).cast("long").as("n_a"),
        round(thetaEstimate(col("sk_b"))).cast("long").as("n_b"),
        round(thetaIntersectEstimate(col("sk_a"), col("sk_b")))
          .cast("long").as("n_inter"),
        round(thetaUnionEstimate(col("sk_a"), col("sk_b"), lgK))
          .cast("long").as("n_union"),
        round(thetaAnotBEstimate(col("sk_a"), col("sk_b")))
          .cast("long").as("n_only_a"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / col("n_union"), 6) + lit(0.0))
  }

  /** [[rollupTopK]] flattened to scalar columns — one row per (group, rank).
   * Downstream consumers (and the verify harness) that can't handle nested
   * arrays get the same information as (rank, item, item_count) rows;
   * rank is 1-based in estimate order (heaviest first). */
  /** Flat (rank, item, item_count) rows with a TOTAL tie order. The
   * sketch's own estimate order breaks count ties by internal insertion
   * order — nondeterministic across partitionings AND capable of cutting a
   * boundary tie arbitrarily (the r16 late-corpus sweep caught exactly
   * that: three items tied at the k-boundary, a different two survived
   * than the oracle's). So: over-fetch EVERY tracked item (bounded by
   * `maxItemsTracked`, a ≤1024-row array per group — free at any corpus
   * size), then rank by (count DESC, item ASC) and cut at k — the same
   * total order any exact SQL replay uses. */
  def rollupTopKFlat(sketches: DataFrame, groupCols: Seq[String], k: Int,
      maxItemsTracked: Int = 1024): DataFrame = {
    // `maxItemsTracked` is COUPLED to the accumulate-time `maxItems` of
    // [[dailyTopKSketches]] (defaults match): approx_top_k_estimate rejects
    // an over-fetch larger than what the sketches tracked, so pass the
    // build-time value through when it was non-default. And the over-fetch
    // exists to impose the total (count DESC, item ASC) order below — it
    // must never silently shrink beneath the caller's k.
    require(k <= maxItemsTracked,
      s"rollupTopKFlat: k=$k exceeds maxItemsTracked=$maxItemsTracked — " +
        "items beyond the sketch's tracked set cannot be ranked; raise " +
        "maxItems at accumulate time (dailyTopKSketches) and pass it through")
    if (groupCols.isEmpty) {
      // global grain: the rollup merges to ONE sketch row, so impose the
      // total order INSIDE its bounded array (array_sort comparator) and
      // number by posexplode position — a pure map over one row. No window
      // at all: Window.partitionBy() with no columns (or with a lit(0) the
      // Spark 4 optimizer folds away) plans an unpartitioned WindowExec
      // and its "No Partition Defined" warning; here even the constant-key
      // exchange is unnecessary.
      // Null-safe total order (ADVICE r17): a tracked null item would make
      // every item comparison null and fall through to otherwise(0) —
      // nondeterministic placement among count-ties. approx_top_k skips
      // nulls so none should appear, but the comparator must not depend on
      // that: order a null item AFTER any non-null at the same count.
      val byCountDescItemAsc = (l: Column, r: Column) =>
        when(l.getField("count") > r.getField("count"), lit(-1))
          .when(l.getField("count") < r.getField("count"), lit(1))
          .when(l.getField("item").isNull && r.getField("item").isNull, lit(0))
          .when(l.getField("item").isNull, lit(1))
          .when(r.getField("item").isNull, lit(-1))
          .when(l.getField("item") < r.getField("item"), lit(-1))
          .when(l.getField("item") > r.getField("item"), lit(1))
          .otherwise(lit(0))
      rollupTopK(sketches, groupCols, maxItemsTracked)
        .select(posexplode(array_sort(col("top_items"), byCountDescItemAsc)),
          col("n_rows"))
        .filter(col("pos") < k)
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.item").as("item"),
          col("col.count").cast("long").as("item_count"),
          col("n_rows"))
    } else {
      val exploded = rollupTopK(sketches, groupCols, maxItemsTracked)
        .select((groupCols.map(col) :+ explode(col("top_items")).as("entry") :+
          col("n_rows")): _*)
        .select((groupCols.map(col) :+ col("entry.item").as("item") :+
          col("entry.count").cast("long").as("item_count") :+ col("n_rows")): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*)
        .orderBy(col("item_count").desc, col("item"))
      exploded.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select((groupCols.map(col) :+ col("rank") :+ col("item") :+
          col("item_count") :+ col("n_rows")): _*)
    }
  }
}
