package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series reshaping operators over an event log: regular-grid resampling
 * with gap filling (forward fill), and SCD2-style validity-interval
 * reconstruction (collapse consecutive equal states into [from, to) rows).
 * Neither exists as a Spark built-in shape; both compose from `sequence` /
 * window functions, so they stay codegen'd and shuffle only on the entity
 * key.
 *
 * Scale notes (100 TB rules):
 *   - the resample grid is generated PER ENTITY from its own [min, max] span
 *     (`sequence` + explode) — grid size ∝ Σ per-entity spans, never
 *     entities × global span; a single long-lived entity cannot blow up
 *     every other entity's row count;
 *   - all window functions partition by the entity key — no global sort, no
 *     single-partition window (WindowExec warns loudly on those);
 *   - forward fill is `last(value, ignoreNulls)` over rows between
 *     unboundedPreceding and current — Spark evaluates it in one pass per
 *     partition without buffering the frame.
 */
object TimeSeries {

  /** Fixed-width sortable string key for "latest row wins" tie-breaks that
   * must hash-match an engine whose arg_max takes only scalar keys: epoch
   * seconds and a row id, zero-padded so VARCHAR order == numeric order.
   * The epoch is offset by 10^11 BEFORE padding — zero-padding a negative
   * number breaks lexicographic order ('-99' sorts above '-98'), so
   * pre-1970 timestamps would pick the WRONG "latest" row; the offset keeps
   * the key non-negative for any timestamp after year -1200. Ids get the
   * same treatment as a VALIDATION, not an offset: out-of-range ids
   * (negative, or >= 10^12 and thus wider than the pad) would silently
   * break lexicographic order — and the generated oracle shares the
   * padding, so a hash compare could never catch it. raise_error is
   * codegen'd and costs one comparison per row. */
  def orderKey(ts: Column, id: Column): Column = {
    val idL = id.cast("long")
    val checkedId = when(idL < 0L || idL >= 1000000000000L,
      raise_error(concat(lit("orderKey: id out of [0, 10^12) — ordering would be wrong: "),
        idL.cast("string")))).otherwise(idL)
    concat(lpad((ts.cast("long") + 100000000000L).cast("string"), 12, "0"),
      lpad(checkedId.cast("string"), 12, "0"))
  }

  /**
   * Resample an event stream onto a daily grid per entity and
   * forward-fill: one row per (entity, day) between the entity's first and
   * last observed day; `value_filled` carries the value of the latest event
   * at or before that day (ties broken by `idCol` — deterministic).
   * Days with no event for that entity are the filled gaps.
   */
  /**
   * Exponentially time-decayed counts and sums per key, half-life form —
   * the "trending now" statistic: an event at time t weighs
   * 2^((t − t_ref)/halfLifeS) where t_ref is the corpus max timestamp, so
   * the newest event weighs 1 and weight halves every `halfLifeS` looking
   * back. One pass replaces windowed re-aggregation, and decayed state is
   * MERGEABLE across shards/days (re-referencing multiplies every weight
   * by one constant) — the sketch-family property, which is what makes
   * this the at-scale trending primitive.
   *
   * Shape: a one-row max-ts broadcast, map-side weights, one partial-
   * aggregatable keyed sum. Sums round at 4dp (float-sum order and
   * pow parity across engines — the importanceWeights rule).
   */
  def decayedCounts(df: DataFrame, keyCol: Column, tsCol: String,
      valueCol: Column, halfLifeS: Long,
      tRefEpochS: Option[Long] = None): DataFrame = {
    require(halfLifeS > 0, s"decayedCounts: halfLifeS must be positive, got $halfLifeS")
    val w = pow(lit(2.0),
      (col(tsCol).cast("long") - col("t_ref")).cast("double") /
        lit(halfLifeS.toDouble))
    // An explicit reference time makes the weights a STATELESS projection:
    // streaming-legal (plain update-mode agg, no data-dependent scalar) and
    // shard-mergeable (decayed sums with one tRef add exactly). Without it,
    // tRef = max ts — the batch "as of now" convenience, one-row broadcast.
    val referenced = tRefEpochS match {
      case Some(t) => df.withColumn("t_ref", lit(t))
      case None =>
        df.crossJoin(broadcast(df.agg(max(col(tsCol).cast("long")).as("t_ref"))))
    }
    referenced
      .groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(w), 4) + lit(0.0)).as("decayed_n"),
        (round(sum(w * valueCol), 4) + lit(0.0)).as("decayed_sum"))
  }

  /**
   * First-order Markov transition matrix over per-entity event sequences
   * (the product-analytics "path analysis" primitive): for each entity,
   * order events by (ts, tiebreak id) and count (state → next state)
   * adjacencies; p is the row-normalized transition probability.
   * Output: (from_type, to_type, n, p).
   *
   * Shape: ONE window (lead) partitioned by entity — partition size is one
   * entity's history, no global sort — then two partial-aggregatable
   * aggregates over the (from, to) pairs (≤ states² rows). p is an
   * exact-int ratio: engine-stable with no rounding.
   */
  def transitionMatrix(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("tot")).as("p"))
  }

  /**
   * Top user journeys: each entity's first `k` event types (ordered by
   * (ts, tiebreak id)) concatenated into a path string `A>B>C`, counted
   * across entities, top `topN` paths by frequency (ties broken by path —
   * deterministic). The product-analytics "common paths" report, and the
   * sequence-frequency twin of [[transitionMatrix]] (which only sees
   * adjacent pairs).
   *
   * Shape: one row_number window partitioned by entity (partition = one
   * entity's history), a per-entity ordered collect (≤ k rows each,
   * assembled with the same array_sort-of-struct trick as
   * [[graft.operators.Dedup.paragraphDedupGlobal]] — no second window),
   * one partial-aggregatable path count, and a TakeOrdered top-N (no
   * global sort materialization).
   */
  def topPaths(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, typeCol: String, k: Int = 5, topN: Int = 20): DataFrame = {
    require(k >= 1, s"topPaths: k must be >= 1, got $k")
    require(topN >= 1, s"topPaths: topN must be >= 1, got $topN")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
    val paths = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(entityCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
          x => x.getField("t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_entities"))
    BoundedRank.withRank(
      paths.orderBy(col("n_entities").desc, col("path")).limit(topN),
      col("path"), Seq(col("n_entities").desc, col("path")))
  }

  /**
   * CUSUM change-point detection (Page 1954) on per-entity daily totals:
   * flags days where the one-sided cumulative sum of deviations above the
   * entity's own mean exceeds `threshold`, i.e. a sustained upward shift —
   * the monitoring primitive behind "this user/key changed behavior".
   *
   * The textbook recursion S_i = max(0, S_{i-1} + (x_i − μ − slack)) is not
   * a prefix sum, but it has the closed form S_i = P_i − min(0, min_{j≤i}
   * P_j) with P the plain cumsum of deviations — so the whole thing is TWO
   * stock window functions (running sum + running min) per entity instead
   * of an order-dependent recursive state. Windows partition by entity
   * (partition = one entity's day count); daily totals and the per-entity
   * mean are partial-aggregatable hash aggregates. Sums round at 4dp
   * before the scan (float-sum order across engines — the
   * importanceWeights rule); the scan itself is then order-deterministic.
   *
   * Output: (entity, day, x, cusum, changepoint).
   */
  def cusum(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, slack: Double, threshold: Double): DataFrame = {
    require(threshold > 0, s"cusum: threshold must be positive, got $threshold")
    val daySec = 86400L
    val daily = df
      .groupBy(col(entityCol),
        floor(col(tsCol).cast("long") / daySec).cast("long").as("day"))
      .agg((round(sum(col(valueCol)), 4) + lit(0.0)).as("x"))
    val mu = daily.groupBy(col(entityCol))
      .agg((round(avg(col("x")), 4) + lit(0.0)).as("mu"))
    val scan = Window.partitionBy(col(entityCol)).orderBy(col("day"))
    daily.join(mu, entityCol)
      .withColumn("__p", sum(col("x") - col("mu") - lit(slack)).over(scan))
      .withColumn("cusum",
        (round(col("__p") - least(lit(0.0), min(col("__p")).over(scan)), 4)
          + lit(0.0)))
      .withColumn("changepoint", col("cusum") > threshold)
      .select(col(entityCol), col("day"), col("x"), col("cusum"),
        col("changepoint"))
  }

  /**
   * Gap-based sessionization: split each entity's event stream into
   * sessions wherever the gap to the previous event exceeds `gapS`
   * seconds, and aggregate per session — the web-analytics primitive
   * behind "session duration / events per session / bounce rate".
   *
   * Shape: one lag window + one running-sum window (both partition by the
   * entity key — partition size = one entity's history, no global sort),
   * then a partial-aggregatable (entity, session) hash aggregate. All
   * arithmetic is integer epoch-seconds — nothing to round, hash-stable
   * across engines by construction.
   *
   * Output: (entity, session_seq (1-based per entity), n_events,
   * start_s, end_s, duration_s).
   *
   * AUTO-ROUTES past the hot-key straggler (r16, the `autoCellCount`
   * precedent): the plain one-window-task-per-entity plan makes a key
   * owning fraction f of the corpus f·P× the median task at P partitions
   * (zipf1 SkewAudit: 3.56× at 32 partitions, 15.06× at 200 — and it
   * GROWS with P, inverting scale-out). So by default any entity owning
   * more than `hotFraction` of the rows is routed through
   * [[sessionizeTriaged]]'s distributed bucket scan; when no key crosses
   * the threshold, the plain plan runs untouched. The detection is EAGER:
   * the default path runs ONE Spark probe job at call time (a partial-
   * aggregatable key-count scan folded to a single (total, max-key-count)
   * row — the total rides the same aggregate, so there is no separate
   * count() job), which recomputes the upstream plan once. Output is
   * identical either way (TimeSeriesSpec pins the boundary). Callers who
   * already know their key distribution — or whose upstream is expensive
   * and un-cached — skip the probe three ways (the hammingPairs `nRows`
   * one-discipline rule): thread BOTH `nRows` (total rows) and
   * `maxKeyRows` (rows of the heaviest key) and the route is decided from
   * those numbers with ZERO probe jobs; opt out with `hotFraction <= 0`
   * (exactly the plain plan); or call [[sessionizeTriaged]] directly.
   * Threaded counts may be estimates — both routes are output-identical,
   * so a stale estimate costs straggler time, never correctness — but the
   * triage threshold derives from `nRows`, so thread honest magnitudes.
   */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, gapS: Long, hotFraction: Double = 0.05,
      bucketS: Long = 3600L, nRows: Long = -1L,
      maxKeyRows: Long = -1L): DataFrame = {
    require(gapS > 0, s"sessionize: gapS must be positive, got $gapS")
    if (!(hotFraction > 0))
      return sessionizePlain(df, entityCol, tsCol, idCol, gapS)
    val (total, maxn) =
      if (nRows >= 0L && maxKeyRows >= 0L) (nRows, maxKeyRows)
      else {
        // one probe job, not two: sum(per-key counts) IS the row total, so
        // the grouped scan that finds the max key also carries it. The
        // grouped frame never reaches the driver — only the folded row.
        val probe = df.groupBy(col(entityCol)).agg(count(lit(1)).as("__n"))
          .agg(sum(col("__n")).as("__total"), max(col("__n")).as("__maxn"))
          .collect()(0)
        if (probe.isNullAt(0)) (0L, 0L) else (probe.getLong(0), probe.getLong(1))
      }
    if (total == 0L)
      return sessionizePlain(df, entityCol, tsCol, idCol, gapS)
    val th = math.max(1L, (total * hotFraction).toLong)
    if (maxn > th)
      sessionizeTriaged(df, entityCol, tsCol, idCol, gapS, th, bucketS)
    else sessionizePlain(df, entityCol, tsCol, idCol, gapS)
  }

  /** The plain two-window sessionize plan — optimal on skew-free keys,
   * f·P-straggler-prone on hot ones (see [[sessionize]]'s routing). */
  def sessionizePlain(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, gapS: Long): DataFrame = {
    require(gapS > 0, s"sessionize: gapS must be positive, got $gapS")
    // order by the TRUNCATED epoch seconds (+ id tiebreak), not raw ts:
    // the truncation is what downstream aggregates see, and an oracle on
    // epoch seconds must replay the exact same (t, id) order
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__t"), col(idCol))
    df.select(col(entityCol), col(idCol),
        col(tsCol).cast("long").as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__t") - col("__prev") > gapS, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(w))
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__t")).as("start_s"),
        max(col("__t")).as("end_s"),
        (max(col("__t")) - min(col("__t"))).as("duration_s"))
  }

  /**
   * Skew-proof gap sessionization — identical output to [[sessionize]],
   * but entities whose event count exceeds `hotThreshold` are routed OUT
   * of the one-task-per-entity window path. Session semantics pin every
   * event of an entity to one ordered stream, so a key owning fraction f
   * of the corpus makes the plain path's hot task f·P× the median at P
   * partitions (the zipf1 SkewAudit measured 3.56× at 32 partitions,
   * ~20× at 200) — not salt-able, and AQE cannot split required hash
   * partitioning under a window. The triage path parallelizes the hot
   * keys with the classic DISTRIBUTED PREFIX SCAN:
   *
   *  1. bucket hot events by `bucketS` of event time and sessionize each
   *     (entity, bucket) locally — the hot entity now spans
   *     span/bucketS tasks instead of one;
   *  2. fold each bucket to one row (first/last timestamp, count of
   *     internal session starts) and scan THAT tiny per-entity bucket
   *     table with a window: whether a bucket's first event opens a new
   *     session (gap from the previous bucket's last event) and the
   *     bucket's cumulative session offset;
   *  3. broadcast the bucket table back onto the events: each event's
   *     session_seq = bucket offset + bucket-start flag + its local
   *     prefix of internal starts. The final per-(entity, session)
   *     aggregate hashes on BOTH keys, so it spreads too.
   *
   * Hot-set size is bounded by construction (≤ totalRows/hotThreshold
   * keys) and the bucket table by hotKeys × span/bucketS rows — both
   * broadcast-safe when hotThreshold is a corpus FRACTION (rows/20
   * bounds the set at 20 keys regardless of scale). Cold entities take
   * the plain path unchanged. Precondition: non-null event times (the
   * two paths order SQL NULLs differently).
   *
   * `bucketS` must make the bucket count ≫ the shuffle partition count:
   * (entity, bucket) keys HASH onto partitions, so with only ~P buckets
   * the law of small numbers re-concentrates the hot key (the spec
   * measured 11 of 14 day-buckets hashing onto one of 4 partitions —
   * most of the straggler back). Hour buckets give a month-long corpus
   * ~720 buckets, smooth at any realistic P; the per-(entity, bucket)
   * local sort this costs is gap-free inside one hour of one entity.
   */
  def sessionizeTriaged(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, gapS: Long, hotThreshold: Long,
      bucketS: Long = 3600L): DataFrame = {
    require(gapS > 0, s"sessionizeTriaged: gapS must be positive, got $gapS")
    require(hotThreshold > 0 && bucketS > 0,
      s"sessionizeTriaged: hotThreshold/bucketS must be positive")
    val base = df.select(col(entityCol), col(idCol),
      col(tsCol).cast("long").as("__t"))
    val hot = base.groupBy(col(entityCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold).select(col(entityCol))
    val cold = sessionizePlain(base.join(broadcast(hot), Seq(entityCol), "left_anti"),
      entityCol, "__t", idCol, gapS)
    // hot path: per-(entity, time-bucket) local sessionization
    val wLoc = Window.partitionBy(col(entityCol), col("__b"))
      .orderBy(col("__t"), col(idCol))
    val loc = base.join(broadcast(hot), Seq(entityCol), "left_semi")
      .withColumn("__b", floor(col("__t") / lit(bucketS.toDouble)).cast("long"))
      .withColumn("__prev", lag(col("__t"), 1).over(wLoc))
      // a bucket's FIRST event is scored in step 2 (needs the previous
      // bucket's last event); internal events score locally
      .withColumn("__inew", when(col("__prev").isNotNull &&
        col("__t") - col("__prev") > gapS, 1L).otherwise(lit(0L)))
      .withColumn("__lpre", sum(col("__inew")).over(wLoc))
    val wB = Window.partitionBy(col(entityCol)).orderBy(col("__b"))
    val buckets = loc.groupBy(col(entityCol), col("__b"))
      .agg(min(col("__t")).as("__first_t"), max(col("__t")).as("__last_t"),
        sum(col("__inew")).as("__isum"))
      .withColumn("__prev_last", lag(col("__last_t"), 1).over(wB))
      .withColumn("__fnew", when(col("__prev_last").isNull ||
        col("__first_t") - col("__prev_last") > gapS, 1L).otherwise(0L))
      .withColumn("__off", coalesce(
        sum(col("__fnew") + col("__isum"))
          .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val hotSessions = loc
      .join(broadcast(buckets.select(col(entityCol), col("__b"),
        col("__fnew"), col("__off"))), Seq(entityCol, "__b"))
      .withColumn("session_seq", col("__off") + col("__fnew") + col("__lpre"))
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__t")).as("start_s"),
        max(col("__t")).as("end_s"),
        (max(col("__t")) - min(col("__t"))).as("duration_s"))
    cold.unionByName(hotSessions)
  }

  /**
   * Seasonal-naive forecast backtest per entity: daily totals are
   * "forecast" by the value one season (`seasonDays`) earlier, scored
   * against the naive lag-1 forecast — the standard sanity baseline every
   * real forecasting model must beat, and the denominator of MASE
   * (Hyndman & Koehler 2006, "Another look at measures of forecast
   * accuracy"). Reports per entity: day counts, both MAEs, and
   * mase = MAE_seasonal / MAE_naive1 (< 1 ⇒ the series is genuinely
   * seasonal at that period; NULL when the naive MAE is 0 or nothing is
   * scorable).
   *
   * Shape: one partial-aggregatable (entity, day) total, then two
   * self-joins of that (entity-count × day-span)-sized daily table against
   * day-shifted copies of itself — CALENDAR lags, not row lags, so a
   * missing day never silently shifts the season (a row-based `lag(7)`
   * reads "7 observations ago", which is only "one week ago" when the
   * series is gapless). Days whose shifted day is absent are excluded
   * from that MAE (the join is left, `avg` skips NULLs). Daily totals are
   * rounded to 4 digits before the lags (the [[cusum]] idiom) so every
   * downstream |error| is a difference of identically-rounded doubles —
   * hash-stable across engines.
   */
  def seasonalNaiveBacktest(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, seasonDays: Int = 7): DataFrame = {
    require(seasonDays >= 2,
      s"seasonalNaiveBacktest: seasonDays must be >= 2, got $seasonDays")
    val daySec = 86400L
    val daily = df
      .groupBy(col(entityCol),
        floor(col(tsCol).cast("long") / daySec).cast("long").as("day"))
      .agg((round(sum(col(valueCol)), 4) + lit(0.0)).as("y"))
    def shifted(by: Int, as: String): DataFrame = daily.select(
      col(entityCol), (col("day") + by).as("day"), col("y").as(as))
    val scored = daily
      .join(shifted(seasonDays, "__ys"), Seq(entityCol, "day"), "left")
      .join(shifted(1, "__y1"), Seq(entityCol, "day"), "left")
    scored.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_days"),
        count(col("__ys")).as("n_scored"),
        (round(avg(abs(col("y") - col("__ys"))), 4) + lit(0.0)).as("mae_seasonal"),
        (round(avg(abs(col("y") - col("__y1"))), 4) + lit(0.0)).as("mae_naive1"))
      .withColumn("mase",
        when(col("mae_naive1") > 0,
          round(col("mae_seasonal") / col("mae_naive1"), 4) + lit(0.0)))
  }

  def gapFillDaily(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val daySec = 86400L
    val day = floor(col(tsCol).cast("long") / daySec).cast("long")
    // latest observed value per (entity, day)
    val daily = df.filter(col(tsCol).isNotNull)
      .select(col(entityCol).as("entity"), day.as("day_n"),
        col(valueCol).as("v"), orderKey(col(tsCol), col(idCol)).as("ok"))
      .groupBy(col("entity"), col("day_n"))
      .agg(max_by(col("v"), col("ok")).as("day_value"))
    // per-entity daily grid over its own observed span
    val grid = daily.groupBy(col("entity"))
      .agg(min(col("day_n")).as("d0"), max(col("day_n")).as("d1"))
      .select(col("entity"), explode(sequence(col("d0"), col("d1"))).as("day_n"))
    val w = Window.partitionBy(col("entity")).orderBy(col("day_n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("entity", "day_n"), "left")
      .select(col("entity"), (col("day_n") * daySec).as("day_s"),
        col("day_value").isNotNull.as("observed"),
        last(col("day_value"), ignoreNulls = true).over(w).as("value_filled"))
  }

  /**
   * SCD2 reconstruction: collapse an entity's event sequence into validity
   * intervals of its `stateCol` — one row per run of consecutive equal
   * states, `valid_from` = first event of the run, `valid_to` = first event
   * of the NEXT run (NULL while current). The standard
   * change-detection-then-lead formulation; both windows partition by the
   * entity, ordered by (ts, id) for determinism under equal timestamps.
   */
  def scd2(df: DataFrame, entityCol: String, tsCol: String, idCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col("entity")).orderBy(col("ts_s"), col("id"))
    val events = df.filter(col(tsCol).isNotNull)
      .select(col(entityCol).as("entity"), col(tsCol).cast("long").as("ts_s"),
        col(idCol).as("id"), col(stateCol).as("state"))
    val changes = events
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      // null-safe inequality: a NULL state starting the sequence is a change
      .filter(not(col("state") <=> col("prev_state")))
    changes
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(w))
      .select(col("entity"), col("state"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"))
  }

  /**
   * Ordered funnel: how many entities completed each stage IN ORDER —
   * stage k counts entities with an event of type `stages(k)` strictly
   * after their stage-(k−1) completion time (first-touch semantics: the
   * earliest qualifying event per stage). The canonical conversion query.
   *
   * Shape: one conditional aggregate per stage, each a partial-aggregatable
   * `min(when(...))` keyed by the entity, chained through entity-keyed
   * joins — k stages = k narrow (entity, ts) frames, no window over the
   * event log, no per-entity event buffering. Output: (stage_idx, stage,
   * n_entities), monotonically non-increasing in stage_idx.
   */
  def funnel(df: DataFrame, entityCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val ev = df.filter(col(tsCol).isNotNull && col(entityCol).isNotNull)
      .select(col(entityCol).as("__f_e"), col(tsCol).cast("long").as("__f_ts"),
        col(typeCol).as("__f_t"))
    // each stage's reached-set is materialized: stage k's plan would
    // otherwise re-derive stages 1..k−1 (the Lloyd-loop rule — barriers
    // keep the chain linear in stages, not quadratic)
    val reachedFrames = stages.drop(1).scanLeft(
      graft.Materialize(ev.filter(col("__f_t") === stages.head)
        .groupBy(col("__f_e")).agg(min(col("__f_ts")).as("__f_prev")))) {
      (reached, st) =>
        graft.Materialize(ev.filter(col("__f_t") === st)
          .join(reached, "__f_e")
          .filter(col("__f_ts") > col("__f_prev"))
          .groupBy(col("__f_e")).agg(min(col("__f_ts")).as("__f_prev")))
    }
    reachedFrames.zip(stages).zipWithIndex.map { case ((r, st), i) =>
      r.agg(count(lit(1)).as("n_entities"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          col("n_entities"))
    }.reduce(_ unionByName _)
  }

  /**
   * Retention cohorts: entities grouped by their first-activity week
   * (cohort), counted as retained in each later week they were active —
   * the (cohort_week, week_offset) → distinct-actives matrix behind every
   * retention curve. Two aggregates (first-touch per entity, then the
   * cohort matrix) plus one entity-keyed join; distinct-actives is exact
   * `count_distinct` (swap for HLL at true scale, as a2_approx_agg does).
   */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
      maxWeeks: Int = 12): DataFrame = {
    val weekSec = 7L * 86400L
    val ev = df.filter(col(tsCol).isNotNull && col(entityCol).isNotNull)
      .select(col(entityCol).as("__r_e"),
        floor(col(tsCol).cast("long") / weekSec).cast("long").as("__r_w"))
    val first = ev.groupBy(col("__r_e")).agg(min(col("__r_w")).as("__r_c"))
    ev.join(first, "__r_e")
      .select(col("__r_e"), col("__r_c"), (col("__r_w") - col("__r_c")).as("__r_off"))
      .filter(col("__r_off") <= maxWeeks)
      .groupBy(col("__r_c"), col("__r_off"))
      .agg(count_distinct(col("__r_e")).as("n_active"))
      .select((col("__r_c") * weekSec).as("cohort_week_s"),
        col("__r_off").as("week_offset"), col("n_active"))
  }
}
