package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.sources.Tables

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val events = Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("rolled-up sketch estimate is within HLL error of the exact distinct") {
    val daily = Sketches.dailySketches(events, "ts", "user_id", Seq("event_type"))
    val est = Sketches.rollup(daily, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Sketches.exactDistinct(events, "user_id", Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      // lgK=12 → relative standard error ~1.6%; 5% is a >3σ bound
      assert(math.abs(e - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"$k: estimate $e vs exact $ex")
    }
  }

  test("sketch union is order/partitioning independent: rollup == direct sketch") {
    val daily = Sketches.dailySketches(events, "ts", "user_id", Seq("event_type"))
    val viaDaily = Sketches.rollup(daily, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("distinct_estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDaily === direct,
      "register-max union must make the merge order invisible")
    val repartitioned = Sketches.rollup(daily.repartition(13), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repartitioned === viaDaily)
  }

  test("persisted sketch table supports incremental append + re-merge") {
    val dir = java.nio.file.Files.createTempDirectory("sketches").toString + "/t"
    val firstHalf = events.filter(dayofmonth(col("ts")) <= 15)
    val secondHalf = events.filter(dayofmonth(col("ts")) > 15)
    Sketches.dailySketches(firstHalf, "ts", "user_id", Seq("event_type"))
      .write.mode("append").parquet(dir)
    Sketches.dailySketches(secondHalf, "ts", "user_id", Seq("event_type"))
      .write.mode("append").parquet(dir)
    val merged = Sketches.rollup(spark.read.parquet(dir), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.rollup(
        Sketches.dailySketches(events, "ts", "user_id", Seq("event_type")),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
  }

  test("sketch aggregation works in a streaming window: stream estimate == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val streamed = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("distinct_estimate"))
    val q = streamed.writeStream.format("memory").queryName("sketch_stream")
      .outputMode("update").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = (1L to 500L).map(i => (ts(i * 3), i % 97, if (i % 2 == 0) "click" else "view"))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedEst = spark.table("sketch_stream")
      .groupBy("event_type").agg(max(col("distinct_estimate")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEst = rows.toDF("ts", "user_id", "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .groupBy("event_type").agg(max(col("e")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedEst === batchEst)
  }

  test("theta sketch works in a streaming window: stream estimate == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.ThetaExpressions._
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val streamed = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(thetaEstimate(thetaSketchAgg(col("user_id"))).as("est"))
    val q = streamed.writeStream.format("memory").queryName("theta_stream")
      .outputMode("update").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = (1L to 500L).map(i => (ts(i * 3), i % 97, if (i % 2 == 0) "click" else "view"))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedEst = spark.table("theta_stream")
      .groupBy("event_type").agg(max(col("est")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batchEst = rows.toDF("ts", "user_id", "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(thetaEstimate(thetaSketchAgg(col("user_id"))).as("e"))
      .groupBy("event_type").agg(max(col("e")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamedEst === batchEst)
    // below resolution the streamed estimates are EXACT distinct counts
    assert(streamedEst.values.forall(v => v == math.rint(v)))
  }

  test("KLL quantile sketch works in a streaming window: stream quantile == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double, String)](spark)
    val kll = graft.functions.KllExpressions
    val streamed = input.toDF().toDF("ts", "value", "event_type")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(kll.kllQuantile(kll.kllSketchAgg(col("value")), 0.5).as("p50"))
    val q = streamed.writeStream.format("memory").queryName("kll_stream")
      .outputMode("update").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = (1L to 500L).map(i =>
      (ts(i * 3), (i % 101).toDouble, if (i % 2 == 0) "click" else "view"))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedP50 = spark.table("kll_stream")
      .groupBy("event_type").agg(max(col("p50")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // same data, same single-batch accumulation order → same estimate,
    // modulo the per-window split which both paths share
    val batchP50 = rows.toDF("ts", "value", "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(kll.kllQuantile(kll.kllSketchAgg(col("value")), 0.5).as("p"))
      .groupBy("event_type").agg(max(col("p")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamedP50.keySet === batchP50.keySet)
    for ((t, s) <- streamedP50)
      assert(math.abs(s - batchP50(t)) <= 101 * 0.05,
        s"$t: streamed $s vs batch ${batchP50(t)}")
  }

  test("top-k sketch rollup returns EXACT heavy-hitter counts while domain fits maxItems") {
    val filtered = events.filter(col("ts").isNotNull && col("props").isNotNull)
    val daily = Sketches.dailyTopKSketches(filtered, "ts", "props", Seq("event_type"))
    val rolled = Sketches.rollupTopK(daily, Seq("event_type"), k = 5)
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getLong(1)))
      }.toMap
    // exact top-5 per type from a plain groupBy — counts must MATCH exactly
    // (category domain << maxItems=1024, so the sketch never evicts)
    val exact = filtered.groupBy(col("event_type"), col("props")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(x => (x._2, x._3)).sortBy(x => (-x._2, x._1)).take(5).toSeq
      }
    assert(rolled.keySet === exact.keySet)
    rolled.foreach { case (t, items) =>
      assert(items.map(_._2).toSeq === exact(t).map(_._2).toSeq,
        s"$t: sketch counts ${items.toSeq} vs exact ${exact(t)}")
      // same multiset of items at each count level (ties may order differently)
      assert(items.map(_._1).toSet === exact(t).map(_._1).toSet ||
        items.map(_._2).toSeq === exact(t).map(_._2).toSeq)
    }
  }

  test("top-k sketch combine is merge-invariant: daily rollup == direct accumulate") {
    val filtered = events.filter(col("ts").isNotNull && col("props").isNotNull)
    val viaDaily = Sketches.rollupTopK(
        Sketches.dailyTopKSketches(filtered, "ts", "props", Seq("event_type")),
        Seq("event_type"), k = 5)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1))).toSeq).toMap
    val direct = filtered.groupBy(col("event_type"))
      .agg(expr("approx_top_k_estimate(approx_top_k_accumulate(props, 1024), 5)").as("top_items"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1))).toSeq).toMap
    assert(viaDaily.keySet === direct.keySet)
    viaDaily.foreach { case (t, items) =>
      val d = direct(t)
      assert(items.map(_._2) === d.map(_._2), s"$t counts differ")
      // A count tie straddling rank k makes any tied member a legal top-k
      // pick (the events corpus has a 4-way tie at the purchase k=5
      // boundary), so item identity is only pinned ABOVE the tie boundary:
      // items whose count strictly exceeds the k-th count must agree.
      val boundary = items.map(_._2).min
      assert(items.filter(_._2 > boundary).map(_._1).toSet ===
        d.filter(_._2 > boundary).map(_._1).toSet,
        s"$t items above tie boundary $boundary differ: " +
          s"rollup ${items.toSeq} vs direct ${d.toSeq}")
    }
  }

  test("KLL quantile sketch rollup tracks exact percentiles within rank error") {
    val clean = events.filter(col("ts").isNotNull && col("value").isNotNull)
    val daily = Sketches.dailyQuantileSketches(clean, "ts", "value", Seq("event_type"))
    val est = Sketches.rollupQuantiles(daily, Seq("event_type"), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = clean.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.9)").as("p90"),
        count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(est.keySet === exact.keySet)
    for ((t, (e50, e90)) <- est) {
      val (x50, x90, _, lo, hi) = exact(t)
      // k=200 → ~1.65% rank error; translate to a generous VALUE tolerance
      // via the group's value range (values are roughly uniform here)
      val tol = (hi - lo) * 0.05
      assert(math.abs(e50 - x50) <= tol, s"$t p50: sketch $e50 vs exact $x50")
      assert(math.abs(e90 - x90) <= tol, s"$t p90: sketch $e90 vs exact $x90")
    }
  }

  test("quantile rollup names distinguish close quantiles and honor the build-time k") {
    val clean = events.filter(col("ts").isNotNull && col("value").isNotNull)
    // p99.5 and p100 must get distinct column names (the old rounded scheme
    // mapped both to p100); fractional quantiles use '_' for the point
    val named = Sketches.rollupQuantiles(
      Sketches.dailyQuantileSketches(clean, "ts", "value", Seq("event_type")),
      Seq("event_type"), Seq(0.5, 0.995, 1.0))
    assert(named.columns.toSeq === Seq("event_type", "p50", "p99_5", "p100", "n_rows"))
    // k threads build → merge: a k=800 build rolled up at k=800 must keep
    // the tighter rank error (vs the default-200 merge silently downsampling)
    val bigK = 800
    val est = Sketches.rollupQuantiles(
        Sketches.dailyQuantileSketches(clean, "ts", "value", Seq("event_type"), k = bigK),
        Seq("event_type"), Seq(1.0), k = bigK)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // q=1.0 is exact for any KLL sketch (max is always retained) — the test
    // is that the k=800 sketches survive the merge without error
    val exactMax = clean.groupBy(col("event_type")).agg(max("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est === exactMax)
  }

  test("KLL merge is order-tolerant: daily rollup ≈ direct whole-corpus sketch") {
    val clean = events.filter(col("ts").isNotNull && col("value").isNotNull)
    val viaDaily = Sketches.rollupQuantiles(
        Sketches.dailyQuantileSketches(clean, "ts", "value", Seq("event_type")),
        Seq("event_type"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // direct: one sketch per type, no daily grain (different merge order)
    val direct = clean.groupBy(col("event_type"))
      .agg(graft.functions.KllExpressions
        .kllSketchAgg(col("value").cast("double")).as("qsketch"))
      .select(col("event_type"),
        graft.functions.KllExpressions.kllQuantile(col("qsketch"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ranges = clean.groupBy(col("event_type"))
      .agg((max("value") - min("value")).as("range"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((t, d) <- viaDaily)
      assert(math.abs(d - direct(t)) <= ranges(t) * 0.05,
        s"$t: daily-merged $d vs direct ${direct(t)}")
  }

  test("theta overlap is EXACT below sketch resolution") {
    import spark.implicits._
    // two segments over a shared key space with a known intersection:
    // a = [0, 300), b = [200, 700) → inter 100, union 700, a-only 200
    val df = ((0L until 300L).map(k => ("a", k)) ++
      (200L until 700L).map(k => ("b", k))).toDF("seg", "k")
      .repartition(7) // partitioning must not matter
    val row = Sketches.groupOverlap(df, "seg", "k").collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getAs[String]("type_a") === "a" && r.getAs[String]("type_b") === "b")
    assert(r.getAs[Long]("n_a") === 300L && r.getAs[Long]("n_b") === 500L)
    assert(r.getAs[Long]("n_inter") === 100L)
    assert(r.getAs[Long]("n_union") === 700L)
    assert(r.getAs[Long]("n_only_a") === 200L)
    assert(math.abs(r.getAs[Double]("jaccard") - 100.0 / 700.0) < 1e-6)
  }

  test("theta overlap stays error-bounded ABOVE sketch resolution") {
    import spark.implicits._
    // 20k distinct per side ≫ 2^12 nominal entries → sampling regime.
    // a = [0, 20k), b = [10k, 30k) → inter 10k, union 30k
    val df = ((0L until 20000L).map(k => ("a", k)) ++
      (10000L until 30000L).map(k => ("b", k))).toDF("seg", "k")
    val r = Sketches.groupOverlap(df, "seg", "k").collect().head
    def ok(got: Long, want: Long, tol: Double) =
      assert(math.abs(got - want) <= want * tol, s"got $got want $want ±${tol * 100}%")
    ok(r.getAs[Long]("n_a"), 20000L, 0.05)
    ok(r.getAs[Long]("n_b"), 20000L, 0.05)
    ok(r.getAs[Long]("n_union"), 30000L, 0.05)
    // intersection error compounds both sketches' sampling → looser bound
    ok(r.getAs[Long]("n_inter"), 10000L, 0.10)
    ok(r.getAs[Long]("n_only_a"), 10000L, 0.10)
  }

  test("theta union is merge-order invariant: daily rollup == direct sketch") {
    import graft.functions.ThetaExpressions._
    val daily = Sketches.dailyThetaSketches(
      events.filter(col("ts").isNotNull), "ts", "user_id", Seq("event_type"))
    val rolled = daily.groupBy(col("event_type"))
      .agg(thetaEstimate(thetaMergeAgg(col("theta_sketch"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = events.filter(col("ts").isNotNull).groupBy(col("event_type"))
      .agg(thetaEstimate(thetaSketchAgg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // theta union keeps hashes below min(theta) — a set property, so the
    // rollup is not merely close, it is IDENTICAL to the direct sketch
    assert(rolled === direct)
    // and at sf0.01 cardinalities (150/type ≪ 4096) estimates are exact
    val exact = Sketches.exactDistinct(
      events.filter(col("ts").isNotNull), "user_id", Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) => assert(rolled(k) === ex.toDouble, k) }
  }

  test("approx_percentile stays within the documented rank-error bound") {
    val sorted = events.filter(col("value").isNotNull)
      .filter(col("event_type") === "click")
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val approx = events.filter(col("value").isNotNull)
      .filter(col("event_type") === "click")
      .agg(expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"))
      .collect()(0).getSeq[Double](0)
    val n = sorted.length
    Seq(0.5, 0.9, 0.99).zip(approx).foreach { case (q, v) =>
      // GK guarantees SOME rank of the returned value is within eps*n of
      // the target — with duplicates a value occupies a rank INTERVAL, so
      // measure the distance from [minRank, maxRank] to the target (a tie
      // group straddling the quantile boundary is still a pass)
      val maxRank = sorted.count(_ <= v)
      val minRank = sorted.count(_ < v) + 1
      val target = q * n
      val dist =
        if (target < minRank) minRank - target
        else if (target > maxRank) target - maxRank
        else 0.0
      assert(dist <= n / 10000.0 + 1,
        s"q=$q approx=$v ranks=[$minRank,$maxRank] target=$target n=$n")
    }
  }
}
