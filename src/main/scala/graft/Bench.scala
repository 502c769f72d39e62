package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = ClusterMode.configure(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // catalog buffers are small bounded sets → safe to keep grouped
      // collects hash-based to 2²² keys/task (see GraftExtensions.register)
      .config("spark.graft.objectHashFallbackThreshold", (1 << 22).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // engine-on config: functions + optimizer rules
    // JVM/codegen warmup so the first measured query doesn't absorb session
    // startup (JIT, codegen compiler init, shuffle service threads).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // One-time execution-machinery warmup on synthetic rows (never the
    // benchmark tables): broadcast join, window exec, hash-agg with
    // collect_set, the custom codegen'd expressions, and a localCheckpoint —
    // each initializes a subsystem (broadcast thread pool, window sorter,
    // Janino paths for our expressions, block manager) that the first
    // measured query otherwise pays for. ~1 s once vs ~10 s smeared into
    // whichever query happens to run first. Best-effort: a warmup failure
    // must degrade to slower first-query timing, never abort the bench.
    try locally {
      import org.apache.spark.sql.functions._
      val wdf = spark.range(0, 10000L)
        .selectExpr("id", "cast(id % 7 as string) k",
          "array(cast(id as float), cast(id+1 as float)) v", "cast(id as string) t")
      val dim = spark.range(0, 7L).selectExpr("id j", "cast(id as string) k")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("id"))
      wdf.join(broadcast(dim), "k")
        .select(col("id"), col("k"), col("j"), md5(col("t")).as("fp"),
          graft.functions.VectorExpressions.floatDot(col("v"), col("v")).as("d"),
          graft.functions.HashExpressions.wordShingleHashes(col("t"), 2).as("sh"))
        .withColumn("sig", graft.functions.HashExpressions.minhashSig(col("sh"), 8))
        .withColumn("sim", graft.functions.HashExpressions.simhash64(
          transform(col("sh"), x => x)))
        .withColumn("rn", row_number().over(w))
        .localCheckpoint()
        .groupBy(col("k")).agg(collect_set(col("j")).as("s"), sum(col("d")).as("sd"),
          count(lit(1)).as("n"))
        .collect()
      spark.catalog.clearCache()
    } catch { case e: Throwable => System.err.println(s"warmup skipped: $e") }
    // Kv-catalog + MERGE warmup: k_kv_merge_sql's first rep otherwise
    // absorbs ~1.2 s of per-SESSION cost (catalog class load, the
    // row-level-operation analyzer rules' first MERGE resolution, the kv
    // store's first manifest read/write) — the last first-rep outlier in
    // SCALING.md's compile-cost table that wasn't a shared page-cache
    // effect. An 8-row throwaway table exercises all three paths once.
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-bench-kvwarm")
      spark.conf.set("spark.sql.catalog.graftkvwarm", "graft.sinks.v2.GraftKvCatalog")
      spark.conf.set("spark.sql.catalog.graftkvwarm.warehouse", wh.toString)
      // 60k rows, NOT a toy: below ~2M key reprs the upsert takes the
      // driver-inline deletion-vector path, leaving the distributed
      // dv/bloom machinery (its own codegen + first-run init) cold —
      // exactly what the measured MERGE then pays on its first rep
      spark.sql("CREATE TABLE graftkvwarm.cat.w AS " +
        "SELECT id AS k, CAST(id AS DOUBLE) AS v, 'O' AS st FROM range(60000)")
      spark.sql("MERGE INTO graftkvwarm.cat.w t USING " +
        "(SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v, " +
        " CASE WHEN id % 7 = 1 THEN 'F' ELSE 'O' END AS st " +
        " FROM range(90000)) s " +
        "ON t.k = s.k " +
        "WHEN MATCHED AND s.st = 'F' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v, st) VALUES (s.k, s.v, s.st)")
      spark.sql("SELECT count(*) FROM graftkvwarm.cat.w").collect()
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(wh)) { stream =>
        stream.iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    } catch { case e: Throwable => System.err.println(s"kv warmup skipped: $e") }
    // Parquet reader/writer path warmup (Hadoop FS init, footer reader,
    // vectorized reader codegen) against a throwaway file — the measured
    // queries' first parquet scan otherwise pays ~1s of one-time init.
    // Warms code paths only; never touches the benchmark tables.
    val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-warm")
    try {
      spark.range(100L).selectExpr("id", "cast(id as string) s")
        .write.mode("overwrite").parquet(warmDir.toString)
      spark.read.parquet(warmDir.toString).selectExpr("count(distinct s)").collect()
    } catch { case e: Throwable => System.err.println(s"parquet warmup skipped: $e") }
    finally {
      // the temp parquet dir would otherwise leak on every bench run
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(warmDir)) { stream =>
        stream.iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // dev aid: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    // Per-query best-of-N (default 3, CLAMPED to >= 2): report the min — host
    // contention on a shared machine swung identical code 59 s ↔ 111 s
    // run-to-run, and a single-shot rep additionally absorbs first-run Janino
    // codegen compile into whichever sub-second query triggers it (r12's
    // driver rerun measured q_topk_sketch at 12× its plan cost that way). A
    // floor of 2 makes the artifact rerun-proof BY CONSTRUCTION: no caller,
    // driver included, can shadow the committed number with compile noise.
    val reps = math.max(2, sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3))
    // ---- self-adjudicating host-noise instrumentation (r16) ----
    // One run of the fixed synthetic sentinel workload (constant size,
    // never the benchmark tables). Timed single-shot: the interleaved
    // probes below want the INSTANTANEOUS host load, not a best-of.
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .selectExpr("id", "xxhash64(id) h", "cast(id % 97 as string) k")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("h"),
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    val runT0 = System.nanoTime()
    def elapsed() = (System.nanoTime() - runT0) / 1e9
    // (run-relative seconds, sentinel seconds) — a load profile OF THIS RUN.
    // A query whose reps are all slow is adjudicated against the probes
    // bracketing it: elevated local sentinel → host contention, flat local
    // sentinel → a real plan regression. Rule documented in BASELINE.md.
    val sentinelSeries = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    // anchor probe pays the sentinel plan's one-time codegen compile so the
    // series' later single-shots are warm; best-of-reps like the old
    // end-of-run sentinel
    sentinelSeries += ((elapsed(), (1 to reps).map(_ => sentinelOnce()).min))
    val sentinelEvery =
      math.max(1, sys.env.get("SPARK_GRAFT_SENTINEL_EVERY").map(_.toInt).getOrElse(10))
    var qIdx = 0
    // deterministic alphabetical execution order: the artifact's rep/probe
    // timeline is reproducible run-to-run (a Map would scramble it)
    val resultsDetail: Seq[(String, Double, Double, Seq[Option[Double]])] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        if (qIdx > 0 && qIdx % sentinelEvery == 0)
          sentinelSeries += ((elapsed(), sentinelOnce()))
        qIdx += 1
        val startAt = elapsed()
        // per-rep Option kept (not flattened): the compile proxy below must
        // know whether rep 1 specifically succeeded — if rep 1 errored and
        // rep 2 succeeded, "head of successes" would be a WARM rep and the
        // proxy would silently read ~0 for exactly the queries most likely
        // to have first-run problems
        val repTimes: Seq[Option[Double]] = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
          val dt = (System.nanoTime() - t0) / 1e9
          // drop per-query persist barriers so caches don't accumulate across
          // the suite (materialization cost was already paid inside the timing)
          spark.catalog.clearCache()
          if (ok) Some(dt) else None
        }
        // measured wall end, not estimated from rep sums: failed reps
        // report None but still consumed wall time, and the local-factor
        // bracket below must not pick a probe that ran mid-query
        (name, startAt, elapsed(), repTimes)
      }
    val results = resultsDetail.map { case (n, _, _, ts) =>
      n -> ts.flatten.minOption.getOrElse(-1.0)
    }.toMap
    // plan-compile proxy: first rep minus best rep. The first rep pays
    // Janino/whole-stage codegen compilation (and any per-plan one-time
    // work); later reps of the same plan reuse the generated-class cache —
    // so the delta upper-bounds compile cost. -1.0 when the FIRST rep did
    // not succeed (a warm head would understate compile cost). Written to
    // the on-disk artifact only (stdout stays driver-parse compact);
    // SCALING.md pins the worst offenders per round.
    val compileProxy = resultsDetail.map { case (n, _, _, ts) =>
      val ok = ts.flatten
      n -> (ts.headOption.flatten match {
        case Some(first) if ok.size >= 2 => math.max(0.0, first - ok.min)
        case _ => -1.0
      })
    }.toMap
    // closing probe: the series must bracket the last stretch of queries
    sentinelSeries += ((elapsed(), sentinelOnce()))
    // Headline SENTINEL: the min over the interleaved series — the host's
    // best observed moment, so dividing the catalog total by it normalizes
    // contention the same way the old end-of-run best-of-3 did (identical
    // code measured 65-116 s run-to-run on this shared host from neighbors
    // alone). The full series is in the artifact for PER-QUERY adjudication.
    val sentinel = sentinelSeries.map(_._2).min
    // MEDIAN sentinel alongside the min (r17): the min of ~21 probes is an
    // extreme-value statistic — two same-code same-host runs measured
    // normalized-by-min 267 vs 325 while raw totals agreed within 4%. The
    // median is the robust denominator for CROSS-RUN comparison; the min
    // stays the headline for continuity with every prior round's artifact.
    val sentinelMed = {
      val s = sentinelSeries.map(_._2).sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def toJson(rs: Map[String, Double]): String =
      rs.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // sentinel-normalized total: host-noise-free plan cost (total ÷ sentinel)
    // — committed and driver artifacts of the same binary agree on this
    // number even when the host is 2× busier for one of the runs
    val totalNorm = if (sentinel > 0) total / sentinel else -1.0
    val totalNormMed = if (sentinelMed > 0) total / sentinelMed else -1.0
    def line(rs: Map[String, Double], extra: String = ""): String =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
        s""""queries":${toJson(rs)},"sentinel":$sentinel,""" +
        s""""sentinel_med":$sentinelMed,"total_over_sentinel_med":$totalNormMed,"reps":$reps,""" +
        s""""total_over_sentinel":$totalNorm$extra,"sf":"$sfDir"}"""
    // STDOUT gets a COMPACT line: the driver captures only the last ~2000
    // chars of stdout and JSON-parses the line it finds there — the full
    // 160-query map is ~4500 chars, so every BENCH_r*.json through r11
    // carried `parsed: null`. Print a fixed headline subset (one stable
    // representative per operator family) so the driver's parse succeeds;
    // `value` stays the FULL-catalog total. The complete per-query map goes
    // to bench_results.json, the canonical on-disk artifact.
    val headline = Set(
      "q_pricing_summary", "a2_sliding_agg", "a3_windowed_agg",
      "bot_detect_windowed", "dedup_exact", "dedup_minhash",
      "dedup_spans_trim", "doc_winnow", "embed_topk_native", "embed_ivf",
      "embed_pq", "text_stats", "text_c4_filter", "multimodal_jpeg",
      "pipeline_dsir", "pipeline_pack", "q_bm25", "wire_dsv2_scan")
    val stdoutQs =
      if (results.size <= 25) results
      else results.view.filterKeys(headline).toMap
    println(line(stdoutQs))
    // Full per-query JSON to a file: the artifact on disk is the canonical
    // machine-readable record of a bench run. Best-effort — a read-only cwd
    // must not fail the bench itself.
    // Self-adjudication payload (r16): per-query run-offset + ALL rep wall
    // times (−1 = failed rep), plus the sentinel series. Adjudication rule
    // (BASELINE.md "Bench artifact adjudication"): a slow query whose
    // bracketing sentinel probes are elevated vs the series min was measured
    // on a contended host; flat probes around a slow query = real regression.
    def num(d: Double): String = Fmt.num("%.4f", d)
    val repJson = resultsDetail.map { case (n, at, _, ts) =>
      "\"" + n + "\":{\"at\":" + num(at) + ",\"reps\":[" +
        ts.map(_.fold("-1.0")(num)).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val seriesJson = sentinelSeries
      .map { case (at, t) => s"[${num(at)},${num(t)}]" }.mkString("[", ",", "]")
    // COMPUTED local load factor per query (r17): the adjudication rule was
    // "take the two sentinel probes bracketing the query and divide by the
    // series min" — done by hand from the series through r16; now the
    // artifact carries the division. Bracket = last probe at or before the
    // query's start, first probe at or after its MEASURED wall end (the
    // closing probe guarantees an "after" exists). ≈1.0 means
    // the host around this query ran at the series-best speed (slowness is
    // the plan's own); ≳1.3 means contention — divide before comparing.
    val seriesMin = sentinelSeries.map(_._2).min
    val localFactor = resultsDetail.map { case (n, at, end, _) =>
      val before = sentinelSeries.filter(_._1 <= at)
        .lastOption.getOrElse(sentinelSeries.head)._2
      val after = sentinelSeries.find(_._1 >= end)
        .getOrElse(sentinelSeries.last)._2
      val lf = if (seriesMin > 0) math.max(before, after) / seriesMin else -1.0
      n -> math.round(lf * 10000) / 10000.0
    }.toMap
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")),
      (line(results, s""","first_minus_min":${toJson(compileProxy)}""" +
        s""","local_factor":${toJson(localFactor)}""" +
        s""","rep_detail":$repJson,"sentinel_series":$seriesJson""") + "\n")
        .getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench_results.json write skipped: $e") }
    spark.stop()
  }
}
