package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Per-task shuffle-skew audit: runs catalog queries under a task-metrics
 * listener and reports, per query, the worst shuffle stage's max/median
 * task shuffle-read bytes and task duration — the straggler diagnosis a
 * cluster UI gives, as a reproducible command. Built for the Zipf-skewed
 * corpus (`tools/scale_testdata.py --zipf`): key-shifted replication
 * preserves the source's uniform keys, so this axis is the only place
 * the skew machinery (capHotKeys, salted aggs, AQE skew splits) meets a
 * hostile key distribution on real queries.
 *
 * Env: SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_ONLY (comma list;
 * default: the queries keyed on the zipfed columns plus the heaviest
 * shuffle queries), SPARK_GRAFT_CPUS.
 *
 * Output: one JSON line per query
 *   {"query":..., "sec":..., "worst_stage":{"tasks":N,
 *    "med_bytes":..., "max_bytes":..., "bytes_ratio":...,
 *    "med_ms":..., "max_ms":..., "ms_ratio":...}}
 * ratios are max/median over tasks of the stage with the largest
 * max-task shuffle read; stages with < 4 tasks or no shuffle read are
 * ignored (a single-task stage has no skew to measure).
 */
object SkewAudit {

  private class TaskStats extends SparkListener {
    // stageId -> (shuffleReadBytes, durationMs) per task
    val stages = TrieMap.empty[Int, ArrayBuffer[(Long, Long)]]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        stages.getOrElseUpdate(te.stageId, ArrayBuffer.empty)
          .synchronized {
            stages(te.stageId) +=
              ((m.shuffleReadMetrics.totalBytesRead, te.taskInfo.duration))
          }
    }
  }

  private def num(fmt: String, d: Double): String = Fmt.num(fmt, d)

  private def median(xs: Seq[Long]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2).toDouble
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/zipf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE overrides the partition count: the hot-key
      // straggler scales ~f·P, so the 200-partition run is where a
      // skew-routed plan proves itself vs the 32-partition default
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      // coalescing folds the small-SF corpus into 1-3 tasks per stage and
      // hides the key distribution this audit exists to measure; the
      // production config keeps it ON (plus AQE skew-join splits) — here
      // we want the RAW per-key imbalance the 1000-executor plan would see
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // session warmup
    val defaults = Seq(
      // keyed on the zipfed columns: user_id (hot user), event_type
      // (100x category), o_custkey / l_partkey (Pareto join keys)
      "a4_session_agg", "q_sessionize", "q_sessionize_triaged",
      "q_merge_upsert", "q_percentiles",
      "q_join_revenue", "q_promo_share", "q_window_funcs",
      // heaviest shuffle queries of the catalog (bench top-5 by time)
      "dedup_exact", "q_fuzzy_join_agg")
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(defaults)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"""{"query":"$name","error":"unknown"}""")
        case Some(fn) =>
          val stats = new TaskStats
          spark.sparkContext.addSparkListener(stats)
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}"""); false }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          // drain the async listener bus so every task of the query is
          // counted (listenerBus is private[spark]; a short settle sleep
          // is enough — the query is already complete)
          Thread.sleep(500L)
          spark.sparkContext.removeSparkListener(stats)
          if (ok) {
            val candidates = stats.stages.values.toSeq
              .map(_.toSeq)
              .filter(ts => ts.size >= 4 && ts.exists(_._1 > 0))
            if (candidates.isEmpty)
              println(s"""{"query":"$name","sec":${num("%.3f", sec)},"worst_stage":null}""")
            else {
              // the stage moving the most shuffle DATA is where skew
              // hurts; picking by single-task max would surface 300-byte
              // metadata stages
              val worst = candidates.maxBy(_.map(_._1).sum)
              val bytes = worst.map(_._1)
              val ms = worst.map(_._2)
              val (medB, maxB) = (median(bytes), bytes.max)
              val (medM, maxM) = (median(ms), ms.max)
              def ratio(max: Long, med: Double) =
                if (med <= 0) -1.0 else max / med
              println(s"""{"query":"$name","sec":${num("%.3f", sec)},"worst_stage":{""" +
                s""""tasks":${worst.size},"total_mb":${num("%.1f", bytes.sum / 1048576.0)},""" +
                s""""med_bytes":${num("%.0f", medB)},"max_bytes":$maxB,""" +
                s""""bytes_ratio":${num("%.2f", ratio(maxB, medB))},""" +
                s""""med_ms":${num("%.0f", medM)},"max_ms":$maxM,""" +
                s""""ms_ratio":${num("%.2f", ratio(maxM, medM))}}}""")
              // SPARK_GRAFT_ALL_STAGES=1: per-stage detail — needed when
              // a union fuses two task POPULATIONS into one stage (the
              // sessionize-triaged cold+hot paths): the mixed median
              // makes the single-stage ratio meaningless
              if (sys.env.get("SPARK_GRAFT_ALL_STAGES").contains("1"))
                candidates.sortBy(-_.map(_._1).sum).foreach { ts =>
                  val b = ts.map(_._1); val m = ts.map(_._2)
                  println(s"""  {"stage_tasks":${ts.size},""" +
                    s""""total_mb":${num("%.1f", b.sum / 1048576.0)},""" +
                    s""""med_bytes":${num("%.0f", median(b))},"max_bytes":${b.max},""" +
                    s""""med_ms":${num("%.0f", median(m))},"max_ms":${m.max},""" +
                    s""""ms_sorted":${m.sorted.reverse.take(8).mkString("[", ",", "]")}}""")
                }
            }
          }
      }
    }
    spark.stop()
  }
}
