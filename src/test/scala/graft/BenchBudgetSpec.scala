package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-commit plan-cost budgets: every catalog query is timed against the
 * driver-gate corpus (sf0.01) and compared to its checked-in budget in
 * `bench_budgets.json`, both sides normalized by the same synthetic
 * sentinel workload `Bench` uses — so host contention cancels out and
 * the spec is red only when the PLAN got slower (a lost pushdown, a new
 * shuffle, a codegen fallback), not when the machine is busy.
 *
 * The round-over-round judge catches regressions once per round; this
 * catches them at the commit that introduces them.
 *
 *  - check mode (default): one rep per query; a query over budget ×
 *    margin is re-timed once more and judged on the min (absorbs
 *    first-run Janino codegen compile — the exact noise that made r12's
 *    single-shot driver rerun report a 12× phantom regression).
 *  - record mode (`SPARK_GRAFT_BUDGET_RECORD=1 sbt "testOnly
 *    graft.BenchBudgetSpec"`): min-of-2 per query, rewrites
 *    `bench_budgets.json`. Run it deliberately after an intentional plan
 *    change; the diff then documents the accepted cost.
 *
 * Queries without a recorded budget (added since the last record run)
 * are reported but never fail — the record run is the gate-setting act.
 */
class BenchBudgetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val budgetsFile = java.nio.file.Paths.get("bench_budgets.json")
  private val record = sys.env.get("SPARK_GRAFT_BUDGET_RECORD").contains("1")
  // a true plan regression (extra exchange, lost pruning, interpreted
  // fallback) is rarely under 2×; sentinel-normalized single-rep noise at
  // local[4] stays well inside it. Record mode writes margin/slack INTO
  // the budgets file; check mode reads them back from there (so a record
  // run under an overridden margin gates exactly what it documented),
  // with the env var as an explicit per-run override in both modes.
  private val marginEnv = sys.env.get("SPARK_GRAFT_BUDGET_MARGIN").map(_.toDouble)
  private val defaultMargin = 2.0
  // sub-sentinel queries get an absolute floor too: a 0.05-unit query
  // jittering to 0.12 units is timer noise, not a plan change
  private val defaultSlack = 0.25

  private def time(fn: (org.apache.spark.sql.SparkSession, String)
      => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    dt
  }

  private def sentinelTime(): Double = {
    val t0 = System.nanoTime()
    spark.range(0, 20000000L, 1, 8)
      .selectExpr("id", "xxhash64(id) h", "cast(id % 97 as string) k")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("h"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  /** MEDIAN of `k` sentinel probes — the robust denominator the r17 bench
   * calibration measured at ±6 % across same-code runs (vs ±30 % for the
   * min): the min rewards the one probe that dodged all co-tenant load,
   * so min-normalized numbers drift with how lucky the quietest moment
   * was; the median tracks the run's TYPICAL contention. */
  private def sentinelMedian(k: Int = 5): Double = {
    val s = (1 to k).map(_ => sentinelTime()).sorted
    if (k % 2 == 1) s(k / 2) else (s(k / 2 - 1) + s(k / 2)) / 2.0
  }

  test("every catalog query stays within its recorded sentinel-normalized budget") {
    // warm the session the way Bench does, so the FIRST timed query isn't
    // charged for session bring-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // one probe burst yields BOTH denominators: min (legacy, spiky) and
    // median (robust, the r17-calibrated cross-run statistic)
    val probes = (1 to 5).map(_ => sentinelTime()).sorted
    val sentinel = probes.head
    val sentMed = probes(probes.size / 2)
    assert(sentinel > 0)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    if (record) {
      val margin = marginEnv.getOrElse(defaultMargin)
      // record BOTH normalizations from the SAME raw timings (VERDICT r17
      // #6): the min-normalized map keeps old tooling readable, the
      // median-normalized one is what check mode gates on and what
      // cross-round claims should quote.
      val raw = queries.map { case (name, fn) =>
        name -> math.min(time(fn), time(fn))
      }
      val rowsMin = raw.map { case (n, t) => f""""$n":${t / sentinel}%.4f""" }
      val rowsMed = raw.map { case (n, t) => f""""$n":${t / sentMed}%.4f""" }
      java.nio.file.Files.write(budgetsFile,
        (f"""{"margin":$margin%s,"slack":$defaultSlack%s,"sf":"$sfDir%s",""" +
          f""""sentinel_sec":{"min":$sentinel%.4f,"med":$sentMed%.4f},""" +
          s""""budgets":{${rowsMin.mkString(",")}},""" +
          s""""budgets_med":{${rowsMed.mkString(",")}}}""" + "\n").getBytes("UTF-8"))
      info(s"recorded ${queries.size} budgets (min + median normalized) to $budgetsFile")
    } else {
      assume(java.nio.file.Files.exists(budgetsFile),
        "bench_budgets.json not recorded yet — run with SPARK_GRAFT_BUDGET_RECORD=1")
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(budgetsFile))
      // prefer the median-normalized budgets when the record run wrote
      // them; a pre-r18 budgets file (min only) still gates, min-style
      val medBudgets = Option(root.get("budgets_med"))
      val useMedian = medBudgets.isDefined
      val budgets = {
        import scala.jdk.CollectionConverters._
        medBudgets.getOrElse(root.get("budgets")).fields().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      }
      val denom = if (useMedian) sentMed else sentinel
      // gate with what the record run documented; env overrides explicitly
      val margin = marginEnv.getOrElse(
        Option(root.get("margin")).map(_.asDouble()).getOrElse(defaultMargin))
      val slack =
        Option(root.get("slack")).map(_.asDouble()).getOrElse(defaultSlack)
      val unbudgeted = scala.collection.mutable.ArrayBuffer.empty[String]
      val violations = scala.collection.mutable.ArrayBuffer.empty[String]
      queries.foreach { case (name, fn) =>
        budgets.get(name) match {
          case None => unbudgeted += name
          case Some(b) =>
            val allowed = b * margin + slack
            // retries re-measure the SENTINEL too: bursty co-tenant load
            // (another Spark job's heavy phase) inflates a query and the
            // minutes-old sentinel unevenly — a fresh denominator keeps the
            // normalization honest. First retry also absorbs Janino
            // first-compile noise. min across samples judges.
            var n = time(fn) / denom
            var retries = 0
            while (n > allowed && retries < 2) {
              val freshDenom =
                if (useMedian) sentinelMedian(3) else sentinelTime()
              n = math.min(n, time(fn) / freshDenom)
              retries += 1
            }
            if (n > allowed)
              violations += f"$name: $n%.3f > budget $b%.3f × $margin + $slack (normalized)"
        }
      }
      if (unbudgeted.nonEmpty)
        info(s"no budget yet (re-record to gate): ${unbudgeted.mkString(", ")}")
      assert(violations.isEmpty,
        s"plan-cost regressions:\n  ${violations.mkString("\n  ")}")
    }
  }
}
