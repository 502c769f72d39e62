package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Whole-catalog plan hygiene: every SparkEntry query's physical plan is
 * checked against the global 100 TB rules. PlanShapeSpec pins specific
 * shapes for specific queries; this sweep guards the other ~70 — and every
 * FUTURE query — against the silent regressions that only hurt at scale.
 *
 * Exceptions are explicit allowlists with the reason stated inline; a new
 * query that trips a rule must either fix its plan or argue its way in here.
 */
class PlanHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is the DESIGN: a deliberately
   * brute-force baseline or a broadcast-small-side scoring pass where the
   * big side streams exactly once. */
  private val broadcastNlAllowed = Set(
    "embed_topk",      // brute-force baseline: corpus × broadcast queries
    "embed_hard_negatives", // same shape, label-mismatch in the join condition
    "embed_neardup",   // brute-force pair scan, broadcast self side
    "text_trigram_ll", // crossJoin(broadcast(1-row total))
    "embed_pq",        // ADC LUT: crossJoin(broadcast(codebook)) — k·d rows
    "embed_ivfpq_build",     // same ADC LUT shape as embed_pq
    "embed_ivfpq_search", // same ADC LUT shape, against the persisted index
    "k_ttl_expiry",    // crossJoin(broadcast(1-row "now" scalar))
    "text_quality_gate",     // crossJoin(broadcast(1-row percentile threshold))
    "text_quality_gate_kll", // same shape, KLL-sketch threshold
    "q_balanced_sample",     // crossJoin(broadcast(1-row boundary array))
    "q_drift_psi",           // crossJoin(broadcast(1-row boundaries + totals))
    "q_dsir_weights",        // crossJoin(broadcast(1-row model totals))
    "pipeline_dsir",         // same weights plan under the A-ES sample
    "q_tfidf",               // crossJoin(broadcast(1-row corpus count))
    "q_user_overlap",        // non-equi pair grid over the GROUPS-row sketch table
    "q_bm25",                // crossJoin(broadcast(1-row corpus constants))
    "q_pagerank",            // crossJoin(broadcast(1-row dangling mass)) per round
    "q_alpha_mix",           // crossJoin(broadcast(1-row pow-total))
    "q_decay_counts",        // crossJoin(broadcast(1-row max-ts reference))
    "q_affinity",            // crossJoin(broadcast(1-row basket count))
    "q_js_drift",            // crossJoin(broadcast(1-row category totals))
    "q_calibration",         // crossJoin(broadcast(1-row bin-mass total))
    "text_collocations",     // crossJoin(broadcast(1-row bigram/unigram totals))
    "q_json_profile",        // crossJoin(broadcast(1-row denominator))
    "embed_ivf_stats",       // crossJoin(broadcast(1-row occupancy total))
    "q_key_skew",            // crossJoin(broadcast(1-row key-count summary))
    "q_quantile_norm")       // crossJoin(broadcast(1-row global quantile grid))

  /** Queries allowed an Exchange SinglePartition: a global scalar aggregate
   * or an exact global quantile over already-reduced rows — the single
   * partition sees partial aggregates / percentile buffers, not raw data. */
  private val singlePartitionAllowed = Set(
    "q_percentiles",        // exact global percentiles (partial_percentile reduces first)
    "q_approx_percentiles", // GK summaries merge to one
    "q_top_tokens",         // final top-20 of per-partition partials
    "q_topk_sketch",        // ≤ k·groups sketch rows roll up to one
    "q_sketch_rollup",      // ≤ groups HLL sketch rows roll up to one
    "q_js_drift",           // 1-row total over ≤ categories collapsed rows
    "q_calibration")        // 1-row total over ≤ nBins collapsed rows

  test("no query plans a CartesianProduct, stray broadcast NL join, or global funnel") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = try {
        fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val v = Seq.newBuilder[String]
      if (plan.contains("CartesianProduct"))
        v += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !broadcastNlAllowed(name))
        v += s"$name: unlisted BroadcastNestedLoopJoin"
      if (plan.contains("Exchange SinglePartition") && !singlePartitionAllowed(name))
        v += s"$name: unlisted Exchange SinglePartition"
      v.result()
    }
    assert(violations.isEmpty, s"\n${violations.mkString("\n")}")
  }

  /** The pure per-document text transforms advertise "map-side only, no
   * shuffle" in SCALING.md — pin it: their physical plans must contain NO
   * exchange of any kind (scan → project, nothing else moves data). */
  test("map-side text transforms plan zero exchanges") {
    val mapSideOnly = Seq("text_normalize", "text_strip_html",
      "text_encoding_audit", "text_redact", "text_redact_full")
    for (name <- mapSideOnly) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"), s"$name plans an Exchange:\n$plan")
    }
  }
}
