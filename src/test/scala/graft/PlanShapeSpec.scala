package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regressions: SCALING.md's claims about physical plans, pinned.
 * A change that silently turns a broadcast dim join into a sort-merge join,
 * a blocked join into a nested loop, or a distributed top-N into a global
 * sort would pass every value-correctness test and only show up at scale —
 * these assertions make the plan itself part of the contract.
 */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(query: String): String =
    SparkEntry.queries(query)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Count plan NODES of a kind: formatted explain prints each node in the
   * tree ("+- Exchange (4)") and again in the details ("(4) Exchange"), so
   * count only numbered detail headers, which are unique per node. */
  private def countOccurrences(s: String, sub: String): Int =
    s.linesIterator.count(_.matches(s"""\\(\\d+\\) $sub(?: \\[codegen.*)?"""))

  test("record-linkage top1: hash-only aggregation — the pair stream is never sorted") {
    // max(struct(score, -id)) has a non-primitive agg buffer, so Spark
    // plans SortAggregate — which SORTS the full blocked pair stream
    // (2·10¹⁰ rows at sf10; the r14 rehearsal spilled the scratch disk
    // dry). The shipped two-pass form must stay hash-only: no sort of any
    // kind, no sort-merge join, and the pair-sized side never exchanged
    // (only the bounded per-id aggregates move).
    val p = planOf("q_record_linkage_top1")
    assert(!p.contains("SortAggregate"),
      "pair-stream aggregation fell back to SortAggregate (non-primitive agg buffer?)")
    assert(countOccurrences(p, "Sort") == 0, "no sort may touch the pair stream")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop") &&
      !p.contains("CartesianProduct"))
    assert(countOccurrences(p, "HashAggregate") >= 4,
      "both passes must partial+final hash-aggregate")
  }

  test("record-linkage top1 packed twin: one id-scale exchange, no broadcast, no sort") {
    // the packed-ordering form folds (best score, min partner, count) into
    // a single primitive max over ONE pass of the pair stream: the only
    // shuffle exchange may carry per-id partial aggregates, and the O(n)
    // per-id broadcast of the two-pass form is gone (the blocking join's
    // dim-sized broadcast at this SF is fine and degrades gracefully)
    val p = planOf("q_record_linkage_top1_packed")
    assert(!p.contains("SortAggregate"), "packed argmax must stay hash-aggregated")
    assert(countOccurrences(p, "Sort") == 0, "no sort may touch the pair stream")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop") &&
      !p.contains("CartesianProduct"))
    assert(countOccurrences(p, "Exchange") == 1,
      "exactly one exchange: the id-scale partial-aggregate shuffle")
  }

  test("star join broadcasts the whole dim chain; only facts shuffle") {
    val p = planOf("q_star_join")
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2, p.take(400))
    assert(!p.contains("SortMergeJoin"), "dim joins must not sort-merge")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("promo share: part dim broadcasts, no nested loop, filters pushed") {
    val p = planOf("q_promo_share")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters") && p.contains("IsNotNull(l_shipdate)"),
      "shipdate filter must reach the parquet scan")
  }

  test("fuzzy join is an equi-join on blocking keys, never a cross product") {
    val p = planOf("q_fuzzy_join")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "deletion-neighborhood blocking must plan as equi-joins")
  }

  test("flagship scan prunes to the hot columns and pushes the type filter") {
    val p = planOf("bot_detect_windowed")
    assert(p.contains("PushedFilters"))
    assert(p.contains("In(event_type") || p.contains("IsNotNull(event_type)"),
      "event_type predicate must reach the scan")
    // column pruning: props/ts/user_id/event_type only — value must NOT be read
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("value"), s"pruned scan must not read `value`: $readSchema")
  }

  test("global top-N queries use distributed TakeOrdered, not a global sort") {
    for (q <- Seq("q_shipping_priority", "q_top_tokens")) {
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q must partial-top-N per partition")
    }
  }

  test("zorder audit is a single-shuffle aggregation over a pruned scan") {
    val p = planOf("q_zorder")
    // one hash-partitioned exchange for the bucket groupBy; no joins at all
    assert(countOccurrences(p, "Exchange") <= 2, p.take(400)) // partial+final agg split
    assert(!p.contains("Join"))
  }

  test("nearest-centroid assignment is a pure projection: no exchange, no join") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val centroids = e.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val assigned = graft.operators.Similarity.nearestCell(
      e.select(col("vec_id"), col("embedding").as("vec")), "vec", centroids)
    val p = assigned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"assignment must be map-side: ${p.take(600)}")
    assert(!p.contains("Join"), s"assignment must not join: ${p.take(600)}")
    assert(countOccurrences(p, "Scan parquet .*") <= 1, "one pass over the corpus")
  }

  test("decontamination broadcasts the eval shingle set; corpus never sort-merges") {
    val p = planOf("q_decontaminate")
    assert(countOccurrences(p, "BroadcastHashJoin") >= 1, p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "the eval side is small by construction and must broadcast")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("token-budget mix: two-phase scan, data shuffles once, window keyed sub-stratum") {
    val p = planOf("pipeline_mix")
    // never one task per stratum — the whole point of the two-phase scan
    assert(!p.contains("SinglePartition"),
      "running sum must never collapse to a single partition")
    // three exchanges total: ONE carries the data (feeding the running-sum
    // window); the other two carry only the ≤(strata × 256)-row totals /
    // offsets frames (aggregate partial/final split + offsets window)
    assert(countOccurrences(p, "Exchange") === 3, p.take(400))
    assert(countOccurrences(p, "Window") === 2,
      "one bounded offsets window + one running-sum window")
    // the DATA-side window must partition by (stratum, bucket), not the
    // stratum alone — a hot stratum spreads across its 256 hash-order buckets
    assert("""windowspecdefinition\(__mix_s#\d+, __mix_b#\d+""".r.findFirstIn(p).isDefined,
      "running-sum window must be keyed by (stratum, bucket)")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      "scan must prune to the three used columns")
  }

  test("rolling range-frame window shuffles once on the user key") {
    val p = planOf("q_rolling_window")
    assert(p.contains("RangeFrame") || p.contains("RANGE"),
      "window must use a value-based RANGE frame")
    assert(countOccurrences(p, "Exchange") === 1, "one keyed exchange, no global sort")
  }

  test("sequence packing never plans a single-partition global window") {
    val p = planOf("pipeline_pack")
    // the two-phase prefix sum: exactly one BUCKET-keyed exchange (plus the
    // separate bounded-metadata totals job), never Exchange SinglePartition
    assert(!p.contains("SinglePartition"),
      "global prefix sum must not collapse to one task")
    assert(countOccurrences(p, "Exchange") === 1, p.take(400))
    assert(countOccurrences(p, "Window") === 1,
      "the running sum must be computed once, not per derived column")
  }

  test("IVF-PQ search phase joins broadcast-only: no sort-merge, no cartesian") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val (cents, books, codes) = graft.operators.Similarity
      .ivfPqBuild(e, "vec_id", "embedding", dim = 64, nCells = 4)
    val p = graft.operators.Similarity
      .ivfPqSearch(cents, books, codes, e, "vec_id", "embedding", dim = 64,
        col("vec_id") < 10, k = 5)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SortMergeJoin"), "probe/LUT/rerank joins must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2,
      "probe restriction and LUT must be broadcast hash joins")
  }

  test("global paragraph dedup partial-aggregates the hot key before the shuffle") {
    val p = planOf("dedup_paras_global")
    // first-occurrence selection must be a PARTIAL-AGGREGATABLE min_by, not
    // a row_number window partitioned by the raw paragraph: a window cannot
    // partial-aggregate, so a boilerplate footer shared by millions of pages
    // would funnel every copy into one task. With min_by, each map task
    // collapses its local copies of the hot paragraph before the exchange.
    assert(p.contains("partial_min_by"),
      "first-occurrence pick must partial-aggregate map-side: " + p.take(400))
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window "),
      "no window over the raw-paragraph key")
    assert(countOccurrences(p, "Exchange") === 2,
      "one paragraph-keyed agg exchange + one doc-keyed agg exchange")
  }

  test("embed_celldup first-match dedup: no distinct, two cell exchanges, inline verify") {
    // the r12 shape: homes join probes with both probe LISTS carried, the
    // one-direction-per-pair rule decides map-side, and the cosine verify
    // runs inline — so the plan must contain NO distinct pass over
    // candidates (no aggregate at all: the id-pair distinct and its
    // re-attach joins are gone) and at most the two cell-keyed exchanges
    // (probe side + home side; vectors ride them once per probe, which is
    // ≤ nProbes+1 corpus payloads vs the old candidate-pair shuffles).
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.Similarity
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    // materializeResult = false: the final eager barrier would otherwise
    // execute the query and hand back a bare cache-scan plan
    val frame = Similarity.cellNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.3, nCells = 4, materializeResult = false)
    val plan = frame.queryExecution.sparkPlan
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.isEmpty,
      s"no aggregate belongs in the first-match celldup plan, got: $aggs")
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"expected at most the two cell-keyed exchanges, got: $shuffles")
  }

  test("embed_decontaminate: asymmetric probing — no candidate distinct, broadcast refs") {
    // the r12 rewrite: the corpus gets ONE cell assignment and the bounded
    // multi-probed reference side broadcasts WITH its vectors, so a
    // (doc, ref) pair can surface at most once — the plan must contain NO
    // distinct pass over candidates (the only aggregate is the final
    // per-doc max_by) and the cell join must be a broadcast join, with the
    // corpus never exchanged before it.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.functions.{col, pmod, lit}
    import graft.operators.Similarity
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val frame = Similarity.embeddingContamination(
      e.filter(pmod(col("vec_id"), lit(50)) =!= 0),
      e.filter(pmod(col("vec_id"), lit(50)) === 0),
      "vec_id", "embedding", threshold = 0.3, nCells = 4,
      materializeResult = false)
    val plan = frame.queryExecution.sparkPlan
    val distincts = plan.collect {
      case a: BaseAggregateExec if a.aggregateExpressions.isEmpty => a
    }
    assert(distincts.isEmpty,
      s"candidate distinct reappeared (pairs are unique by construction): $distincts")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "cell join must broadcast the bounded reference side")
    // the final plan has exactly the per-doc aggregate's exchange; the
    // corpus scan side must reach the broadcast join without a shuffle
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2, // partial+final agg pair plans one exchange
      s"corpus side must not shuffle before the verify: $shuffles")
  }

  test("embed_lsh first-match dedup: no distinct, no candidate-set sort, vectors carried once") {
    // lshNearDupPairs dedups cross-table pairs by FIRST-MATCH on the bucket
    // signature (a codegen'd when-chain), map-side — the plan must contain
    // NO aggregate (the cross-table distinct is gone). Vectors + norms are
    // CARRIED through the one keyed exchange (linear: corpus × tables ×
    // vecBytes) and candidates stream through filter + inline cosine — the
    // r13 sf10 sweep showed the alternative (vector-free candidates
    // re-attached by id) SMJ-sorts the ~quadratic CANDIDATE set, tens of
    // GB of sort spill at 200k vectors. So the pin is inverted from r12:
    // no exchange or sort may have BOTH pair id columns (nothing
    // candidate-shaped is ever shuffled or sorted); the keyed exchanges
    // carry the vec once.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.SortExec
    val frame = SparkEntry.queries("embed_lsh")(spark, dir)
    // exchanges are inserted by EnsureRequirements, so inspect the executed
    // plan (unwrapping AQE) rather than sparkPlan
    val plan = frame.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.isEmpty,
      s"embed_lsh should have no aggregate (first-match dedup), got $aggs")
    def pairShaped(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) =
      out.exists(_.name == "id_a") && out.exists(_.name == "id_b")
    val candidateExchanges = plan.collect {
      case ex: Exchange if pairShaped(ex.output) => ex
    }
    assert(candidateExchanges.isEmpty,
      s"the candidate set must never be shuffled (stream through filter+cosine): $candidateExchanges")
    val candidateSorts = plan.collect {
      case s: SortExec if pairShaped(s.output) => s
    }
    assert(candidateSorts.isEmpty,
      s"the candidate set must never be sorted (the sf10 spill): $candidateSorts")
    // the name-keyed pins above only see post-projection attributes
    // (id_a/id_b exist after the final select) — a reintroduced SMJ or
    // sort over the PRE-rename doc_id candidates would pass them
    // vacuously. The structural pin: this plan has no sort-merge join and
    // no sort of any kind, under any column names (hash joins + streaming
    // filter only).
    val smjs = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.isEmpty, s"embed_lsh must never sort-merge join: $smjs")
    val anySorts = plan.collect { case s: SortExec => s }
    assert(anySorts.isEmpty,
      s"embed_lsh plans no sort anywhere (pre- or post-rename): $anySorts")
    // first-match really is exhaustive-and-unique: same pair set as a
    // distinct over all colliding tables would produce
    val rows = frame.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length, "first-match emitted a duplicate pair")
  }

  test("wire_dsv2_scan: pushed filter reaches the custom scan, no residual Filter") {
    val p = planOf("wire_dsv2_scan")
    assert(p.contains("PushedFilters: [IsNotNull(action), EqualTo(action,click)]"),
      s"the action filter must be fully pushed into the scan:\n${p.take(800)}")
    // pruning is even tighter than the projection: action is consumed BY the
    // pushed filter, so only the two aggregated columns are JSON-decoded
    assert(p.contains("ReadSchema: struct<time:bigint,categoryId:string>"),
      s"ip AND action must be pruned out of the JSON decode:\n${p.take(800)}")
    // nothing left for Spark to filter between scan and aggregate
    assert(countOccurrences(p, "Filter") === 0, s"no residual Filter expected:\n$p")
  }

  test("k_kv_roundtrip read side: one shuffle for ifNotExists resolve, no cartesian") {
    // plan the READ side alone (the catalog query also performs the write)
    val store = new java.io.File(sys.props("java.io.tmpdir"), "graft_kv_plan_pin")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(store)
    import spark.implicits._
    Seq(("a", 1L), ("b", 2L)).toDF("ip", "clicks").write.format("graft-kv")
      .option("path", store.toString).mode("append").save()
    try {
      val p = graft.sinks.v2.KvStore.readCurrent(spark, store.toString, Seq("ip"))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
      // min-epoch resolve: partial + final aggregate around one exchange,
      // then the semi join back — broadcast at this size
      assert(p.contains("HashAggregate"))
      // scan statistics make the resolved-min side broadcastable: the semi
      // join must NOT sort-merge at this size
      assert(p.contains("BroadcastHashJoin"), p)
      assert(countOccurrences(p, "Exchange") <= 2, p)
    } finally rm(store)
  }

  test("sketch near-dup gates join on pigeonhole blocks, never all-pairs") {
    for (q <- Seq("image_neardup", "audio_neardup")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(600)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(600)}")
      // the self-join key is (block, blockval): shuffle ∝ corpus, not corpus²
      assert(p.contains("block"), s"$q:\n${p.take(600)}")
    }
  }

  test("media decode gates are pure map pipelines above the spread") {
    // encode → decode → stats is row-local by construction; a KEYED shuffle
    // here would mean the codec queries stopped scaling linearly with the
    // corpus. The ONE exchange the plan may carry is spreadForCpuWork's
    // ROUND-ROBIN repartition directly over the narrow scan (the small-file
    // regime: a single-split id scan would otherwise serialize the whole
    // decode onto one core) — it is keyless, so it can never be the
    // aggregation/join shuffle this test guards against, and it disappears
    // whenever the scan already yields enough splits.
    for (q <- Seq("multimodal_pixels", "multimodal_audio", "multimodal_gif_frames",
        "multimodal_jpeg", "multimodal_video_frames")) {
      val p = planOf(q)
      val nEx = countOccurrences(p, "Exchange")
      assert(nEx <= 1, s"$q: decode must not shuffle beyond the spread:\n${p.take(600)}")
      if (nEx == 1)
        assert(p.contains("Arguments: RoundRobinPartitioning"),
          s"$q: the only allowed exchange is the keyless round-robin spread:\n${p.take(900)}")
      assert(!p.contains("BroadcastExchange"), s"$q should not broadcast")
    }
  }

  test("global top-k ranking never plans an unpartitioned window") {
    // Two idioms, both r17-fixed for Spark 4 (whose EliminateWindowPartitions
    // folds a lit(0) partition key away, re-planning the window as
    // unpartitioned — the "No Partition Defined" warning the r16 bench tail
    // logged):
    //  - rollupTopKFlat with empty groupCols ranks INSIDE the bounded
    //    top_items array (array_sort + posexplode) — no Window node at all;
    //  - the orderBy+limit rank sites go through BoundedRank.constKey, a
    //    pmod-constant the optimizer cannot fold, so the window keeps a
    //    partition spec.
    val pk = planOf("q_topk_sketch")
    assert(!pk.contains("Window"),
      s"q_topk_sketch global rollup must rank in-array, not via a window:\n${pk.take(600)}")
    assert(pk.contains("Generate"), // the posexplode of the sorted array
      s"q_topk_sketch must posexplode the sorted sketch array:\n${pk.take(600)}")
    for (q <- Seq("q_top_tokens", "q_shipping_priority", "q_key_skew", "q_top_paths")) {
      val p = planOf(q)
      // WindowExec warns exactly when partitionSpec is empty, which the
      // formatted plan prints as a windowspecdefinition whose FIRST element
      // is the ordering, i.e. no partition expressions before the sort spec
      val unpartitioned = p.linesIterator.exists(l =>
        l.contains("windowspecdefinition(") && {
          val spec = l.substring(l.indexOf("windowspecdefinition(") + "windowspecdefinition(".length)
          // a partitioned spec leads with partition exprs (comma-separated
          // at spec depth BEFORE the first sort marker); an unpartitioned
          // one leads with "expr ASC/DESC NULLS ..." ordering immediately.
          // Parse by paren depth, not a naive split: an ordering expression
          // like coalesce(a, b) DESC carries commas INSIDE parens that a
          // split(",") would break on (ADVICE r17 false-negative).
          val sortAt = Seq(spec.indexOf(" ASC NULLS"), spec.indexOf(" DESC NULLS"))
            .filter(_ >= 0).minOption
          sortAt.exists { at =>
            var depth = 0
            var topLevelComma = false
            spec.take(at).foreach {
              case '(' => depth += 1
              case ')' => depth -= 1
              case ',' if depth == 0 => topLevelComma = true
              case _ =>
            }
            // no spec-level comma before the first sort marker ⇒ the spec's
            // first element IS the ordering ⇒ no partition expressions
            !topLevelComma
          }
        })
      assert(!unpartitioned, s"$q plans an unpartitioned window:\n${p.take(900)}")
    }
  }
}
