package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

import graft.operators.Dedup

/**
 * Ingest-time curation gates: the batch curation operators applied per
 * micro-batch as documents arrive, so a training corpus is kept clean
 * continuously instead of by periodic full-corpus sweeps.
 *
 * First gate: benchmark decontamination (`Dedup.contamination` semantics).
 * The eval set's distinct shingle hashes are computed and materialized ONCE
 * at wiring time (benchmarks are small and static by construction) and
 * broadcast into every batch's probe — per batch the check is a map-side
 * hash probe plus one keyed count, shuffle ∝ batch size, never corpus or
 * eval rescans.
 *
 * Delivery: clean and quarantined rows are both plain appends; a crash
 * between the two writes re-emits the batch on replay (at-least-once, same
 * contract as the incremental-dedup sink — downstream dedups on doc_id).
 */
object StreamingCuration {

  /**
   * Split each arriving micro-batch against the eval set: rows sharing no
   * word n-gram append to `cleanDir`; contaminated rows append to
   * `quarantineDir` with their `n_shared` overlap count (evidence for
   * audit, the reason quarantine isn't just a drop).
   */
  /**
   * Ingest-time per-key admission cap — the streaming twin of
   * [[graft.operators.Sampling.capPerKey]]: admit at most `maxPerKey` rows
   * per key over the stream's lifetime (at most N pages per domain as a
   * crawl arrives). A stream cannot know the batch operator's global
   * md5-order prefix (later "smaller-hash" rows would demand revoking
   * already-emitted ones), so the streaming semantics are ARRIVAL-order
   * admission: first `maxPerKey` rows win, ties within a micro-batch broken
   * by ascending id for replay stability.
   *
   * State is ONE long per key (the admitted count) — bounded by the key
   * universe, not the row count; per-batch work per key touches only that
   * batch's rows. Admission decisions commit with the state store
   * checkpoint, so a replayed batch re-admits exactly the same rows.
   * Returns the admitted (key, id) pairs as an append stream; callers join
   * the payload back on the id downstream (same shape as the batch
   * operator's semi-join).
   */
  def perKeyCapGate(docs: DataFrame, keyCol: String, idCol: String,
      maxPerKey: Int): Dataset[(String, Long)] = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, maxPerKey - admitted).toInt
          // bounded smallest-`room` selection: a crawl burst can put the
          // whole batch under ONE key, and buffering+sorting it (toSeq.
          // sortBy) is exactly the hot-key OOM this operator exists to
          // prevent — keep a ≤room-sized max-heap instead
          val take =
            if (room == 0) Seq.empty[(String, Long)]
            else {
              val heap = new scala.collection.mutable.PriorityQueue[(String, Long)]()(
                Ordering.by(_._2)) // max at head
              rows.foreach { r =>
                if (heap.size < room) heap.enqueue(r)
                else if (r._2 < heap.head._2) { heap.dequeue(); heap.enqueue(r) }
              }
              heap.dequeueAll.reverse
            }
          if (take.nonEmpty) state.update(admitted + take.size)
          take.iterator
      }
  }

  /**
   * Ingest-time percentile quality gate: the threshold is TRAINED ON THE
   * BATCH CORPUS ([[graft.operators.TextAnalysis.quantileThreshold]], exact
   * or KLL engine) and applied to arriving documents as a STATELESS
   * map-side filter — a stream cannot compute its own corpus percentile
   * (each micro-batch would gate against a different, batch-local
   * threshold), so the production shape is: re-train the scalar on the
   * persisted corpus at whatever cadence, restart or hot-swap the gate.
   * Composable transform (not a sink): feed any writeStream.
   *
   * Output = input + `gate_score`, rows below `threshold` dropped —
   * row-identical to the batch [[graft.operators.TextAnalysis.qualityGate]]
   * over the same data and threshold (pinned in StreamingCurationSpec).
   */
  def qualityGateStream(docs: DataFrame,
      scoreCol: org.apache.spark.sql.Column, threshold: Double): DataFrame =
    docs.withColumn("gate_score", scoreCol.cast("double"))
      .filter(col("gate_score") >= threshold)

  /**
   * Ingest-time encoding-hygiene gate: unlike the percentile gate, the
   * encoding audit ([[graft.operators.TextAnalysis.encodingAudit]]) is a
   * pure row-local projection — no batch-trained artifact, no state — so
   * it gates a stream out of the box. Output = the full arriving row +
   * the audit metric columns + a `quarantine` flag (`needs_repair` OR
   * `ascii_ppm` below `minAsciiPpm`); callers split on the flag into
   * clean/quarantine sinks (quarantine keeps the defect counts as audit
   * evidence, same contract as the contamination gate). Map-side only;
   * row-identical to the batch audit (StreamingCurationSpec).
   */
  def hygieneGateStream(docs: DataFrame, minAsciiPpm: Long = 0L,
      textCol: String = "text"): DataFrame = {
    import graft.operators.TextAnalysis
    val appended = Seq("n_replacement", "n_control", "n_mojibake",
      "n_nonascii", "ascii_ppm", "needs_repair", "quarantine")
    // re-gating this gate's own output (or any schema carrying these names)
    // would make the references below ambiguous — fail at wiring time with
    // the reason, not at analysis time with AMBIGUOUS_REFERENCE
    val clash = docs.columns.toSet.intersect(appended.toSet)
    require(clash.isEmpty,
      s"hygieneGateStream: input already carries audit column(s) " +
        s"${clash.mkString(", ")} — drop or rename them before re-gating")
    docs.select(col("*") +: TextAnalysis.encodingAuditCols(col(textCol)): _*)
      // NULL text makes every audit metric NULL; the flag must stay TOTAL
      // (a caller splits on it — a three-valued NULL would route the row to
      // NEITHER sink), and an unparseable row is by definition quarantine
      .withColumn("quarantine", coalesce(
        col("needs_repair") || col("ascii_ppm") < minAsciiPpm, lit(true)))
  }

  def startContaminationGate(docs: DataFrame, evalDocs: DataFrame,
      cleanDir: String, quarantineDir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3): StreamingQuery = {
    val evalSh = graft.Materialize(
      Dedup.evalShingles(evalDocs, idCol, textCol, n))
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val flagged = graft.Materialize(
          Dedup.contaminationFromShingles(batch, evalSh, idCol, textCol, n))
        batch.join(flagged, Seq(idCol), "left_anti")
          .write.mode("append").parquet(cleanDir)
        batch.join(flagged, Seq(idCol))
          .write.mode("append").parquet(quarantineDir)
        graft.Materialize.release(flagged)
      }
      .start()
  }
}
