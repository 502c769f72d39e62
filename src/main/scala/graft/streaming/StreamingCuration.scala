package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
