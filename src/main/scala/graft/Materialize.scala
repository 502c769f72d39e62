package graft

import org.apache.spark.sql.DataFrame

/**
 * Pluggable materialization barrier for operators that must cut lineage /
 * block Catalyst projection collapse (minhash signatures, LSH keys, label
 * propagation rounds, Lloyd centroids — see SCALING.md).
 *
 * Strategy comes from the session conf `spark.graft.materialize`:
 *
 *   - `localCheckpoint` (default): eager, executor-local blocks, lineage
 *     truncated, blocks freed by the ContextCleaner. Right for single-JVM
 *     local runs (the bench/verify harness) — NOT fault-tolerant: on a real
 *     cluster a lost executor loses the blocks and the job fails.
 *   - `persist`: MEMORY_AND_DISK cache, materialized eagerly (a count runs
 *     at the barrier). The plan keeps full lineage, so executor loss
 *     recomputes instead of failing — the cluster default with dynamic
 *     allocation. Downstream plans reference the InMemoryRelation, so the
 *     projection-collapse barrier holds.
 *   - `checkpoint`: reliable checkpoint to `spark.graft.checkpointDir` (or a
 *     previously set `sc.setCheckpointDir`) — survives executor loss AND cuts
 *     lineage; for very long iterative chains on clusters.
 *
 * Every strategy is EAGER — the barrier is fully computed when apply
 * returns. That makes [[release]] of a superseded round always safe:
 * nothing downstream can trigger a recompute of a dropped barrier.
 */
object Materialize {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.materialize", "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint()
      case "persist" =>
        val p = df.persist()
        p.count()
        p
      case "checkpoint" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(spark.conf.get("spark.graft.checkpointDir"))
        }
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize=$other (expected localCheckpoint|persist|checkpoint)")
    }
  }

  /** Drop a superseded materialization. Iterative callers (label
   * propagation, Lloyd rounds, farthest-first seeding) MUST release round
   * N-1 after round N exists, or the `persist` strategy pins one cache
   * entry per round for the query's lifetime. No-op for frames the current
   * strategy didn't cache (unpersist on a non-cached plan does nothing). */
  def release(df: DataFrame): Unit = df.unpersist(blocking = false)
}
