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
 *   - `persist`: lazy MEMORY_AND_DISK cache. The logical plan keeps full
 *     lineage, so executor loss recomputes instead of failing — the cluster
 *     default with dynamic allocation. Downstream plans still reference the
 *     InMemoryRelation (the cache lookup happens at analysis), so the
 *     projection-collapse barrier holds.
 *   - `checkpoint`: reliable checkpoint to `spark.graft.checkpointDir` (or a
 *     previously set `sc.setCheckpointDir`) — survives executor loss AND cuts
 *     lineage; for very long iterative chains on clusters.
 *
 * The helper never decides eagerness for callers: iterative callers that
 * need a size (convergence counts) already force execution via `count()`.
 */
object Materialize {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.materialize", "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint()
      case "persist"         => df.persist()
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
}
