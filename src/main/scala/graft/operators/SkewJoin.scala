package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit salted equi-join for skewed keys.
 *
 * At 100 TB a handful of hot keys (the null-ish placeholder user, the
 * bot IP, the default category) can put 30% of a shuffle into one reducer.
 * Spark's first-line answers are broadcast (when the other side is small)
 * and AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
 * sort-merge joins). This operator is the explicit fallback for the cases
 * those don't cover — e.g. when the skewed join feeds a same-keyed window
 * so AQE cannot split partitions without breaking the required clustering,
 * or when the small side is just over the broadcast threshold:
 *
 *   - the big side tags each row with a DETERMINISTIC salt in [0, nSalts)
 *     hashed from a caller-chosen row key (never `rand()` — reruns and
 *     retried tasks must salt identically);
 *   - the small side replicates every row across all salts (size ×nSalts —
 *     the knob trades small-side duplication for big-side spread);
 *   - the equi-join runs on (key, salt), so one hot key occupies nSalts
 *     shuffle partitions instead of one.
 *
 * Row-for-row equal to the plain equi-join for `inner` and `left` joins
 * (each big-side row carries exactly one salt, so it matches exactly the
 * small-side copies bearing its salt, and an unmatched row still surfaces
 * once). `right`/`full`/semi/anti are rejected: unmatched REPLICATED rows
 * would surface once per salt.
 */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salted join preserves only inner/left semantics, got $joinType")
    val salted = big.withColumn("_salt", pmod(hash(saltBy), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
