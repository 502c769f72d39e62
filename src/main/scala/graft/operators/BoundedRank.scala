package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranking a BOUNDED frame — the `orderBy(...).limit(N)` → number-the-
 * survivors idiom behind the global top-k queries (q_shipping_priority,
 * q_top_tokens, the skew audit, path rollups). The ≤ N surviving rows are a
 * driver-bounded set, so a single-partition window over them is correct and
 * cheap BY DESIGN — the repo convention was `Window.partitionBy(lit(0))` to
 * say so. Spark 4's `EliminateWindowPartitions` optimizer rule now folds a
 * foldable partition key away, which re-plans the window as unpartitioned
 * and re-triggers WindowExec's "No Partition Defined ... serious performance
 * degradation" warning on every such query — noise that buries real
 * complaints in the bench log.
 *
 * [[constKey]] is the folding-proof replacement: an attribute-derived zero.
 * It references a real column, so no optimizer rule can prove it constant
 * and fold it — the plan keeps the hash exchange on the constant key
 * (exactly the pre-Spark-4 `lit(0)` physical shape: all ≤ N rows to one
 * partition, intentionally) and the log stays clean. Never null (`isNull`
 * is non-nullable) so rows can't be dropped by partitioning.
 */
object BoundedRank {

  /** A constant-0 partition key the optimizer cannot fold away, derived
   * from any column of the frame. See the object doc for why `lit(0)` no
   * longer works on Spark 4. `pmod(x, 1)` is 0 for EVERY integer x — a
   * mathematical constant no Catalyst rule simplifies, because proving it
   * needs the modulus identity, not constant folding. (`isNull * 0` does
   * NOT work: NullPropagation folds `isNull` of a non-nullable attribute
   * to a literal and the chain collapses to the foldable lit(0) again.)
   * The coalesce keeps the key non-null for null-valued carrier rows. */
  def constKey(anyCol: Column): Column =
    pmod(coalesce(length(anyCol.cast("string")), lit(0)), lit(1))

  /** `row_number` (as long, 1-based) over a bounded frame in `orderBy`
   * order, partitioned by [[constKey]] of `orderBy`'s first column's frame
   * — callers pass a column OF `df` as the key carrier. */
  def withRank(df: DataFrame, keyCarrier: Column, orderBy: Seq[Column],
      rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol,
      row_number().over(
        Window.partitionBy(constKey(keyCarrier)).orderBy(orderBy: _*))
        .cast("long"))
}
