package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket affinity: association rules over (basket, item) pairs —
 * pairwise support / confidence / lift (the Apriori output surface for rule
 * length 2, which is what product analytics actually reads: "users who do A
 * also do B"). Reference semantics: a basket contributes each item once
 * (presence, not multiplicity).
 *
 * Scale shape (100 TB rules):
 *   - baskets are DISTINCT (basket, item) rows first — one hash aggregate,
 *     multiplicity collapses map-side before anything pairs up;
 *   - pair generation is a self-equi-join ON THE BASKET KEY, so the shuffle
 *     is ∝ corpus item-rows, never baskets × items²; per-basket pair count
 *     is bounded by the basket's distinct-item count — for a bounded item
 *     domain (event types, product categories) that is a constant, and for
 *     open domains callers pass `maxBasketItems`, which DROPS baskets with
 *     more distinct items than the cap ([[Dedup.capHotKeys]] semantics — a
 *     basket that broad carries no affinity signal, and dropping it bounds
 *     the join; cap-using callers should not be oracle-compared);
 *   - the basket total is a one-row broadcast (`crossJoin(broadcast(...))`),
 *     never a driver-side collect in the plan-building path.
 *
 * Output: one row per unordered item pair (item_a < item_b) with
 * `n_ab` (co-occurrence count), `support` (n_ab / n_baskets), directional
 * confidences, and `lift`; rounded to 6dp for cross-engine hash stability.
 */
object Affinity {

  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L,
      maxBasketItems: Option[Int] = None): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val baskets0 = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val baskets = maxBasketItems.fold(baskets0)(n =>
      Dedup.capHotKeys(baskets0, Seq("basket"), n))
    val totals = graft.Materialize(baskets)
    val nBaskets = totals.agg(count_distinct(col("basket")).as("n_baskets"))
    val itemCounts = totals.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = totals.as("a").join(totals.as("b"), "basket")
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        (round(col("n_ab") / col("n_baskets"), 6) + lit(0.0)).as("support"),
        (round(col("n_ab") / col("n_a"), 6) + lit(0.0)).as("conf_a_to_b"),
        (round(col("n_ab") / col("n_b"), 6) + lit(0.0)).as("conf_b_to_a"),
        // double-first products: the long·long numerator/denominator wrap
        // (or throw, under ANSI) exactly at the basket volumes the 100 TB
        // story claims; the oracle replays the same cast order
        (round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 6) + lit(0.0)).as("lift"))
  }
}
