package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-analysis operators: iterative graph algorithms expressed as
 * bounded-round dataflow (the [[Dedup.clusterPairs]] discipline — per-round
 * materialization barriers, O(1) plan growth, superseded rounds released).
 */
object LinkAnalysis {

  /**
   * PageRank (Page, Brin, Motwani, Winograd 1999) with `iterations`
   * synchronous power-iteration rounds and damping `d`:
   *
   *   pr(v) = (1-d)/N + d * (Σ_{u→v} pr(u)/outdeg(u) + danglingMass/N)
   *
   * Dangling nodes (no out-edges) redistribute their rank uniformly, so
   * total mass stays 1 every round (spec-pinned). Input: an edge list
   * (`srcCol`, `dstCol`); self-loops count like any edge; parallel edges
   * contribute multiply (dedup upstream if unwanted). Output: one row per
   * node, (id, pagerank).
   *
   * Scale shape (the canonical iterative join, NOT a BSP framework):
   *   - node set and out-degrees are computed once and materialized;
   *   - each round = ranks ⋈ edges on src (both keyed frames, hash
   *     exchange reused round-over-round) → partial-aggregatable
   *     contribution sum keyed by dst → left join back to the node set.
   *     Nothing driver-side grows with the graph;
   *   - dangling mass is a ONE-ROW aggregate crossJoin-broadcast per round
   *     (no collect — the value stays on executors);
   *   - every round's ranks are [[graft.Materialize]]d and the previous
   *     round released: plan stays O(1), lineage cannot stack 10 joins
   *     deep, and a hot dst (a page every doc cites) is absorbed by
   *     map-side combine in the contribution sum.
   *
   * Convergence is the caller's budget: 10 rounds ≈ 1e-4 L1 drift on
   * real web-ish graphs; the spec pins exact fixed points on fixtures.
   */
  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1,
      s"pageRank: damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = graft.Materialize(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    // out-degree rides along each edge: joined ONCE, static across rounds
    val eDeg = graft.Materialize(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
        .select(col("src"), col("dst"), col("outdeg")))
    val srcs = eDeg.select(col("src")).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list")
    var ranks = graft.Materialize(nodes.withColumn("pr", lit(1.0 / n)))
    val base = lit((1.0 - damping) / n)
    (0 until iterations).foreach { _ =>
      // rank mass of nodes with no out-edges, as a one-row broadcast
      val dangling = ranks.join(srcs, col("id") === col("src"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dmass"))
      val contribs = ranks
        .join(eDeg, col("id") === col("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
      val next = graft.Materialize(nodes
        .join(contribs, col("id") === col("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (base + lit(damping) *
            (coalesce(col("csum"), lit(0.0)) + col("dmass") / n)).as("pr")))
      graft.Materialize.release(ranks)
      ranks = next
    }
    ranks.select(col("id"), col("pr").as("pagerank"))
  }
}
