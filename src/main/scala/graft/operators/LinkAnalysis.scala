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

  /**
   * Exact triangle counts and local clustering coefficients per node
   * (undirected; edge direction and multiplicity are erased first).
   * Output: (id, degree, triangles, clustering) with clustering =
   * 2T / (d(d-1)) for d ≥ 2, else 0.
   *
   * Scale shape — the node-iterator with DEGREE ORIENTATION (the standard
   * distributed-triangle trick): every edge is oriented from its
   * lower-(degree, id) endpoint to the higher one, so each node's
   * out-degree is O(√m) on any graph and the wedge join (out-neighbor
   * pairs per apex) is bounded by Σ outdeg² — a hub of degree d no longer
   * contributes d² wedges, its edges point INTO it. Each triangle is
   * generated exactly once (at its minimum-(degree, id) apex), closed by
   * one equi-join against the canonical edge set, then exploded to its
   * three corners for the per-node counts. Joins shuffle on vertex ids
   * only; nothing is quadratic in degree after orientation.
   */
  def triangleStats(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = graft.Materialize(edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi")) // self-loops close no triangle
      .distinct())
    val deg = graft.Materialize(
      und.select(col("lo").as("id")).union(und.select(col("hi").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree")))
    // orient by (degree, id): the apex of every wedge is the smallest corner
    val withDeg = und
      .join(deg.select(col("id").as("lo"), col("degree").as("dlo")), "lo")
      .join(deg.select(col("id").as("hi"), col("degree").as("dhi")), "hi")
    val lowFirst = struct(col("dlo"), col("lo")) < struct(col("dhi"), col("hi"))
    val oriented = graft.Materialize(withDeg.select(
      when(lowFirst, col("lo")).otherwise(col("hi")).as("src"),
      when(lowFirst, col("hi")).otherwise(col("lo")).as("dst")))
    val wedges = oriented.as("e1").join(oriented.as("e2"), "src")
      .filter(col("e1.dst") < col("e2.dst"))
      .select(col("src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tris = wedges.join(und,
      col("b") === col("lo") && col("c") === col("hi"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering",
        when(col("degree") >= 2,
          (lit(2) * col("triangles")).cast("double") /
            (col("degree") * (col("degree") - 1)))
        .otherwise(lit(0.0)))
      .select(col("id"), col("degree"), col("triangles"), col("clustering"))
  }
}
