package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`ARRAY<FLOAT>`).
 *
 * Baseline: brute-force cosine top-k (broadcast the query set, never the
 * corpus). Scale paths: random-hyperplane LSH bucketing (candidates join on
 * bucket keys instead of forming the cross product), Lloyd-trained IVF
 * cells, and product quantization with ADC + exact rerank. All vector math
 * goes through the codegen'd FloatDotProduct expression — no UDFs, no
 * interpreted lambdas, no collect.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision via the codegen'd [[graft.functions.FloatDotProduct]]
   * expression — the `zip_with`/`aggregate` formulation is interpreted
   * (no codegen for higher-order functions) and ~70× slower on pair sweeps. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.floatDot(a, b)

  def norm(a: Column): Column = graft.functions.VectorExpressions.floatNorm(a)

  /** Total under ANSI mode: a zero-norm side yields NaN (the IEEE 0/0
   * outcome) instead of DIVIDE_BY_ZERO — PQ subspace chunks can be all-zero
   * even when the full vectors never are. NULL vectors still propagate NULL
   * (a NULL denominator falls through to the division). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0d, lit(Double.NaN)).otherwise(dot(a, b) / denom)
  }

  /**
   * Brute-force cosine top-k: for each query row (`queryPred`), the k nearest
   * corpus rows by cosine. The query side is broadcast — the corpus is
   * streamed once per partition, so the plan is a single broadcast
   * nested-loop with no corpus shuffle; ranking shuffles only
   * (queries × corpus) scored rows partitioned by query.
   */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val queries = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val corpus = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(cosRankKey(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (brute force, i<j).
   * Broadcast self-join — only for corpora that fit a broadcast; the scale
   * variant is [[lshNearDupPairs]]. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  /** Deterministic random hyperplanes (seeded), as a literal array column —
   * computed once on the driver, broadcast as part of the plan. Float-typed
   * so the codegen'd float dot product applies. */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian().toFloat)
  }

  /** Sign-bit LSH bucket id: bit p = (v · hyperplaneₚ) > 0. Vectors in the
   * same bucket have all sign bits equal → high cosine likelihood. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val hp = hyperplanes(nPlanes, dim, seed)
    val bits = hp.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /**
   * LSH-bucketed near-dup pairs: `tables` independent hash tables (different
   * seeds) of `nPlanes` sign bits each; candidates = pairs sharing a bucket
   * in any table; verified with exact cosine. Join is on (table, bucket) —
   * shuffle ∝ corpus × tables, not corpus².
   */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    // materialized (graft.Materialize — strategy via spark.graft.materialize):
    // projection collapse would re-inline the tables×nPlanes dot products
    // into both self-join sides (same blow-up as minhashCandidates)
    val keyed = df.select(col(idCol).as("doc_id"), col(vecCol).as("vec"),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col(vecCol), nPlanes, dim, seed = 42L + t)): _*)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
      .transform(graft.Materialize(_))
    keyed.as("a").join(keyed.as("b"), Seq("table", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.vec").as("va"), col("b.vec").as("vb"))
      .distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  /** Ordering key for nearest-centroid argmax under `min_by`: negates the
   * always-DoubleType cosine (never the id column, whose type is
   * caller-chosen — negating a STRING id fails under ANSI). NaN (a
   * zero-norm side) maps to +∞ so it LOSES: a degenerate vector/centroid
   * must never be anyone's nearest match. Cosine of finite floats is finite
   * or NaN — ±∞ cannot collide. Only when every candidate is NaN does the
   * id tie-break pick one (deterministically, min id). */
  private def descCosKey(cdist: Column): Column =
    when(isnan(cdist), lit(Double.PositiveInfinity)).otherwise(-cdist)

  /** Descending-cosine sort key for top-k ranking windows with the same
   * NaN-loses rule: Spark sorts NaN above every double, so a raw
   * `cos.desc` would silently rank a zero-norm corpus vector #1 for every
   * query — demote NaN to -∞ instead. */
  private def cosRankKey(c: Column): Column =
    when(isnan(c), lit(Double.NegativeInfinity)).otherwise(c)

  /** Nearest-centroid assignment (shared by training and query/corpus
   * bucketing so tie-break and metric can never diverge): keeps the columns
   * of `in` (id + vector) plus the winning `cell_id`.
   *
   * argmax via `min_by` with the tie-break folded into the ordering struct
   * (max cosine, then min cell_id) — a hash aggregate with map-side partials
   * instead of the row_number window's shuffle+full-sort; deterministic
   * because ties in the ordering struct are impossible (cell_id is unique),
   * and type-safe for any orderable cell_id (string ids included).
   */
  private def nearestCell(in: DataFrame, idName: String, vecName: String,
      centroids: DataFrame): DataFrame =
    in.join(broadcast(centroids), lit(true))
      .withColumn("cdist", cosine(col(vecName), col("cvec")))
      .groupBy(col(idName))
      .agg(first(col(vecName)).as(vecName),
        min_by(col("cell_id"), struct(descCosKey(col("cdist")), col("cell_id"))).as("cell_id"))

  /**
   * Farthest-first (Gonzalez) seeding — the deterministic cousin of
   * k-means++: seed 1 is the min-id vector; each next seed is the vector
   * farthest (min cosine) from its nearest already-chosen seed, ties to the
   * smaller id. Greedy max-min spread upper-bounds the 2-approximation of
   * the k-center objective — in practice it spreads seeds across the data
   * far better than first-k-ids, so Lloyd starts near distinct modes.
   *
   * Scale: the k passes run over a DETERMINISTIC HASH SAMPLE
   * (xxhash64(id) % sampleMod == 0), not the corpus — one full scan to
   * sample, then k tiny jobs; at 100 TB the sample is the only thing that
   * grows with data and stays bounded by choosing sampleMod ∝ corpus/50k.
   */
  def seedFarthestFirst(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, sampleMod: Int = 1): DataFrame = {
    val sample = graft.Materialize(
      df.filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
        .select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")))
    require(!sample.isEmpty,
      s"seedFarthestFirst: hash sample is empty (sampleMod=$sampleMod too coarse?)")
    var seeds = sample
      .select(min_by(struct(col("cand_id"), col("cand_vec")), col("cand_id")).as("s"))
      .select(col("s.cand_id").as("cell_id"), col("s.cand_vec").as("cvec"))
      .transform(graft.Materialize(_))
    var exhausted = false
    (1 until nCells).foreach { _ =>
      if (!exhausted) {
        // farthest point among candidates NOT already chosen: minimize
        // (similarity to nearest seed, id). The anti-join stops a
        // smaller-than-nCells sample from re-electing the same candidate
        // into duplicate seed rows.
        val next = sample
          .join(seeds, col("cand_id") === col("cell_id"), "left_anti")
          .join(broadcast(seeds), lit(true))
          .withColumn("cdist", cosine(col("cand_vec"), col("cvec")))
          .groupBy(col("cand_id"))
          .agg(first(col("cand_vec")).as("cand_vec"),
            // nearest-seed similarity (NaN → +∞-like via max ordering is moot
            // here: NaN only for zero-norm vectors, which never win farthest)
            max(col("cdist")).as("nearest_sim"))
          .select(min_by(struct(col("cand_id"), col("cand_vec")),
            struct(col("nearest_sim"), col("cand_id"))).as("s"))
          .select(col("s.cand_id").as("cell_id"), col("s.cand_vec").as("cvec"))
          .filter(col("cell_id").isNotNull) // empty candidate set → 1 null row
        if (next.isEmpty) { exhausted = true } // sample smaller than nCells
        else {
          val prev = seeds
          seeds = graft.Materialize(seeds.unionByName(next))
          graft.Materialize.release(prev)
        }
      }
    }
    graft.Materialize.release(sample)
    seeds
  }

  /**
   * IVF training: Lloyd iterations seeded with the first nCells vectors by
   * id (or [[seedFarthestFirst]] via `seeds`). Each round assigns every
   * vector to its nearest centroid (broadcast) and recomputes the
   * element-wise mean per cell — only the nCells×dim
   * centroid table is ever collected, never data.
   *
   * Determinism: exact on a single JVM (fixed seeds, ordered tie-breaks); on
   * a multi-executor cluster the `avg` merge order can differ in the last
   * ulp across runs, so treat centroids as reproducible-but-not-bit-stable
   * there. Cells that win no vectors in a round are dropped (the effective
   * cell count may shrink below nCells; re-seeding is deliberately omitted
   * to keep training deterministic).
   */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iterations: Int = 2, seeds: Option[DataFrame] = None): DataFrame = {
    // cvec stays ARRAY<FLOAT> throughout: the codegen'd dot product reads
    // float elements positionally
    var centroids = seeds.getOrElse(
      df.orderBy(col(idCol)).limit(nCells)
        .select(col(idCol).as("cell_id"), col(vecCol).as("cvec")))
    (0 until iterations).foreach { _ =>
      val assigned = nearestCell(
        df.select(col(idCol).as("id"), col(vecCol).as("vec")), "id", "vec", centroids)
        .select(col("cell_id"), col("vec"))
      val prev = centroids
      // element-wise mean per cell: explode positions, avg, re-assemble
      centroids = assigned
        .select(col("cell_id"), posexplode(col("vec").cast("array<double>")))
        .groupBy(col("cell_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("cvec"))
        // materialize the tiny (nCells×dim) table each round: without the
        // barrier the logical plan nests one assign+two-agg layer per
        // iteration and planning cost grows multiplicatively with it.
        // coalesce(1) first: a ≤nCells-row table across shuffle.partitions
        // tasks pays pure scheduling overhead per round (measured ~0.2 s/
        // barrier at 32 partitions)
        .coalesce(1)
        .transform(graft.Materialize(_))
      graft.Materialize.release(prev)
    }
    centroids
  }

  // ------------------------------------------------- product quantization

  /** (vec_id, s, vec) rows: each vector split into `subspaces` contiguous
   * chunks, subspace index as a KEY COLUMN — so training/encoding over all
   * subspaces runs as ONE job chain instead of one per subspace (the
   * per-subspace-loop formulation spawned ~8× the stages, and at bench scale
   * fixed stage-scheduling cost dominated the whole query). */
  private def subVectors(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, subspaces: Int): DataFrame = {
    val sub = dim / subspaces
    df.select(col(idCol).as("vec_id"),
        posexplode(array((0 until subspaces).map(s =>
          slice(col(vecCol), s * sub + 1, sub)): _*)))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "vec")
  }

  /** Nearest centroid per (s, vec_id) — the subspace-keyed twin of
   * [[nearestCell]] (same metric and tie-break, applied per key). */
  private def nearestCellKeyed(in: DataFrame, centroids: DataFrame,
      carryVec: Boolean = true): DataFrame = {
    val joined = in.join(broadcast(centroids), Seq("s"))
      .withColumn("cdist", cosine(col("vec"), col("cvec")))
      .groupBy(col("s"), col("vec_id"))
    // encoding only needs the code — carrying the vector through the
    // shuffle doubles the agg bytes for nothing (at 100 TB the vectors are
    // the payload; the codes are the point of PQ)
    if (carryVec)
      joined.agg(first(col("vec")).as("vec"),
        min_by(col("cell_id"), struct(descCosKey(col("cdist")), col("cell_id"))).as("cell_id"))
    else
      joined.agg(
        min_by(col("cell_id"), struct(descCosKey(col("cdist")), col("cell_id"))).as("cell_id"))
  }

  /**
   * PQ codebooks: split the vector into `subspaces` contiguous chunks and
   * quantize each chunk against its own `codes`-entry codebook — the same
   * deterministic Lloyd loop as [[trainCentroids]] (seed = first `codes`
   * vectors by id, per subspace; empty cells drop), but all subspaces
   * trained simultaneously keyed by `s`. Output: (s, code, cvec) — one row
   * per codebook entry, `subspaces × codes` rows total.
   */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      subspaces: Int = 8, codes: Int = 16, iterations: Int = 2): DataFrame = {
    val subs = subVectors(df, idCol, vecCol, dim, subspaces)
    val wSeed = Window.partitionBy(col("s")).orderBy(col("vec_id"))
    var centroids = subs.withColumn("rn", row_number().over(wSeed))
      .filter(col("rn") <= codes)
      .select(col("s"), col("vec_id").as("cell_id"), col("vec").as("cvec"))
    (0 until iterations).foreach { _ =>
      val assigned = nearestCellKeyed(subs, centroids)
      val prev = centroids
      centroids = assigned
        .select(col("s"), col("cell_id"), posexplode(col("vec").cast("array<double>")))
        .groupBy(col("s"), col("cell_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("s"), col("cell_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("s"), col("cell_id"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("cvec"))
        // same per-round barrier as trainCentroids (plan growth guard),
        // same coalesce(1): ≤ subspaces×codes rows
        .coalesce(1)
        .transform(graft.Materialize(_))
      graft.Materialize.release(prev)
    }
    // codebook entries re-labeled 0..codes-1 deterministically by the
    // (arbitrary but stable) seed id they grew from
    centroids.select(col("s"),
      (dense_rank().over(Window.partitionBy(col("s")).orderBy(col("cell_id"))) - 1)
        .cast("long").as("code"),
      col("cvec"))
  }

  /** PQ encoding: each vector becomes `subspaces` rows (vec_id, s, code) —
   * 8 codes ≈ 8 bytes replacing 256 bytes of floats at dim=64. One keyed
   * pass over all subspaces. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      codebooks: DataFrame, subspaces: Int = 8): DataFrame =
    nearestCellKeyed(
      subVectors(df, idCol, vecCol, dim, subspaces),
      codebooks.select(col("s"), col("code").as("cell_id"), col("cvec")),
      carryVec = false)
      .select(col("vec_id"), col("s"), col("cell_id").as("code"))

  /**
   * PQ-ADC top-k with exact re-rank, expressed relationally (no custom
   * kernel needed): per query × subspace, a 16-row lookup table of partial
   * dot products against the codebook; the corpus joins its codes to the
   * table on (s, code) and sums — shuffle ∝ corpus × subspaces, never
   * corpus × queries × dim. The ADC top-`rerank` candidates per query are
   * then re-scored with exact cosine for the final top-k (the standard
   * IVFPQ search shape).
   */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryPred: Column, k: Int, subspaces: Int = 8, codes: Int = 16,
      rerank: Int = 50): DataFrame = {
    val sub = dim / subspaces
    // no extra barriers here: pqTrain's output is a trivial relabeling
    // window over an ALREADY-materialized centroid table (recomputing it for
    // the two downstream uses is cheaper than an eager checkpoint job), and
    // corpusCodes feeds exactly one join — a barrier would only add a full
    // corpus-sized copy before the consumer reads it once
    val codebooks = pqTrain(df, idCol, vecCol, dim, subspaces, codes)
    val corpusCodes = pqEncode(df, idCol, vecCol, dim, codebooks, subspaces)
    val queries = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    // per (query, s, code): partial dot of the query's s-th chunk with the
    // codebook entry
    val lut = queries.crossJoin(broadcast(codebooks))
      .select(col("query_id"), col("qvec"), col("s"), col("code"),
        dot(slice(col("qvec"), col("s") * sub + 1, lit(sub)), col("cvec")).as("pd"))
    val adc = corpusCodes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adc_dot"))
      .filter(col("query_id") =!= col("vec_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("vec_id"))
    val candidates = adc.withColumn("r", row_number().over(wAdc)).filter(col("r") <= rerank)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    // exact re-rank of the shortlist
    val scored = candidates
      .join(df.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(cosRankKey(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /**
   * IVF-style ANN: assign every vector to its nearest of `nCells` trained
   * centroid cells (Lloyd-iterated, deterministic), then search only the
   * query's own cell. Returns top-k per query among same-cell vectors.
   * The scale path when LSH recall is too coarse: cells shard the corpus so
   * each query scores ~N/nCells candidates. At 100 TB the cell id becomes a
   * partition column at write time, turning cell restriction into partition
   * pruning.
   */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nCells: Int, farthestFirst: Boolean = false): DataFrame = {
    val seeds = if (farthestFirst) Some(seedFarthestFirst(df, idCol, vecCol, nCells)) else None
    val centroids = trainCentroids(df, idCol, vecCol, nCells, seeds = seeds)
      .transform(graft.Materialize(_))
    val corpus = nearestCell(df.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")),
      "neighbor_id", "nvec", centroids)
    val queries = nearestCell(df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "query_id", "qvec", centroids)
    val scored = corpus.join(broadcast(queries), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(cosRankKey(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
