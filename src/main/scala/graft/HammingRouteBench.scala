package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measures the 1-agree vs 2-agree pigeonhole crossover of
 * [[graft.operators.Dedup.hammingPairs]] per (maxDist, corpus size):
 * for each grid cell it computes both paths' CANDIDATE volume (Σ C(cnt,2)
 * over the join buckets — the n² term the router's volume model predicts)
 * and, when the predicted volume is affordable, times both paths end to
 * end. One JSON line per cell; the SCALING.md crossover tables are built
 * from this output.
 *
 * The corpus is deterministic (xxhash64 of the row id — uniform 64-bit
 * sketches, the adversarial case for bucket density: real near-dup
 * corpora have MORE bucket skew, not less, and the cap handles that
 * separately). Both paths are exact, so this harness never checks
 * results — only cost.
 *
 * Env: SPARK_GRAFT_HRB_DISTS (csv, default "10,12,14"),
 * SPARK_GRAFT_HRB_NS (csv, default "12500,25000,50000,100000"),
 * SPARK_GRAFT_HRB_MAXCAND (skip an e2e timing when the predicted
 * candidate volume exceeds this, default 6e9), SPARK_GRAFT_CPUS.
 */
object HammingRouteBench {

  /** Predicted + exact candidate-pair volume of one pigeonhole keying:
   * replicate the path's block extraction, count per-bucket rows, and
   * sum C(cnt,2) — a cheap aggregate, no join. */
  private def candidateVolume(df: DataFrame, combos: Seq[(Int, org.apache.spark.sql.Column)]): Long =
    df.select(posexplode(array(combos.map(_._2): _*)))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("cand")) // even product — exact
      .collect()(0).getLong(0)

  def main(args: Array[String]): Unit = {
    val dists = sys.env.getOrElse("SPARK_GRAFT_HRB_DISTS", "10,12,14")
      .split(",").map(_.trim.toInt).toSeq
    val ns = sys.env.getOrElse("SPARK_GRAFT_HRB_NS", "12500,25000,50000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val maxCand = sys.env.getOrElse("SPARK_GRAFT_HRB_MAXCAND", "6000000000").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    for (maxDist <- dists; n <- ns) {
      val sketches = Materialize(spark.range(n)
        .select(col("id").as("doc_id"), xxhash64(col("id")).as("h")))
      sketches.count() // corpus built outside every timed region

      // --- analytic + exact candidate volumes (same block math as Dedup)
      val m1 = maxDist + 1
      val w1 = 64 / m1
      val mask1 = if (w1 == 64) -1L else (1L << w1) - 1
      val combos1 = (0 until m1).map(b => b ->
        shiftrightunsigned(col("h"), b * w1).bitwiseAND(lit(mask1)))
      val m2 = maxDist + 2
      val w2 = 64 / m2
      val mask2 = (1L << w2) - 1
      def bv(b: Int) = shiftrightunsigned(col("h"), b * w2).bitwiseAND(lit(mask2))
      val combos2 = (for { i <- 0 until m2; j <- (i + 1) until m2 } yield
        (i * m2 + j) -> bv(i).bitwiseOR(shiftleft(bv(j), w2))).toSeq
      val cand1 = candidateVolume(sketches, combos1)
      val cand2 = candidateVolume(sketches, combos2)

      // --- end-to-end timings, forced per path via the nRows routing knob
      // (1 = below any floor → agree1; MaxValue = huge → agree2; both
      // paths take the identical post-join verify, so the delta is keying
      // + join volume). Skip cells whose predicted volume is off-grid.
      def e2e(forcedN: Long): Double =
        time(operators.Dedup.hammingPairs(sketches, "doc_id", "h", maxDist,
          nRows = forcedN).count())._1
      val t1 = if (cand1 <= maxCand) e2e(1L) else -1.0
      val t2 = if (cand2 <= maxCand) e2e(Long.MaxValue) else -1.0

      val ratio = if (cand2 > 0) cand1.toDouble / cand2 else -1.0
      println(s"""{"maxDist":$maxDist,"n":$n,"cand_agree1":$cand1,""" +
        s""""cand_agree2":$cand2,"cand_ratio":${Fmt.num("%.3f", ratio)},""" +
        s""""e2e_agree1_sec":${Fmt.num("%.2f", t1)},""" +
        s""""e2e_agree2_sec":${Fmt.num("%.2f", t2)}}""")
      Materialize.release(sketches)
    }
    spark.stop()
  }
}
