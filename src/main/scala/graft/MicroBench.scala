package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Focused micro-benchmarks for components whose cost model matters at
 * scale but which the catalog gates exercise only at small operating
 * points. Prints one JSON line per case. Currently: centroid ASSIGNMENT
 * cost, flat argmax vs the two-level coarse→fine scan, at a cell count
 * where the √c factor is visible (the regime `Similarity.autoCellCount`
 * produces on large corpora).
 *
 * Env: SPARK_GRAFT_MB_N (vectors, default 200k), SPARK_GRAFT_MB_CELLS
 * (default 1024), SPARK_GRAFT_MB_DIM (default 64).
 */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_MB_N", "200000").toLong
    val cells = sys.env.getOrElse("SPARK_GRAFT_MB_CELLS", "1024").toInt
    val dim = sys.env.getOrElse("SPARK_GRAFT_MB_DIM", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random corpus: hash-mixed floats in [-1, 1]
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(col("id") * lit(dim) + j), lit(2000001L)) - lit(1000000L))
          .cast("double") / lit(1000000.0)).cast("float")).as("embedding"))
    val docs = graft.Materialize(
      vecs.select(col("vec_id").as("doc_id"), col("embedding").as("vec")))
    docs.count() // materialize outside the timed region
    val seeds = Similarity.seedFarthestFirst(docs, "doc_id", "vec", cells,
      sampleMod = Similarity.autoSampleMod(n))
    val cents = Similarity.trainCentroids(docs, "doc_id", "vec", cells, 1,
      Some(seeds), trainSampleMod = Similarity.autoSampleMod(n))
    graft.Materialize(cents).count()
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = df.count()
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }
    val flat = time("assign_flat")(
      Similarity.nearestCells(docs, "vec", cents, 2))
    val two = time("assign_two_level")(
      Similarity.nearestCellsTwoLevel(docs, "vec", cents, 2))
    val results = Seq(flat, two)
    val qs = results.map { case (k, v, r) => s""""$k":{"sec":$v,"rows":$r}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"assignment_bench","n":$n,"cells":$cells,"dim":$dim,"cases":$qs}""")
    spark.stop()
  }
}
