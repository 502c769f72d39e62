package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb session
    // startup (JIT, codegen compiler init, shuffle service threads).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Parquet reader/writer path warmup (Hadoop FS init, footer reader,
    // vectorized reader codegen) against a throwaway file — the measured
    // queries' first parquet scan otherwise pays ~1s of one-time init.
    // Warms code paths only; never touches the benchmark tables.
    val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-warm")
    try {
      spark.range(100L).selectExpr("id", "cast(id as string) s")
        .write.mode("overwrite").parquet(warmDir.toString)
      spark.read.parquet(warmDir.toString).selectExpr("count(distinct s)").collect()
    } finally {
      // the temp parquet dir would otherwise leak on every bench run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(warmDir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop per-query persist barriers so caches don't accumulate across
      // the suite (materialization cost was already paid inside the timing)
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
