package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The production IVF-PQ lifecycle: build the index ONCE, persist the three
 * artifacts as plain parquet, search the reloaded artifacts — results must
 * be identical to searching the in-memory build. Pins that the artifact
 * schemas (binary-free: ids, float arrays, int codes) survive a parquet
 * round-trip, which is what lets a 100 TB deployment amortize the build. */
class IvfPqIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("persisted index artifacts search identically to the in-memory build") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val (centroids, codebooks, corpusCodes) =
      Similarity.ivfPqBuild(e, "vec_id", "embedding", dim = 64, nCells = 4)
    val direct = Similarity.ivfPqSearch(centroids, codebooks, corpusCodes,
        e, "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      centroids.write.parquet(s"$dir/centroids")
      codebooks.write.parquet(s"$dir/codebooks")
      corpusCodes.write.parquet(s"$dir/codes")
      val reloaded = Similarity.ivfPqSearch(
          spark.read.parquet(s"$dir/centroids"),
          spark.read.parquet(s"$dir/codebooks"),
          spark.read.parquet(s"$dir/codes"),
          e, "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(reloaded === direct,
        "search over parquet-reloaded artifacts must equal the in-memory search")
      assert(direct.size === 50) // 10 queries × k=5, full top-k everywhere
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { s =>
        s.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
