package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashMix, VectorExpressions}

/** Custom-expression correctness: codegen results must equal both the
 * interpreted eval path and the (slow) higher-order-function formulations
 * they replaced. */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("float_dot equals the zip_with/aggregate formulation bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorExpressions.floatDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("slow"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("float_dot handles length mismatch and empty arrays") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(10.0f, 20.0f)), (Seq.empty[Float], Seq(1.0f)))
      .toDF("a", "b")
    val out = df.select(VectorExpressions.floatDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 50.0) // min-length semantics
    assert(out(1).getDouble(0) === 0.0)
  }

  test("simhash64 SQL function matches the operator column") {
    GraftExtensions.register(spark)
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "zzz"))
      .toDF("id", "text")
    df.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sh
        |FROM sh_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql(1L) === viaSql(2L))
    assert(viaSql(1L) !== viaSql(3L))
  }

  test("minhash signature: identical inputs identical sigs; mix is splitmix64") {
    GraftExtensions.register(spark)
    val df = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(30L, 20L, 10L)), (3L, Seq(99L)))
      .toDF("id", "hs")
    df.createOrReplaceTempView("mh_docs")
    val sigs = spark.sql("SELECT id, minhash_sig(hs, 8) AS sig FROM mh_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L)) // order-insensitive (set semantics)
    assert(sigs(1L).length === 8)
    // spot-check the construction: sig[j] = min over h of mix64(h ^ seed(j))
    val expected0 = Seq(10L, 20L, 30L).map(h => HashMix.mix64(h ^ HashMix.seed(0))).min
    assert(sigs(1L).head === expected0)
  }

  test("float_dot via SQL on the embeddings table") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT vec_id FROM emb WHERE float_dot(embedding, embedding) > 0").count()
    assert(n === 500)
  }
}
