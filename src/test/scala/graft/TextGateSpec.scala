package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact gate keeps exactly the rows at or above the q-quantile") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val kept = TextAnalysis.qualityGate(df, col("s"), q = 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    // type-7 percentile of 1..100 at 0.25 = 1 + 0.25*99 = 25.75 -> keep 26..100
    assert(kept === (26L to 100L).toSet)
  }

  test("exact gate threshold column is exposed and constant") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val ths = TextAnalysis.qualityGate(df, col("s"), q = 0.5)
      .select("gate_th").distinct().collect().map(_.getDouble(0))
    assert(ths.length === 1)
    assert(ths.head === 5.5) // 1 + 0.5*9
  }

  test("KLL gate drift from the exact gate is within sketch rank error") {
    val dir = "/root/testdata/sf0.01"
    val docs = TextAnalysis.withQuality(
      graft.sources.Tables.load(spark, dir, "documents"))
    val n = docs.count()
    val exact = TextAnalysis.qualityGate(docs, col("stop_ratio"), q = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityGate(docs, col("stop_ratio"), q = 0.25,
        approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val drift = ((exact diff approx) ++ (approx diff exact)).size.toDouble / n
    info(f"KLL gate drift vs exact at n=$n: $drift%.4f")
    // KLL k=200 normalized rank error ~1.65% at 99% confidence; 5% is a
    // loud-failure ceiling, not a tight bound
    assert(drift <= 0.05, s"KLL gate drifted $drift from the exact gate")
  }

  test("q outside (0,1) is rejected loudly") {
    val df = Seq((1L, 1.0)).toDF("id", "s")
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityGate(df, col("s"), q = 1.0)
    }
  }
}
