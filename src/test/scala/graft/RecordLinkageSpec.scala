package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RecordLinkage

class RecordLinkageSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, block, name, val)
  private lazy val recs = Seq(
    (1L, "b1", "ann", 10.0),
    (2L, "b1", "ann", 12.0),
    (3L, "b1", "bob", 500.0),
    (4L, "b2", "cat", 7.0),
    (5L, "b3", "dan", 1.0)).toDF("id", "block", "name", "v")

  test("selfBlockPairs pairs within blocks only, id_a < id_b, suffixed columns") {
    val pairs = RecordLinkage.selfBlockPairs(recs, "id", Seq("block"))
    assert(pairs.columns.toSet ===
      Set("block", "id_a", "name_a", "v_a", "id_b", "name_b", "v_b"))
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // b1 has 3 records → 3 pairs; singleton blocks pair nothing
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("selfBlockPairs maxBlockFreq caps a degenerate block") {
    val blob = (1 to 100).map(i => (i.toLong, "hot", s"n$i", i.toDouble))
      .toDF("id", "block", "name", "v")
    val capped = RecordLinkage.selfBlockPairs(blob, "id", Seq("block"),
      maxBlockFreq = Some(10))
    assert(capped.count() <= 45L) // ≤ C(10,2), not C(100,2)=4950
  }

  test("scorePairs sums fixed-order log-odds and matches the scalar formula") {
    val pairs = RecordLinkage.selfBlockPairs(recs, "id", Seq("block"))
      .withColumn("name_agree", col("name_a") === col("name_b"))
      .withColumn("v_agree", abs(col("v_a") - col("v_b")) < 5.0)
    val scored = RecordLinkage.scorePairs(pairs,
        Seq(("name_agree", 0.9, 0.1), ("v_agree", 0.8, 0.2)))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("fs_score")).toMap
    def w(agree: Boolean, m: Double, u: Double) =
      if (agree) math.log(m / u) else math.log((1.0 - m) / (1.0 - u))
    def exp(nameA: Boolean, vA: Boolean) =
      BigDecimal(w(nameA, 0.9, 0.1) + w(vA, 0.8, 0.2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored((1L, 2L)) === exp(nameA = true, vA = true))   // ann/ann, |10−12|<5
    assert(scored((1L, 3L)) === exp(nameA = false, vA = false)) // ann/bob, far
    assert(scored((1L, 2L)) > scored((1L, 3L)))
    // m/u sanity guard
    intercept[IllegalArgumentException](
      RecordLinkage.scorePairs(pairs, Seq(("name_agree", 0.2, 0.9))))
  }
}
