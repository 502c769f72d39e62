package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Affinity

class AffinitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // b1:{A,B,C} b2:{A,B} b3:{B,C} b4:{A}; duplicate rows must collapse
  private lazy val baskets = Seq(
    (1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "B"), (3L, "C"),
    (4L, "A")
  ).toDF("basket_id", "item")

  private def byPair(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
      ((r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
        r.getAs[Double]("conf_a_to_b"), r.getAs[Double]("conf_b_to_a"),
        r.getAs[Double]("lift")))).toMap

  test("associationRules computes support, confidence, and lift by hand") {
    val out = byPair(Affinity.associationRules(baskets, "basket_id", "item"))
    // n_baskets = 4; n_A = 3, n_B = 3, n_C = 2
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) === ((2L, 0.5, 0.666667, 0.666667, 0.888889)))
    assert(out(("A", "C")) === ((1L, 0.25, 0.333333, 0.5, 0.666667)))
    assert(out(("B", "C")) === ((2L, 0.5, 0.666667, 1.0, 1.333333)))
  }

  test("minPairCount prunes rare pairs; null baskets and items are dropped") {
    val out = byPair(Affinity.associationRules(baskets, "basket_id", "item",
      minPairCount = 2L))
    assert(out.keySet === Set(("A", "B"), ("B", "C")))
    val withNulls = baskets.union(Seq((null.asInstanceOf[java.lang.Long], "A"),
      (java.lang.Long.valueOf(9L), null.asInstanceOf[String]))
      .toDF("basket_id", "item"))
    assert(byPair(Affinity.associationRules(withNulls, "basket_id", "item")) ===
      byPair(Affinity.associationRules(baskets, "basket_id", "item")))
  }

  test("maxBasketItems drops over-broad baskets before pairing") {
    // cap 2 drops b1 (3 distinct items); only b2={A,B} and b3={B,C} pair up;
    // totals shrink accordingly: n_baskets=3 (b2,b3,b4), n_A=2, n_B=2, n_C=1
    val out = byPair(Affinity.associationRules(baskets, "basket_id", "item",
      maxBasketItems = Some(2)))
    assert(out.keySet === Set(("A", "B"), ("B", "C")))
    assert(out(("A", "B"))._1 === 1L)
    assert(out(("A", "B"))._5 === 0.75) // 1*3/(2*2)
    assert(out(("B", "C"))._5 === 1.5)  // 1*3/(2*1)
  }

  test("pair generation is a basket-keyed equi-join, not a cartesian") {
    val plan = Affinity.associationRules(baskets, "basket_id", "item")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
