package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract: smoke (entry rows>0), oracle keys ⊆ query keys,
 * and every query non-empty at the smoke SF (the driver's rows-only check). */
class ContractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val smokeDir = "/root/testdata/sf0.001"

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query returns rows at the smoke SF") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, smokeDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
