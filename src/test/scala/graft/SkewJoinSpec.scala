package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 80% of rows land on hot key 1; the rest spread over 0..9
  private lazy val big = (0L until 1000L)
    .map(i => (if (i % 5 < 4) 1L else i % 10, i, i * 1.5))
    .toDF("k", "row_id", "v")
  private lazy val small = (0L until 10L).map(k => (k, s"name_$k")).toDF("k", "name")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "row_id", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("salted inner join is row-identical to the plain join") {
    val plain = rows(big.join(small, Seq("k")))
    val salted = rows(SkewJoin.saltedJoin(big, small, Seq("k"), col("row_id"), 16))
    assert(salted === plain)
  }

  test("salted left join surfaces unmatched big rows exactly once") {
    val withOrphan = big.unionByName(Seq((99L, 9999L, 0.0)).toDF("k", "row_id", "v"))
    val out = SkewJoin.saltedJoin(withOrphan, small, Seq("k"), col("row_id"), 16, "left")
    val orphan = out.filter(col("k") === 99L).collect()
    assert(orphan.length === 1 && orphan.head.getAs[String]("name") == null)
    assert(out.count() === big.count() + 1)
  }

  test("the hot key's rows spread across most of the salt range") {
    val spread = big.filter(col("k") === 1L)
      .select(pmod(hash(col("row_id")), lit(16)).as("salt"))
      .distinct().count()
    assert(spread >= 12, s"hot key only reached $spread/16 salts")
  }

  test("rejects join types that would duplicate unmatched replicated rows") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), col("row_id"), 16, "full")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), col("row_id"), 0)
    }
  }
}
