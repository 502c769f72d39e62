package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // key 1: quotes at t=10, 20, 30; key 2: one quote at t=100
  private lazy val quotes = Seq(
    (1L, ts(10), 100.0), (1L, ts(20), 200.0), (1L, ts(30), 300.0),
    (2L, ts(100), 999.0)).toDF("q_key", "q_ts", "price")

  // key 1 trades straddling the quotes; key 3 has no quotes at all
  private lazy val trades = Seq(
    (1L, ts(5), "t0"),   // before any quote
    (1L, ts(20), "t1"),  // exactly on a quote
    (1L, ts(25), "t2"),  // between quotes
    (1L, ts(99), "t3"),  // after the last quote
    (3L, ts(50), "t4")).toDF("t_key", "t_ts", "trade_id")

  private def run(inclusive: Boolean): Map[String, Option[Double]] =
    AsOfJoin.asOfBackward(trades, "t_key", "t_ts", quotes, "q_key", "q_ts",
        Seq("price"), inclusive)
      .collect().map { r =>
        r.getString(2) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }.toMap

  test("inclusive as-of picks the latest right row at or before each left row") {
    val m = run(inclusive = true)
    assert(m("t0") === None)          // nothing before t=5
    assert(m("t1") === Some(200.0))   // equal time matches
    assert(m("t2") === Some(200.0))   // latest ≤ 25 is t=20
    assert(m("t3") === Some(300.0))   // carried forward past the last quote
    assert(m("t4") === None)          // key with no right rows at all
  }

  test("exclusive as-of ignores right rows at exactly the left time") {
    val m = run(inclusive = false)
    assert(m("t1") === Some(100.0))   // t=20 quote excluded, falls back to t=10
    assert(m("t2") === Some(200.0))   // strict inequality irrelevant off-tie
  }

  test("left columns come through unchanged; payload keeps its name") {
    val out = AsOfJoin.asOfBackward(trades, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("price"))
    assert(out.columns.toSeq === Seq("t_key", "t_ts", "trade_id", "price"))
    assert(out.count() === trades.count())  // one output row per left row
  }

  test("plan shuffles once on the key — no join of left against right") {
    val out = AsOfJoin.asOfBackward(trades, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("price"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"), "as-of must not plan a nested-loop join")
    assert(!physical.contains("SortMergeJoin") && !physical.contains("BroadcastHashJoin"),
      "as-of is union+window, not a binary join")
  }

  test("right rows with NULL time match nothing (ASOF semantics)") {
    val nullQuote = Seq((1L, Option.empty[java.sql.Timestamp], 777.0))
      .toDF("q_key", "q_ts", "price")
    val out = AsOfJoin.asOfBackward(
        trades.filter(col("t_key") === 1L), "t_key", "t_ts",
        quotes.unionByName(nullQuote), "q_key", "q_ts", Seq("price"))
      .collect().map { r =>
        r.getString(2) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }.toMap
    assert(out("t0") === None, "null-time right row must not be carried")
    assert(out("t1") === Some(200.0))
  }

  test("empty right side and NULL left times degrade to null payload") {
    val emptyQuotes = quotes.filter(col("q_key") === -1L)
    val allNull = AsOfJoin.asOfBackward(trades, "t_key", "t_ts",
        emptyQuotes, "q_key", "q_ts", Seq("price"))
      .collect()
    assert(allNull.length === trades.count())
    assert(allNull.forall(_.isNullAt(3)))

    val nullTsTrade = Seq((1L, Option.empty[java.sql.Timestamp], "tnull"))
      .toDF("t_key", "t_ts", "trade_id")
    val out = AsOfJoin.asOfBackward(nullTsTrade, "t_key", "t_ts",
        quotes, "q_key", "q_ts", Seq("price")).collect()
    // a left row with no time sorts before every quote -> no match
    assert(out.length === 1 && out(0).isNullAt(3))
  }
}
