package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BotGen, Ingest, Tables}

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("Tables.load converts the nanos-long ts to a proper timestamp") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(e.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val (lo, hi) = {
      val r = e.agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0), r.getTimestamp(1))
    }
    assert(lo.getTime > 0 && hi.after(lo)) // sane epoch range, not raw nanos
  }

  test("Tables.load leaves tables without a long ts untouched") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.count() === 6000)
    assert(!li.schema.fields.exists(f => f.name == "ts"))
  }

  test("BotGen is deterministic for a fixed seed and differs across seeds") {
    val a = BotGen.events(nUsers = 50, nBots = 2, durationS = 60)
    val b = BotGen.events(nUsers = 50, nBots = 2, durationS = 60)
    val c = BotGen.events(nUsers = 50, nBots = 2, durationS = 60, seed = 7L)
    assert(a === b)
    assert(a !== c)
    // rates: every bot acts every 2 s; users share freqPerSec=1 actions/s
    val bots = a.count(_.ip.startsWith("172.20."))
    assert(bots === 2 * 30)
    assert(a.count(_.ip.startsWith("172.10.")) === 60)
  }

  test("wire schema round-trips through the SMT-parity key/value frame") {
    import spark.implicits._
    val evs = Seq(BotGen.Event(1767225600L, "c1", "9.9.9.9", "click")).toDF(
      "time", "categoryId", "ip", "action")
    val keyed = Ingest.toKeyedRecords(evs).head()
    assert(keyed.getString(0) === "9.9.9.9")
    assert(!keyed.getString(1).contains("9.9.9.9")) // ip stripped from value
    assert(keyed.getString(1).contains("\"categoryId\":\"c1\""))
  }
}
