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

  test("fromKeyedRecords inverts toKeyedRecords, incl. Kafka's binary columns") {
    import spark.implicits._
    val evs = Seq(
      BotGen.Event(1767225600L, "c1", "9.9.9.9", "click"),
      BotGen.Event(1767225661L, "1007", "172.20.0.3", "view")).toDF(
      "time", "categoryId", "ip", "action")
    val back = Ingest.fromKeyedRecords(Ingest.toKeyedRecords(evs))
    // from_json fields are nullable — compare names+types (the wire contract)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      evs.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().toSeq === evs.collect().toSeq)
    // Kafka delivers key/value as BINARY — the same projection must decode it
    val binKv = Ingest.toKeyedRecords(evs)
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
    assert(Ingest.fromKeyedRecords(binKv).collect().toSeq === evs.collect().toSeq)
    // malformed value nulls out (PERMISSIVE), ready for the parse filter
    val bad = Seq(("1.2.3.4", "not json")).toDF("key", "value")
    val badRow = Ingest.fromKeyedRecords(bad).head()
    assert(badRow.getString(2) === "1.2.3.4" && badRow.isNullAt(0) && badRow.isNullAt(3))
  }

  test("wireStream config switch: files branch streams the wire schema") {
    val dir = java.nio.file.Files.createTempDirectory("wire-src").toString
    BotGen.writeJsonDir(dir, BotGen.events(nUsers = 10, nBots = 1, durationS = 10), nFiles = 2)
    val s = Ingest.wireStream(spark, Map("source" -> "files", "dir" -> dir))
    assert(s.isStreaming && s.schema === Ingest.wireSchema)
    intercept[IllegalArgumentException] {
      Ingest.wireStream(spark, Map("source" -> "carrier-pigeon", "dir" -> dir))
    }
    // the kafka branch requires its connection options
    intercept[NoSuchElementException] {
      Ingest.wireStream(spark, Map("source" -> "kafka"))
    }
  }
}
