package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Ingest, Tables}

class CsvSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("CSV round-trip preserves the events table exactly (incl. microsecond timestamps)") {
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = tmp("csv-events")
    src.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(dir)
    val back = Ingest.csvDirBatch(spark, dir, eventsSchema)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      eventsSchema.map(f => (f.name, f.dataType)))
    val a = src.orderBy("event_id").collect().map(_.toSeq)
    val b = back.orderBy("event_id").collect().map(_.toSeq)
    assert(b.length === a.length)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("PERMISSIVE mode nulls malformed fields instead of failing the read") {
    val dir = tmp("csv-bad")
    Files.write(Paths.get(dir, "part.csv"), java.util.Arrays.asList(
      "event_id,ts,user_id,event_type,value,props",
      "1,2026-01-01 00:00:00,7,click,1.5,{}",
      "not-a-number,garbage-ts,alpha,view,xyz,{}", // malformed row
      "3,2026-01-02 12:30:00,9,view,2.5,{}"))
    val rows = Ingest.csvDirBatch(spark, dir, eventsSchema).collect()
    assert(rows.length === 3)
    // the malformed row surfaces with its unparseable fields nulled
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(4)))
    // the well-formed rows parse fully
    assert(rows.count(r => !r.isNullAt(0)) === 2)
  }

  test("streaming CSV directory source admits files incrementally") {
    val dir = tmp("csv-stream")
    def writeFile(n: Int, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, f"f$n%03d.csv"),
        ("event_id,ts,user_id,event_type,value,props" +: lines).asJava)
    writeFile(0, Seq("1,2026-01-01 00:00:00,7,click,1.5,{}"))
    val q = Ingest.csvDirStream(spark, dir, eventsSchema)
      .writeStream.format("memory").queryName("csv_stream_sink")
      .option("checkpointLocation", tmp("csv-ckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("csv_stream_sink").count() === 1)
      writeFile(1, Seq("2,2026-01-01 01:00:00,8,view,2.0,{}",
        "3,2026-01-01 02:00:00,9,view,3.0,{}"))
      q.processAllAvailable()
      val got = spark.table("csv_stream_sink")
      assert(got.count() === 3)
      assert(got.agg(sum(col("value"))).collect()(0).getDouble(0) === 6.5)
    } finally q.stop()
  }

  test("ORC round-trip preserves the events table; streaming source admits files") {
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = tmp("orc-events")
    src.write.mode("overwrite").orc(dir)
    val back = Ingest.orcDirBatch(spark, dir, eventsSchema)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      eventsSchema.map(f => (f.name, f.dataType)))
    val a = src.orderBy("event_id").collect().map(_.toSeq)
    val b = back.orderBy("event_id").collect().map(_.toSeq)
    assert(b.length === a.length && a.zip(b).forall { case (x, y) => x == y })
    // predicate pushdown reaches the ORC scan (the point of the format)
    val plan = Ingest.orcDirBatch(spark, dir, eventsSchema)
      .filter(col("event_id") === 1L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,1)]"),
      plan.take(800))
    // streaming twin: files admitted incrementally
    val sdir = tmp("orc-stream")
    src.limit(5).write.mode("append").orc(sdir)
    val q = Ingest.orcDirStream(spark, sdir, eventsSchema)
      .writeStream.format("memory").queryName("orc_stream_sink")
      .option("checkpointLocation", tmp("orc-ckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("orc_stream_sink").count() === 5)
      src.limit(3).write.mode("append").orc(sdir)
      q.processAllAvailable()
      assert(spark.table("orc_stream_sink").count() === 8)
    } finally q.stop()
  }

  private implicit class SeqOps(s: Seq[String]) {
    def asJava: java.util.List[String] = {
      val l = new java.util.ArrayList[String]()
      s.foreach(l.add)
      l
    }
  }
}
