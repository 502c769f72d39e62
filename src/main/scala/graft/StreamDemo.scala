package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.functions.BotConfig
import graft.operators.BotDetection
import graft.sinks.Sinks
import graft.sources.{BotGen, Ingest}
import graft.streaming.StreamingBotDetection

/**
 * End-to-end streaming demo/smoke: deterministic botgen traffic → json-dir
 * file stream → watermarked sliding-window detection → parquet upsert sink
 * (checkpointed) → TTL-filtered read-back. The full reference pipeline
 * (SURVEY.md §3 E1) with every external system swapped for its offline
 * equivalent.
 */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val in = Files.createTempDirectory("graft-demo-in").toString
    val out = Files.createTempDirectory("graft-demo-out").toString + "/verdicts"
    val ckpt = Files.createTempDirectory("graft-demo-ckpt").toString
    BotGen.writeJsonDir(in, BotGen.events(nUsers = 200, nBots = 3, durationS = 600))

    val verdicts = StreamingBotDetection.verdictStream(
        Ingest.toLogRecords(Ingest.jsonDirStream(spark, in, maxFilesPerTrigger = 2)),
        BotDetection.referenceWindowing, BotConfig())
      .withColumn("expires_at_s",
        org.apache.spark.sql.functions.col("window_start_s") + 600L + Sinks.ttlSeconds)

    val q = Sinks.startParquetSink(verdicts, out, ckpt, triggerInterval = "1 seconds")
    q.processAllAvailable()
    q.stop()

    val result = Sinks.readVerdicts(spark, out, Seq("ip", "window_start_s"))
    val byIp = result.groupBy("ip").count().orderBy(org.apache.spark.sql.functions.desc("count"))
    println(s"=== verdict rows: ${result.count()} distinct ips: ${byIp.count()}")
    byIp.show(10, false)
    spark.stop()
  }
}
