package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Streaming/batch ingestion of the clickstream wire format.
 *
 * The reference ingests via a custom Kafka Connect FS connector that tails
 * json-lines files and re-keys messages by ip (SURVEY.md §2a S4/S5,
 * `LogsSourceTask.java:68-108`, `fs-connector.properties:5-15`). Spark's file
 * streaming source already provides the directory listing, per-file offset
 * tracking and exactly-once semantics the connector hand-rolls; the SMT
 * re-key chain is a projection.
 */
object Ingest {

  /** Generator wire schema (`botgen.py:54`): ip travels inside the JSON until
   * the SMT chain moves it to the key. Explicit schema — no inference. */
  val wireSchema: StructType = StructType(Seq(
    StructField("time", LongType),
    StructField("categoryId", StringType),
    StructField("ip", StringType),
    StructField("action", StringType)))

  /** S4: streaming json-lines directory source. PERMISSIVE mode drops
   * malformed lines to null columns (the connector maps bad JSON to empty
   * records, `FileReader.java:70-76`); the downstream parse filter removes
   * them. `maxFilesPerTrigger` bounds micro-batch size at scale. */
  def jsonDirStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(wireSchema)
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Batch twin of [[jsonDirStream]] — the same logical plan is
   * batch-replayable (SURVEY.md §3 E3). */
  def jsonDirBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(wireSchema).option("mode", "PERMISSIVE").json(dir)

  /** S5 parity: the Connect SMT chain (`ValueToKey(ip)` + `ExtractField` +
   * `ReplaceField blacklist=ip,raw`) as a projection — ip becomes the key,
   * value keeps (time, categoryId, action) as JSON. */
  def toKeyedRecords(wire: DataFrame): DataFrame =
    wire.select(
      col("ip").as("key"),
      to_json(struct(col("time"), col("categoryId"), col("action"))).as("value"))

  /** Value-side schema of the keyed wire record (what [[toKeyedRecords]]
   * serializes): the SMT chain strips ip out of the value into the key. */
  val valueSchema: StructType = StructType(Seq(
    StructField("time", LongType),
    StructField("categoryId", StringType),
    StructField("action", StringType)))

  /** Inverse of [[toKeyedRecords]]: (key, value) records back to the wire
   * frame. Accepts string OR binary key/value columns (Kafka delivers
   * binary; the test queue delivers string) — the cast unifies them.
   * Malformed values null out (PERMISSIVE from_json) and are dropped by the
   * downstream parse filter, same contract as the file path. */
  def fromKeyedRecords(kv: DataFrame): DataFrame =
    kv.select(
      col("key").cast("string").as("ip"),
      from_json(col("value").cast("string"), valueSchema).as("v"))
      .select(col("v.time").as("time"), col("v.categoryId").as("categoryId"),
        col("ip"), col("v.action").as("action"))

  /** S1/S2: the real Kafka wire source. Compiles against the stable
   * string-based DataSource API; this offline environment ships no
   * spark-sql-kafka jar (SURVEY §7), so the branch is untestable here but a
   * drop-in on any cluster with the connector on the classpath — the
   * returned frame is schema-identical to [[jsonDirStream]], so every
   * downstream plan is unchanged. Mirrors the reference's subscription
   * (`ImplStructured.scala:93-102`: subscribe one topic, value is the JSON
   * wire record, key is ip after the SMT chain). */
  def kafkaStream(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      // at-scale backpressure: bound each micro-batch like maxFilesPerTrigger
      // bounds the file source
    val bounded = maxOffsetsPerTrigger.fold(reader)(n =>
      reader.option("maxOffsetsPerTrigger", n.toString))
    fromKeyedRecords(bounded.load())
  }

  /**
   * Config-switched wire source — prod adoption is a one-option change:
   *   `source=files` (default): json-lines directory tail ([[jsonDirStream]])
   *   `source=kafka`: real Kafka subscription ([[kafkaStream]];
   *     requires `kafka.bootstrap.servers` + `topic`, optional
   *     `startingOffsets`, `maxOffsetsPerTrigger`)
   *   `source=dsv2`: the engine's own DataSource V2 log tailer
   *     ([[graft.sources.v2.LogsDataSource]] — regex file discovery,
   *     line-boundary offsets, `maxBytesPerTrigger` admission control)
   * All branches return the same wire-frame schema.
   */
  def wireStream(spark: SparkSession, conf: Map[String, String]): DataFrame =
    conf.getOrElse("source", "files") match {
      case "kafka" =>
        kafkaStream(spark,
          conf("kafka.bootstrap.servers"), conf("topic"),
          conf.getOrElse("startingOffsets", "latest"),
          conf.get("maxOffsetsPerTrigger").map(_.toLong))
      case "files" =>
        jsonDirStream(spark, conf("dir"),
          conf.get("maxFilesPerTrigger").map(_.toInt).getOrElse(100))
      case "dsv2" =>
        val r = spark.readStream.format("graft-logs")
          .option("regex", conf.getOrElse("regex", ".*"))
        conf.get("maxBytesPerTrigger").fold(r)(r.option("maxBytesPerTrigger", _))
          .load(conf("dir"))
      case other =>
        throw new IllegalArgumentException(s"unknown wire source: $other")
    }

  /**
   * S6 continuous parity: a deterministic synthetic clickstream from the
   * `rate-micro-batch` source (fixed rows per batch, fixed start timestamp —
   * fully replayable, unlike the wall-clock `rate` source). Each row's
   * `value` seeds the same user/bot distributions as [[BotGen]]: 1-in-
   * (usersPerBot+1) rows is a bot action (75% click, 20 categories), the
   * rest are user actions (10% click, 10 categories) spread over nUsers.
   */
  def syntheticRateStream(spark: SparkSession, rowsPerBatch: Int = 1000,
      nUsers: Int = 1000, nBots: Int = 10, usersPerBot: Int = 9,
      userCategories: Int = 10, botCategories: Int = 20,
      startEpochS: Long = 1767225600L): DataFrame = {
    val raw = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", startEpochS * 1000L)
      .load() // (timestamp TIMESTAMP, value LONG)
    // all randomness derives from `value` (deterministic & replayable); the
    // batch timestamp is shared by every row of a batch, so it must not
    // seed anything
    val h = xxhash64(col("value"))
    val isBot = pmod(col("value"), lit(usersPerBot + 1)) === 0
    val clicks =
      when(isBot, (pmod(xxhash64(col("value"), lit(1)), lit(100)) < 75).cast("long"))
        .otherwise((pmod(xxhash64(col("value"), lit(1)), lit(100)) < 10).cast("long"))
    raw.select(
      when(isBot,
        concat(lit("172.20.0."), pmod(h, lit(nBots)).cast("string")))
        .otherwise(concat(lit("172.10.0."), pmod(h, lit(nUsers)).cast("string")))
        .as("ip"),
      col("timestamp").as("time"),
      clicks.as("clicks"),
      (lit(1L) - clicks).as("views"),
      when(isBot, (lit(1000) + pmod(xxhash64(col("value"), lit(2)), lit(botCategories))).cast("string"))
        .otherwise(pmod(xxhash64(col("value"), lit(2)), lit(userCategories)).cast("string"))
        .as("category"))
  }

  /** Batch CSV source with explicit schema — no inference pass (schema
   * inference reads every file TWICE; at 100 TB the schema is a contract,
   * not a discovery). PERMISSIVE mode nulls malformed fields; a malformed
   * row is visible as an all-null row (same drop-bad-rows contract as the
   * JSON path once filtered). Timestamps round-trip via the explicit
   * format. */
  def csvDirBatch(spark: SparkSession, dir: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(dir)

  /** Streaming twin of [[csvDirBatch]]: Spark's file source provides the
   * directory listing, per-file tracking and exactly-once admission the
   * reference's Connect FS connector hand-rolls — for CSV drops as well as
   * json-lines. */
  def csvDirStream(spark: SparkSession, dir: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Columnar-format directory sources: ORC twins of the parquet path —
   * Spark's built-in reader gives predicate pushdown, column pruning, and
   * vectorized decode for free, so a lake standardized on ORC plugs in
   * without a conversion pass. Schema is explicit for the same
   * schema-is-a-contract reason as CSV (and for the streaming source,
   * which requires it). */
  def orcDirBatch(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** Streaming twin of [[orcDirBatch]]: file-source listing/offset
   * tracking over ORC drops. */
  def orcDirStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .orc(dir)

  /** Normalized LogRecords straight from the wire frame (used when the
   * key/value round-trip isn't being exercised): one-hot + correct
   * epoch-seconds conversion, null-safe. */
  def toLogRecords(wire: DataFrame): DataFrame =
    wire
      .filter(col("ip").isNotNull && length(col("ip")) > 0 &&
        col("time").isNotNull && col("action").isNotNull)
      .select(
        col("ip"),
        timestamp_seconds(col("time")).as("time"),
        when(col("action") === "click", 1L).otherwise(0L).as("clicks"),
        when(col("action") === "view", 1L).otherwise(0L).as("views"),
        col("categoryId").as("category"))
}
