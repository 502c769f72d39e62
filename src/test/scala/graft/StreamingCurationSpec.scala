package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCuration

class StreamingCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("per-key cap gate admits at most n rows per key across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[(String, Long)](spark)
    val docs = input.toDF().toDF("source", "doc_id")
    val outDir = tmp("cap-out")
    val q = StreamingCuration.perKeyCapGate(docs, "source", "doc_id", maxPerKey = 3)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("cap-ckpt"))
      .format("parquet").option("path", outDir).start()
    try {
      // batch 1: hot source already over cap in one batch (id order wins)
      input.addData(("hot", 5L), ("hot", 1L), ("hot", 9L), ("hot", 3L), ("cold", 10L))
      q.processAllAvailable()
      // batch 2: hot is full — nothing more admitted; cold still has room
      input.addData(("hot", 0L), ("cold", 11L), ("cold", 12L), ("cold", 13L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    // hot: the 3 smallest ids of batch 1 (in-batch tie-break), never id 0
    // from batch 2 (lifetime state, not per-batch); cold: 10 + first 2 more
    assert(out === Set("hot" -> 1L, "hot" -> 3L, "hot" -> 5L,
      "cold" -> 10L, "cold" -> 11L, "cold" -> 12L))
  }

  test("contamination gate splits clean vs flagged across micro-batches") {
    import spark.implicits._
    val eval = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val (cleanDir, qDir, ckpt) = (tmp("cur-clean"), tmp("cur-q"), tmp("cur-ckpt"))

    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingCuration.startContaminationGate(
      docs, eval, cleanDir, qDir, ckpt, n = 3)
    try {
      // batch 1: one contaminated (3 shared 3-grams), one clean
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "nothing in common with anything at all"))
      q.processAllAvailable()
      // batch 2: one more contaminated (1 shared), one clean — the eval
      // shingle set is reused, not recomputed
      input.addData(
        (3L, "watch the red fox jumps high today"),
        (4L, "completely unrelated content again"))
      q.processAllAvailable()
    } finally q.stop()

    val clean = spark.read.parquet(cleanDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(2L, 4L))
    val quarantined = spark.read.parquet(qDir)
      .select("doc_id", "n_shared").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(quarantined === Map(1L -> 3L, 3L -> 1L))
    // quarantine keeps the text for audit
    assert(spark.read.parquet(qDir).columns.toSet === Set("doc_id", "text", "n_shared"))
  }

  test("streaming quality gate with a batch-trained threshold matches the batch gate") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.01", "documents")
    val scored = TextAnalysis.withQuality(corpus)
    val th = TextAnalysis.quantileThreshold(scored, col("stop_ratio"), 0.25).get
    val batchKept = TextAnalysis.qualityGate(scored, col("stop_ratio"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val outDir = tmp("gate-out")
    val ckpt = tmp("gate-ckpt")
    val input = MemoryStream[(Long, Double)](spark)
    val gated = StreamingCuration.qualityGateStream(
      input.toDF().toDF("doc_id", "stop_ratio"), col("stop_ratio"), th)
    val q = gated.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    try {
      // replay the whole corpus through the stream in two batches
      val rows = scored.select("doc_id", "stop_ratio")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamKept = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamKept === batchKept,
      "stream gate with the batch-trained threshold must match the batch gate")
    // empty corpus -> no threshold, loudly optional
    assert(TextAnalysis.quantileThreshold(
      scored.filter(col("doc_id") < 0), col("stop_ratio"), 0.25).isEmpty)
  }

  test("JS drift monitor flags a shifted batch mix, matches the batch operator") {
    import spark.implicits._
    val ref = Seq("a", "a", "b", "b").toDF("cat")
    val input = MemoryStream[String](spark)
    val outDir = tmp("drift-out")
    val q = graft.streaming.StreamingDrift.startJsDriftMonitor(
      input.toDF().toDF("cat"), ref, "cat", threshold = 0.25,
      outDir, tmp("drift-ckpt"))
    try {
      // batch 0: same mix as the reference → jsd 0, not drifted
      input.addData("a", "a", "b", "b")
      q.processAllAvailable()
      // batch 1: an entirely new category → jsd = ln 2, drifted
      input.addData("c", "c", "c", "c")
      q.processAllAvailable()
      // batch 2: rows present but category all NULL — no evidence, no row
      input.addData(null.asInstanceOf[String], null.asInstanceOf[String])
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_cats"),
          r.getAs[Double]("jsd"), r.getAs[Boolean]("drifted")))).toMap
    assert(out.size === 2, s"all-NULL batch must emit nothing: $out")
    assert(out(0L) === ((4L, 2L, 0.0, false)))
    // full category swap: JSD = ln 2 (the distribution's upper bound)
    assert(out(1L)._1 === 4L && out(1L)._2 === 3L && out(1L)._4 === true)
    assert(math.abs(out(1L)._3 - math.log(2)) < 1e-6)
    // arithmetic parity with the batch operator on the same frames
    val batchJsd = graft.operators.DataQuality.jsDivergence(
        ref, Seq("c", "c", "c", "c").toDF("cat"), col("cat"))
      .agg(sum(col("contrib"))).head().getDouble(0)
    assert(math.abs(out(1L)._3 - batchJsd) < 1e-9)
  }

  test("PSI drift monitor: in-distribution batch stable, shifted batch flagged") {
    import spark.implicits._
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val input = MemoryStream[Double](spark)
    val outDir = tmp("psi-out")
    val q = graft.streaming.StreamingDrift.startPsiDriftMonitor(
      input.toDF().toDF("v"), ref, "v", threshold = 0.25,
      outDir, tmp("psi-ckpt"), nBuckets = 10)
    try {
      // batch 0: one value per reference decile → near-uniform mass, stable
      input.addData((1 to 10).map(i => i * 100.0 - 50.0): _*)
      q.processAllAvailable()
      // batch 1: everything beyond the reference's p90 → drifted
      input.addData((1 to 10).map(i => 950.0 + i): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("psi"),
          r.getAs[Boolean]("drifted")))).toMap
    assert(out(0L)._1 === 10L && !out(0L)._3, s"stable batch: ${out(0L)}")
    assert(out(1L)._1 === 10L && out(1L)._3, s"shifted batch: ${out(1L)}")
    // parity with the batch operator's total on the same frames
    val batchPsi = graft.operators.DataQuality.populationStability(
        ref, (1 to 10).map(i => 950.0 + i).toDF("v"), col("v"), nBuckets = 10)
      .agg(sum(col("contrib"))).head().getDouble(0)
    assert(math.abs(out(1L)._2 - batchPsi) < 1e-6)
  }

  test("encoding-hygiene gate flags dirty rows in-stream, matches the batch audit") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "plain ascii"),
      (2L, "cafÃ© mojibake"),     // mojibake → repair
      (3L, "bad�byte"),           // replacement char → repair
      (4L, "ctrl\u0007here"),     // BEL → repair
      (5L, "résumé fine"),        // real accents: clean, high ascii ppm
      (6L, ""),                   // empty: clean by definition
      (7L, "ééééa"),              // clean but ppm 200000 < floor → quarantine
      (8L, null.asInstanceOf[String])) // NULL text: flag must stay TOTAL
    val outDir = tmp("hyg-out"); val ckpt = tmp("hyg-ckpt")
    val input = MemoryStream[(Long, String)](spark)
    val gated = StreamingCuration.hygieneGateStream(
      input.toDF().toDF("doc_id", "text"), minAsciiPpm = 400000L)
    val q = gated.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    try {
      input.addData(docs.take(3)); q.processAllAvailable()
      input.addData(docs.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(outDir)
    val flags = got.select("doc_id", "quarantine").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // doc 8 (NULL text): metrics are NULL but the flag coalesces to TRUE —
    // a tri-state flag would route the row to NEITHER split sink
    assert(flags === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false, 7L -> true, 8L -> true))
    // the streamed metric columns are row-identical to the batch audit
    val metricCols = Seq("n_replacement", "n_control", "n_mojibake",
      "n_nonascii", "ascii_ppm", "needs_repair")
    val streamed = got.select("doc_id", metricCols: _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val batch = TextAnalysis.encodingAudit(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed === batch)
    // the payload rides through the gate (full row + metrics, not id-only)
    assert(got.columns.take(2).toSeq === Seq("doc_id", "text"))
    // re-gating the gate's own output would duplicate the audit columns and
    // make every downstream reference ambiguous — refuse loudly at wiring
    val regate = intercept[IllegalArgumentException](
      StreamingCuration.hygieneGateStream(got))
    assert(regate.getMessage.contains("audit column"))
  }
}
