package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Data-layout keys: Z-order (Morton) bit interleaving of two dimension
 * columns. Sorting/range-partitioning a table by the interleaved key
 * co-locates rows that are close in BOTH dimensions, so min/max footer
 * stats prune scans for predicates on EITHER dimension — the layout trick
 * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed here as a plain
 * deterministic column so it works with `repartitionByRange` + parquet.
 *
 * At 100 TB this is a write-time investment: one range-partitioned rewrite
 * of the fact table by `mortonKey(dimA, dimB)`, after which every file's
 * (min, max) envelope is tight in both dimensions and the reader skips
 * ~√files for a point predicate instead of reading everything (linear sort
 * order gives tight envelopes in ONE dimension only).
 *
 * Pure bit arithmetic on longs (shift/and/or) — codegen'd, no UDF, and
 * reproducible in any engine (the oracle SQL spells out the same ops).
 */
object Layout {

  /**
   * Interleave the low `bits` bits of two non-negative long columns:
   * result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. Values ≥ 2^bits
   * alias (high bits dropped) — pick `bits` to cover the dimension domain;
   * 2×bits must stay < 63.
   */
  def mortonKey(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && 2 * bits < 63, s"bits=$bits out of range")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as a DuckDB SQL expression over sub-expressions
   * `a` and `b` — keeps the oracle definitionally identical to the Spark
   * column (generated, not hand-transcribed). */
  def mortonKeySql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((((($a) >> $i) & 1)) << ${2 * i})",
        s"((((($b) >> $i) & 1)) << ${2 * i + 1})")
    }.mkString(" | ")

  /**
   * Hilbert-curve twin of [[mortonKey]] (codegen'd custom expression —
   * see [[graft.functions.HilbertKey]] for why it can't be composed bit
   * ops): same aliasing contract, selectable in [[writeZOrdered]] via
   * `curve = "hilbert"`, but consecutive key values are always
   * Manhattan-adjacent cells — no diagonal jumps, so partition boundaries
   * cut fewer clusters than Morton's.
   */
  def hilbertKey(a: Column, b: Column, bits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.HilbertKey(
        org.apache.spark.sql.graftbridge.Bridge.expression(a.cast("long")),
        org.apache.spark.sql.graftbridge.Bridge.expression(b.cast("long")), bits))

  /**
   * The Hilbert walk as GENERATED DuckDB SQL: one nested subquery per bit
   * level (the rotation rewrites x and y in terms of both previous values,
   * which is exactly why the Spark side is a custom expression — SQL
   * subqueries name intermediates, so unrolling is linear there). `from` is
   * the source relation SQL (table or subquery with the raw columns);
   * `aExpr`/`bExpr` compute the two dimensions; `carry` columns pass
   * through every level. Keeps the oracle definitionally identical to
   * [[hilbertKey]] — generated, never hand-transcribed.
   */
  def hilbertKeySql(from: String, aExpr: String, bExpr: String, bits: Int,
      carry: Seq[(String, String)]): String = {
    require(bits > 0 && 2 * bits < 63, s"bits=$bits out of range")
    val mask = (1L << bits) - 1
    // base level evaluates each carried expression once and names it; inner
    // levels pass the NAME through (the source columns are out of scope)
    val baseCarry = carry.map { case (e, n) => s", $e AS $n" }.mkString
    val levelCarry = carry.map { case (_, n) => s", $n" }.mkString
    val base =
      s"(SELECT (($aExpr) & $mask) AS hx, (($bExpr) & $mask) AS hy, CAST(0 AS BIGINT) AS hd$baseCarry FROM $from)"
    (bits - 1 to 0 by -1).foldLeft(base) { (inner, level) =>
      val s = 1L << level
      // CAST the s² literal: DuckDB types bare literals INT32, and at
      // bits=16 the top level's 2^30 × 3 overflows INT32 the moment the
      // masked x has its high bit set (high custkeys at larger SFs)
      s"""(SELECT
         |  hd + CAST(${s * s} AS BIGINT)
         |       * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |             (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd,
         |  CASE WHEN (hy & $s) > 0 THEN hx
         |       WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END AS hx,
         |  CASE WHEN (hy & $s) > 0 THEN hy
         |       WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END AS hy$levelCarry
         |FROM $inner)""".stripMargin
    }
  }

  /**
   * The write path: rewrite `df` as `nFiles` parquet files range-partitioned
   * AND sorted by the Morton key of (`aCol`, `bCol`) — each output file then
   * covers a contiguous, non-overlapping zkey range, i.e. a tight bounding
   * box in BOTH dimensions, so parquet footer min/max stats prune scans for
   * predicates on either column. `repartitionByRange` samples the key to
   * build balanced range bounds (one extra pass over a sample, the write-time
   * investment); the within-partition sort keeps row groups tight too.
   */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, aCol: String, bCol: String,
      bits: Int, nFiles: Int, path: String, curve: String = "morton"): Unit = {
    val key = curve match {
      case "morton" => mortonKey(col(aCol), col(bCol), bits)
      case "hilbert" => hilbertKey(col(aCol), col(bCol), bits)
      case other => throw new IllegalArgumentException(
        s"curve=$other (expected morton|hilbert)")
    }
    df.withColumn("__zkey", key)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Small-files compaction: rewrite a parquet directory into files of
   * roughly `targetBytes` each — the maintenance pass every streaming /
   * incremental sink eventually needs (a 40 s-trigger foreachBatch sink
   * writes ~2k files/day/partition; readers then pay per-file open +
   * footer + scheduling cost, and at 100 TB the NameNode/listing itself
   * becomes the bottleneck). The file count is derived from the CURRENT
   * on-disk byte size (sum of data-file lengths from the filesystem
   * listing, a metadata-only driver call — never a data scan), so the
   * rewrite is one shuffle-free-read → repartition → write. Returns
   * (filesBefore, filesAfter).
   *
   * `sortCols` optionally re-sorts while compacting (range partitioning +
   * within-file sort, like [[writeZOrdered]]) so the rewrite also restores
   * footer-stat locality that per-batch appends destroyed; without it the
   * repartition is round-robin (pure coalescing, minimal cost).
   */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      sortCols: Seq[Column] = Nil): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filterNot(_.getPath.getName.startsWith("_"))
    // a FLAT parquet dir only: compacting a partitioned table through a
    // plain read would inline the partition columns and destroy the layout
    // — compact each partition dir individually instead
    val subDirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subDirs.isEmpty,
      s"compact: $inPath contains subdirectories (${subDirs.take(3).mkString(", ")}…) " +
        "— looks partitioned; compact each partition directory separately")
    val dataFiles = entries.filter(_.isFile)
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    out.write.mode("overwrite").parquet(outPath)
    // resolve the OUTPUT's filesystem — in/out may live on different FSes
    // (hdfs → s3a compaction), and listing outPath on inPath's FS throws
    // Wrong FS after the data was already rewritten
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val outFs = outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = outFs.listStatus(outP)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (dataFiles.length, after)
  }

  /**
   * File-layout audit via Spark's `_metadata` hidden columns: one row per
   * data file with its byte size, row count, and a small-file flag — the
   * input [[compact]] acts on, as a QUERY instead of a driver listing
   * (at 100 TB the listing itself is distributed work; `_metadata` rides
   * the normal scan machinery and never downloads data pages — row counts
   * come from footer metadata via the count aggregate). A healthy layout
   * has small_file = false everywhere and sizes near the writer target;
   * a rising small-file fraction is the compaction trigger.
   */
  def fileAudit(spark: org.apache.spark.sql.SparkSession, path: String,
      smallBytes: Long = 32L * 1024 * 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(smallBytes > 0, s"fileAudit: smallBytes must be positive, got $smallBytes")
    // same INT64-nanos tolerance as Tables.load: the audit must not depend
    // on some earlier Tables.load having set the session conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("path"),
        col("_metadata.file_size").as("bytes"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("small_file", col("bytes") < smallBytes)
  }
}
