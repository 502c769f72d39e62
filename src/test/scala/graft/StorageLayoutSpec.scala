package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/**
 * Write-side storage layout beyond the z-order/Hilbert clustering:
 * partitioned tables with partition PRUNING at read, and parquet schema
 * evolution — the two storage behaviors a 100 TB pipeline leans on daily.
 */
class StorageLayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("day-partitioned write prunes partitions at read (plan + files)") {
    val dir = Files.createTempDirectory("part-write").toString + "/t"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts").isNotNull)
      .withColumn("day_s", floor(col("ts").cast("long") / 86400L).cast("long") * 86400L)
    events.write.partitionBy("day_s").parquet(dir)
    val days = events.select(col("day_s")).distinct().collect().map(_.getLong(0)).sorted
    assert(days.length > 5, s"need several partitions, got ${days.length}")
    val oneDay = spark.read.parquet(dir).filter(col("day_s") === days.head)
    // the partition predicate must become a PartitionFilter (metadata-only
    // pruning), NOT a data filter evaluated per row
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("day_s"),
      s"expected day_s in PartitionFilters:\n${plan.take(1500)}")
    // and it reads exactly that day's rows
    assert(oneDay.count() === events.filter(col("day_s") === days.head).count())
    // file-level proof: only the matching partition dir is listed
    val scanned = oneDay.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"day_s=${days.head}")),
      s"scan touched non-matching partitions: $scanned")
  }

  test("IVF cell-partitioned write prunes the scan to the probed cells") {
    // the ivfTopK 100 TB story made concrete: cell_id becomes a partition
    // column at write time, so a query's nProbes-cell restriction is
    // metadata-only partition pruning — the scan never opens the other
    // nCells - nProbes directories
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = graft.operators.Similarity
      .trainCentroids(e, "vec_id", "embedding", nCells = 16)
    val assigned = graft.operators.Similarity.nearestCell(
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec")),
      "nvec", centroids)
    val dir = Files.createTempDirectory("ivf-part").toString + "/corpus"
    assigned.write.partitionBy("cell_id").parquet(dir)

    val cells = assigned.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cells.length > 4, s"need several populated cells, got ${cells.length}")
    val probed = cells.take(3)
    val probe = spark.read.parquet(dir).filter(col("cell_id").isin(probed: _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("cell_id"),
      s"expected cell_id in PartitionFilters:\n${plan.take(1500)}")
    // row parity with the unpartitioned frame, and file-level pruning proof
    assert(probe.count() === assigned.filter(col("cell_id").isin(probed: _*)).count())
    val scanned = probe.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scanned.nonEmpty &&
      scanned.forall(f => probed.exists(c => f.contains(s"cell_id=$c"))),
      s"scan touched non-probed cells: $scanned")
  }

  test("parquet schema evolution: appended columns merge, old rows read as null") {
    val dir = Files.createTempDirectory("schema-evo").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30.0)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")), "pre-evolution rows read v2 as null")
    assert(rows(2).getDouble(rows(2).fieldIndex("v2")) === 30.0)
    // without mergeSchema the footer picked must still read consistently
    // (column subset, no crash) — pin the behavior so it can't regress silently
    val unmergedCols = spark.read.parquet(dir).columns.toSet
    assert(unmergedCols.subsetOf(Set("id", "v1", "v2")) && unmergedCols.contains("id"))
  }

  test("compact rewrites a many-small-files table into size-targeted files") {
    val base = Files.createTempDirectory("compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    // simulate a streaming sink's droppings: 64 tiny files
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(64).write.parquet(in)
    val inRows = spark.read.parquet(in).collect().toSet

    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val totalBytes = dataFiles(in).map(_.getLen).sum
    // target ≈ a quarter of the table → expect ~4 files, far below 64
    val target = totalBytes / 4
    val (before, after) = graft.operators.Layout.compact(spark, in, out, target)
    assert(before === 64)
    assert(after <= 6 && after >= 3, s"expected ~4 compacted files, got $after")
    // lossless: same rows, and no output file wildly above target
    assert(spark.read.parquet(out).collect().toSet === inRows)
    val maxOut = dataFiles(out).map(_.getLen).max
    assert(maxOut < target * 3, s"a compacted file ($maxOut B) blew past the target ($target B)")

    // sorted variant restores footer locality: each file's (min,max) user_id
    // envelope must be disjoint from the others (range partitioning)
    val outSorted = s"$base/out_sorted"
    graft.operators.Layout.compact(spark, in, outSorted, target,
      sortCols = Seq(col("user_id")))
    val envelopes = dataFiles(outSorted).map { st =>
      val f = spark.read.parquet(st.getPath.toString)
      val r = f.agg(min("user_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    envelopes.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"sorted compaction must produce non-overlapping ranges: $envelopes")
      case _ =>
    }
  }

  test("fileAudit reports per-file bytes/rows via _metadata, flags small files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-in").toString
    // 4 files of 25 rows each
    spark.range(100).select(col("id")).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val out = graft.operators.Layout.fileAudit(spark, dir).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("n_rows")).sum === 100L)
    assert(out.forall(_.getAs[Long]("bytes") > 0L))
    // every tiny test file sits under the default 32 MB bar
    assert(out.forall(_.getAs[Boolean]("small_file")))
    // a 1-byte bar flags nothing
    val none = graft.operators.Layout.fileAudit(spark, dir, smallBytes = 1L)
      .collect()
    assert(none.forall(!_.getAs[Boolean]("small_file")))
    intercept[IllegalArgumentException](
      graft.operators.Layout.fileAudit(spark, dir, smallBytes = 0L))
  }
}
