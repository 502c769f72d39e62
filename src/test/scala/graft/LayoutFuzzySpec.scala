package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FuzzyJoin, Layout}

class LayoutFuzzySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mortonKey interleaves bits (known values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.mortonKey(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0))
    // interleave(3=0b011, 5=0b101): a bits at even positions, b at odd →
    // 0b100111 = 39; 16 bits of ones each → 32 bits of ones
    assert(out.toSeq === Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-order bucketing bounds BOTH dimensions; linear order only one") {
    // 32×32 grid of points, 16 buckets of 64 points each
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def avgSpans(bucket: org.apache.spark.sql.Column): (Double, Double) = {
      val r = grid.groupBy(bucket.as("b"))
        .agg((max(col("x")) - min(col("x"))).as("sx"), (max(col("y")) - min(col("y"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy"))).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // z-order: top 4 bits of the 10-bit morton key → 4×4 macro-cells of 8×8
    val (zx, zy) = avgSpans(shiftrightunsigned(Layout.mortonKey(col("x"), col("y"), 5), 6))
    // linear: bucket by x alone (the "sort by one column" layout)
    val (lx, ly) = avgSpans(floor(col("x") / 2))
    assert(zx === 7.0 && zy === 7.0)  // every z-bucket is a tight 8×8 box
    assert(lx <= 1.0 && ly === 31.0)  // linear: tight in x, FULL span in y
  }

  test("fuzzy self-join finds exactly the distance ≤1 pairs (vs brute force)") {
    val names = Seq("kitten", "sitten", "sittes", "kitte", "kittens", "apple", "appl e")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = names.toDF("id", "s")
    val got = FuzzyJoin.selfJoin(df, "id", "s")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val expected = (for {
      (ia, a) <- names; (ib, b) <- names if ia < ib
      if levenshteinDist(a, b) <= 1
    } yield (ia, ib)).toSet
    assert(got === expected && got.nonEmpty)
    // sanity on content: substitution, deletion, insertion all found
    assert(got.contains((0L, 1L)))  // kitten→sitten substitution
    assert(got.contains((0L, 3L)))  // kitten→kitte deletion
    assert(got.contains((0L, 4L)))  // kitten→kittens insertion
  }

  test("hilbertKey is a bijection with unit-step adjacency (no diagonal jumps)") {
    val n = 16 // bits = 4
    val cells = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbertKey(col("x"), col("y"), 4).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    // bijection onto 0 .. n²-1
    assert(cells.map(_._1).sorted.toSeq === (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property Morton lacks: consecutive indexes are always
    // Manhattan-distance-1 cells
    val byD = cells.toMap
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
    // known first quadrant walk at bits=1: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3
    val tiny = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y"), 1)).collect().map(_.getLong(0))
    assert(tiny.toSeq === Seq(0L, 1L, 2L, 3L))
    // SQL surface parity (extension-registered function)
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT hilbert_key(3L, 5L, 4)").collect()(0).getLong(0)
    val viaCol = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y"), 4)).collect()(0).getLong(0)
    assert(viaSql === viaCol)
  }

  test("writeZOrdered produces files whose REAL footers bound both dimensions") {
    import java.nio.file.{Files, Paths}
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def perFileAvgArea(dir: String): Double = {
      val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      assert(parts.length > 4, s"expected multiple files, got ${parts.length}")
      val areas = parts.map { p =>
        val r = spark.read.parquet(p)
          .agg((max(col("x")) - min(col("x")) + 1) * (max(col("y")) - min(col("y")) + 1))
          .collect()(0).getLong(0)
        r.toDouble
      }
      areas.sum / areas.length
    }
    val zdir = Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(grid, "x", "y", bits = 6, nFiles = 16, zdir)
    val ldir = Files.createTempDirectory("linear").toString + "/t"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(ldir)
    val (zArea, lArea) = (perFileAvgArea(zdir), perFileAvgArea(ldir))
    // ideal z-order: 16 files × 16×16 blocks (area 256); linear: 4-col
    // stripes of full height (area 256 too BUT only prunable in x) — the
    // meaningful comparison is the worst-dimension span, so check area AND
    // that z-order bounds BOTH dims while linear leaves y unbounded
    assert(zArea <= 4 * 256.0, s"z-order files should be near-square blocks, avg area $zArea")
    val ySpansLinear = Files.list(Paths.get(ldir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet"))
      .map(p => spark.read.parquet(p).agg(max(col("y")) - min(col("y"))).collect()(0).getLong(0))
    assert(ySpansLinear.forall(_ === 63L), "x-sorted layout cannot prune on y")
    val ySpansZ = Files.list(Paths.get(zdir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet"))
      .map(p => spark.read.parquet(p).agg(max(col("y")) - min(col("y"))).collect()(0).getLong(0))
    assert(ySpansZ.max < 32L, s"z-order files must bound y too: ${ySpansZ.toSeq}")
  }

  test("maxKeyFreq caps hot-key blow-up; rare-name pairs survive") {
    // 1000 identical names would emit ~500k candidate pairs uncapped — the
    // cap drops the hot variant keys so the identical block contributes
    // nothing, while distance-1 pairs among rare names are still found
    // (their variant keys stay under the cap).
    val hot = (0L until 1000L).map(i => (i, "smith"))
    val rare = Seq((2000L, "kitten"), (2001L, "sitten"), (2002L, "unique"))
    val df = (hot ++ rare).toDF("id", "s")
    val capped = FuzzyJoin.selfJoin(df, "id", "s", maxKeyFreq = Some(10))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped === Set((2000L, 2001L)))
    // uncapped on the rare subset alone agrees — the cap only removed
    // hot-key pairs, it didn't change the underlying distance semantics
    val uncappedRare = FuzzyJoin.selfJoin(rare.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(uncappedRare === Set((2000L, 2001L)))
  }

  test("fuzzy join handles empty and single-char strings") {
    val df = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "b")).toDF("id", "s")
    val got = FuzzyJoin.selfJoin(df, "id", "s")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // ""↔"a" (ins), "a"↔"ab" (ins), ""↔"b" (ins), "a"↔"b" (sub), "ab"↔"b" (del)
    assert(got === Set((0L, 1L), (1L, 2L), (0L, 3L), (1L, 3L), (2L, 3L)))
  }

  /** Plain DP Levenshtein — the spec's independent definition. */
  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
