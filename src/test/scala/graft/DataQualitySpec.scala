package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some("a"), 10.0, "OK"),
    (2L, Some("b"), 20.0, "OK"),
    (3L, None, 30.0, "BAD"),
    (4L, Some("d"), 999.0, "OK"),
    (4L, Some("e"), 40.0, "OK") // duplicate key
  ).toDF("id", "opt", "amount", "status")

  test("report computes completeness/distinctness/bounds/in_set fractions") {
    val rep = DataQuality.report(t, Seq(
        Completeness("opt", minFraction = 0.9),
        Distinctness("id"),
        Bounds("amount", 0.0, 100.0, minFraction = 0.8),
        InSet("status", Seq("OK"), minFraction = 0.7)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("completeness(opt)") === ((0.8, false)))
    assert(rep("distinctness(id)") === ((0.8, false)))
    assert(rep("bounds(amount)") === ((0.8, true)))
    assert(rep("in_set(status)") === ((0.8, true)))
  }

  test("report is a single aggregation pass (one row before unpivot)") {
    // the explode runs over the agg's single output row, so the plan has
    // exactly one Aggregate chain and no join/window
    val rep = DataQuality.report(t, Seq(Completeness("opt"), Bounds("amount", 0, 50)))
    val plan = rep.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in report plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in report plan:\n$plan")
  }

  test("uniqueness counts exactly-once values; nulls and dups violate") {
    // values: 1 (once), 2 (twice), null (once) -> unique rows = 1 of 4
    val df = Seq(Some(1L), Some(2L), Some(2L), None).toDF("v")
    val row = DataQuality.uniqueness(df, "v", minFraction = 0.5).collect().head
    assert(row.getString(0) === "uniqueness(v)")
    assert(row.getDouble(1) === 0.25)
    assert(row.getBoolean(2) === false)
    // a clean key column scores 1.0
    val clean = DataQuality.uniqueness(Seq(1L, 2L, 3L).toDF("v"), "v").collect().head
    assert(clean.getDouble(1) === 1.0 && clean.getBoolean(2))
  }

  test("refIntegrity counts unmatched and null FKs as violations") {
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val row = DataQuality.refIntegrity(fact, "fk", dim, "pk", minFraction = 0.9)
      .collect().head
    assert(row.getString(0) === "ref_integrity(fk)")
    assert(row.getDouble(1) === 0.5)
    assert(row.getBoolean(2) === false)
    // clean FK set passes
    val ok = DataQuality.refIntegrity(Seq(1L, 2L).toDF("fk"), "fk", dim, "pk")
      .collect().head
    assert(ok.getDouble(1) === 1.0 && ok.getBoolean(2))
  }

  test("refIntegrity is robust to duplicate dimension keys") {
    val dim = Seq(1L, 1L, 2L).toDF("pk") // dup pk must not double-count matches
    val fact = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val row = DataQuality.refIntegrity(fact, "fk", dim, "pk").collect().head
    assert(row.getDouble(1) === 0.75)
  }

  test("empty check list is rejected loudly") {
    intercept[IllegalArgumentException] {
      DataQuality.report(t, Seq.empty)
    }
  }

  test("populationStability: ~0 on identical distributions, > 0.25 on a real shift") {
    import org.apache.spark.sql.functions.col
    def psi(ref: org.apache.spark.sql.DataFrame, cur: org.apache.spark.sql.DataFrame) =
      DataQuality.populationStability(ref, cur, col("v"), nBuckets = 10)
        .agg(org.apache.spark.sql.functions.sum("contrib")).head().getDouble(0)
    val ref = spark.range(2000).select((col("id") % 100).cast("double").as("v"))
    // same distribution, different rows → stable
    val same = spark.range(2000, 4000).select((col("id") % 100).cast("double").as("v"))
    assert(math.abs(psi(ref, same)) < 0.01)
    // mean shift by half the range → drifted well past the 0.25 bar
    val shifted = spark.range(2000).select(((col("id") % 100) + 50).cast("double").as("v"))
    assert(psi(ref, shifted) > 0.25, s"shift must trip the PSI gate: ${psi(ref, shifted)}")
    // empty current-side buckets contribute large finite terms, never NaN/inf
    val collapsed = spark.range(2000).select(org.apache.spark.sql.functions.lit(1.0).as("v"))
    val total = psi(ref, collapsed)
    assert(!total.isNaN && !total.isInfinite && total > 1.0, s"collapsed psi: $total")
    // always exactly nBuckets rows, even with empty buckets
    assert(DataQuality.populationStability(ref, collapsed, col("v"), 10).count() === 10)
  }

  test("robustOutliers flags spikes that inflate stddev past a z-score's reach") {
    import org.apache.spark.sql.functions.{col, lit}
    // 100 values at ~10 ± 1 contaminated with 20 spikes of 300: the spikes
    // inflate stddev to ~109 so mean + 3σ ≈ 384 and the classical z-score
    // flags NOTHING — while the median stays 10, MAD stays 1, and the
    // Hampel rule flags exactly the 20 spikes (50% breakdown point).
    val base = (0 until 100).map(i => ("g", 10.0 + (i % 3) - 1))
    val rows = (base ++ Seq.fill(20)(("g", 300.0))).toDF("grp", "v")
    val out = DataQuality.robustOutliers(rows, col("grp"), col("v"), k = 5.0)
      .collect().head
    assert(out.getAs[Long]("n") === 120L)
    assert(out.getAs[Long]("n_outliers") === 20L)
    assert(out.getAs[Double]("med") === 10.0)
    // the classical rule indeed misses them (breakdown demonstration)
    val st = rows.agg(org.apache.spark.sql.functions.stddev(col("v")),
      org.apache.spark.sql.functions.avg(col("v"))).head()
    assert(300.0 < st.getDouble(1) + 3 * st.getDouble(0),
      "fixture must keep the spikes inside mean+3*stddev")
    // nulls are excluded, not counted as outliers
    val withNull = rows.union(Seq(("g", Option.empty[Double])).toDF("grp", "v"))
    val n2 = DataQuality.robustOutliers(withNull, col("grp"), col("v"), k = 5.0)
      .collect().head
    assert(n2.getAs[Long]("n") === 120L && n2.getAs[Long]("n_outliers") === 20L)
    // per-group isolation: a second clean group reports zero outliers
    val two = rows.union(Seq(("h", 1.0), ("h", 2.0), ("h", 3.0)).toDF("grp", "v"))
    val byG = DataQuality.robustOutliers(two, col("grp"), col("v"), k = 5.0)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_outliers")).toMap
    assert(byG === Map("g" -> 20L, "h" -> 0L))
  }

  test("categoricalEntropy: uniform maxes out, collapse zeroes out") {
    import spark.implicits._
    val rows = (Seq.fill(25)("w") ++ Seq.fill(25)("x") ++ Seq.fill(25)("y") ++
        Seq.fill(25)("z")).map(("uniform", _)) ++
      Seq.fill(100)(("collapsed", "only")) ++
      (Seq.fill(97)("a") ++ Seq.fill(1)("b") ++ Seq.fill(1)("c") ++
        Seq.fill(1)("d")).map(("skewed", _))
    val out = DataQuality.categoricalEntropy(
        rows.toDF("grp", "cat"), col("grp"), col("cat"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_cats"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy")))).toMap
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("uniform") === ((100L, 4L, ln4, 1.0)))
    assert(out("collapsed") === ((100L, 1L, 0.0, 0.0)))
    // same n_cats, skewed distribution: strictly less diverse than uniform
    assert(out("skewed")._2 === 4L)
    assert(out("skewed")._4 > 0.0 && out("skewed")._4 < 0.2)
  }

  test("dpNoisyCounts: deterministic per salt, Laplace-scaled, ε-monotone") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong, s"g${i % 200}")).toDF("id", "grp")
    def release(eps: Double, salt: String) =
      DataQuality.dpNoisyCounts(rows, Seq("grp"), eps, salt)
        .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("noisy_n")).toMap
    val a = release(0.5, "s1")
    assert(a === release(0.5, "s1"))         // replayable given the salt
    assert(a !== release(0.5, "s2"))         // a new release re-draws noise
    // every group's true count is 10; Laplace(b=2) noise: the median of
    // |noise| over 200 groups concentrates near b·ln2 ≈ 1.386
    val absNoise = a.values.map(v => math.abs(v - 10.0)).toSeq.sorted
    assert(absNoise.last > 0.0)              // noise actually applied
    val median = absNoise(absNoise.size / 2)
    assert(median > 0.6 && median < 2.8, s"median=$median")
    // tighter ε ⇒ exactly proportionally smaller noise (same uniforms):
    // b drops 2 → 0.2, so per-group |noise| shrinks ~10× (modulo 4dp round)
    val tight = release(5.0, "s1")
    val sumTight = a.keys.map(g => math.abs(tight(g) - 10.0)).sum
    val sumWide = absNoise.sum
    assert(sumTight < 0.15 * sumWide, s"tight=$sumTight wide=$sumWide")
    // ε must be positive, groups non-empty
    intercept[IllegalArgumentException](
      DataQuality.dpNoisyCounts(rows, Seq("grp"), eps = 0.0, salt = "x"))
    intercept[IllegalArgumentException](
      DataQuality.dpNoisyCounts(rows, Seq(), eps = 1.0, salt = "x"))
  }

  test("kAnonymityReport sizes equivalence classes; kAnonymize suppresses < k") {
    import spark.implicits._
    // classes: (US,A)=5 rows, (US,B)=2, (DE,A)=3 — with k=3 only (US,B) is risky
    val rows = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(3)(("DE", "A"))).zipWithIndex
      .map { case ((c, s), i) => (i.toLong, c, s) }
      .toDF("id", "country", "segment")
    val rep = DataQuality.kAnonymityReport(rows, Seq("country", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("class_size"), r.getAs[Boolean]("at_risk")))).toMap
    assert(rep === Map(("US", "A") -> ((5L, false)), ("US", "B") -> ((2L, true)),
      ("DE", "A") -> ((3L, false))))
    // suppression drops exactly the risky class's rows, keeps everything else
    val kept = DataQuality.kAnonymize(rows, Seq("country", "segment"), k = 3)
    assert(kept.count() === 8L)
    assert(kept.filter(col("segment") === "B").count() === 0L)
    // the released set is k-anonymous: every remaining class has ≥ k rows
    val minClass = DataQuality.kAnonymityReport(kept, Seq("country", "segment"), k = 3)
      .agg(min(col("class_size"))).head().getLong(0)
    assert(minClass >= 3L)
  }

  test("welchTTest matches a hand-computed statistic; undefined cases are NULL") {
    // group g: A = [1,2,3] (n=3, mean=2, var=1), B = [2,4] (n=2, mean=3, var=2)
    // se = 1/3 + 1 = 4/3; t = -1/sqrt(4/3) = -0.8660
    // df = (4/3)² / ((1/3)²/2 + 1²/1) = (16/9)/(19/18) = 288/171 = 1.6842
    val ab = Seq(
      ("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0),
      // h: variant B has a single row → statistic undefined
      ("h", true, 1.0), ("h", true, 2.0), ("h", false, 5.0),
      // z: both variances zero → se = 0, undefined
      ("z", true, 3.0), ("z", true, 3.0), ("z", false, 7.0), ("z", false, 7.0))
      .toDF("grp_in", "variant", "v")
    val out = DataQuality.welchTTest(ab, col("grp_in"), col("variant"), col("v"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          Option(r.getAs[java.lang.Double]("t_stat")),
          Option(r.getAs[java.lang.Double]("df_welch"))))).toMap
    assert(out("g")._1 === 3L && out("g")._2 === 2L)
    assert(out("g")._3.map(_.doubleValue) === Some(-0.866))
    assert(out("g")._4.map(_.doubleValue) === Some(1.6842))
    assert(out("h")._3 === None && out("h")._4 === None)
    assert(out("z")._3 === None && out("z")._4 === None)
  }

  test("histogram buckets per group over the group's own range") {
    import spark.implicits._
    // group a: 0..8 over 4 bins of width 2; hi itself clamps into bin 4.
    // group b: constant value → single bin 1. Nulls are dropped.
    val rows = ((0 to 8).map(v => ("a", Some(v.toDouble))) ++
      Seq.fill(3)(("b", Some(5.0))) :+ (("b", None)))
      .toDF("g", "v")
    val out = DataQuality.histogram(rows, col("g"), col("v"), nBins = 4)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Int]("bin")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))))
      .toMap
    assert(out === Map(
      ("a", 1) -> ((2L, 0.0, 8.0)), ("a", 2) -> ((2L, 0.0, 8.0)),
      ("a", 3) -> ((2L, 0.0, 8.0)), ("a", 4) -> ((3L, 0.0, 8.0)),
      ("b", 1) -> ((3L, 5.0, 5.0))))
    intercept[IllegalArgumentException](
      DataQuality.histogram(rows, col("g"), col("v"), nBins = 0))
  }

  test("quantileNormalize maps each group's ranks onto the global grid") {
    import spark.implicits._
    // A: 0..4, B: 0,10,20,30,40 — global p50 = 3.5. Each group's median
    // must land on the global median; B's 30 (its p75) interpolates
    // between the global p50 and max.
    val rows = ((0 to 4).map(v => ("A", v.toDouble)) ++
      (0 to 4).map(v => ("B", v * 10.0)))
      .toDF("g", "v")
    val out = DataQuality.quantileNormalize(rows, col("g"), col("v"),
        nBuckets = 2)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("v")) ->
        r.getAs[Double]("v_norm")).toMap
    assert(out(("A", 2.0)) === 3.5 && out(("B", 20.0)) === 3.5)
    assert(out(("A", 0.0)) === 0.0 && out(("B", 40.0)) === 40.0)
    // B's 30 sits halfway through its upper segment → 3.5 + .5·(40 − 3.5)
    assert(out(("B", 30.0)) === 21.75)
    // a constant group has no rank information: deterministic map to the
    // global lower grid point (t = 0), never a crash (hi == lo segment)
    val withConst = rows.union(Seq(("C", 7.0), ("C", 7.0)).toDF("g", "v"))
    val c = DataQuality.quantileNormalize(withConst, col("g"), col("v"),
        nBuckets = 2)
      .filter(col("g") === "C").collect().map(_.getAs[Double]("v_norm"))
    assert(c.length === 2 && c.distinct.length === 1)
    intercept[IllegalArgumentException](
      DataQuality.quantileNormalize(rows, col("g"), col("v"), nBuckets = 1))
  }

  test("keySkewAudit ranks hot keys with load factors and self-join size") {
    import spark.implicits._
    // keys: a ×6, b ×2, c ×1, d ×1 → 4 keys, 10 rows,
    // self-join = 36+4+1+1 = 42; load(a) = 6·4/10 = 2.4
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d") :+
      null.asInstanceOf[String]).toDF("k")
    val out = DataQuality.keySkewAudit(rows, col("k"), topK = 3)
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("rank"), r.getAs[Double]("frac"),
          r.getAs[Double]("load_factor"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("self_join_rows")))).toMap
    assert(out.size === 3) // topK caps the listing
    assert(out("a") === ((6L, 1L, 0.6, 2.4, 4L, 42L)))
    assert(out("b") === ((2L, 2L, 0.2, 0.8, 4L, 42L)))
    assert(out("c")._2 === 3L) // (n desc, key) tie-break: c before d
    intercept[IllegalArgumentException](
      DataQuality.keySkewAudit(rows, col("k"), topK = 0))
  }

  test("jsonProfile counts keys, numeric-typed values, and carry fractions") {
    import spark.implicits._
    val docs = Seq(
      Some("""{"a": 1, "b": "x"}"""),
      Some("""{"a": 2.5, "b": "7", "c": true}"""),
      None,
      Some("""{not json"""),    // malformed: out of keys AND denominator
      Some("""[1, 2, 3]"""))    // valid non-object: likewise
      .toDF("props")
    val out = DataQuality.jsonProfile(docs, col("props"))
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_numeric"),
          r.getAs[Double]("frac")))).toMap
    // total = 2: null, malformed, and non-object JSON all leave the
    // denominator — frac is "fraction of parseable JSON objects"
    assert(out === Map(
      "a" -> ((2L, 2L, 1.0)),   // 1 and 2.5 both numeric
      "b" -> ((2L, 1L, 1.0)),   // "x" no, "7" yes (stringified number)
      "c" -> ((1L, 0L, 0.5))))  // boolean is not numeric
  }

  test("chiSquareIndependence matches the textbook 2x2 statistic") {
    import spark.implicits._
    // g: 10/20/20/10 — expected 15 per cell, chi2 = 4·25/15 = 6.6667, dof 1.
    // i: perfectly independent 2/2/2/2 → chi2 = 0.
    // h: one outcome category only → dof 0 → chi2 NULL, not 0.
    val rows = (
      Seq.fill(10)(("g", true, "x")) ++ Seq.fill(20)(("g", true, "y")) ++
      Seq.fill(20)(("g", false, "x")) ++ Seq.fill(10)(("g", false, "y")) ++
      Seq.fill(2)(("i", true, "x")) ++ Seq.fill(2)(("i", true, "y")) ++
      Seq.fill(2)(("i", false, "x")) ++ Seq.fill(2)(("i", false, "y")) ++
      Seq.fill(3)(("h", true, "x")) :+ (("h", false, "x")))
      .toDF("g", "a", "b")
    val out = DataQuality.chiSquareIndependence(rows, col("g"), col("a"), col("b"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("dof"),
          Option(r.getAs[java.lang.Double]("chi2")).map(_.doubleValue)))).toMap
    assert(out("g") === ((60L, 2L, 2L, 1L, Some(6.6667))))
    assert(out("i") === ((8L, 2L, 2L, 1L, Some(0.0))))
    assert(out("h") === ((4L, 2L, 1L, 0L, None)))
  }

  test("mannWhitney matches textbook U and tie-corrected z; degenerate cases NULL") {
    import spark.implicits._
    // g1: A={1,2,3} all below B={4,5,6} → U_A = 0, z = -4.5/sqrt(5.25)
    // g2: A={1,1}, B={1,2} — tied block of 3 at v=1 → avg rank 2,
    //     R_A = 4, U_A = 1, tie-corrected var = 1 → z = -1
    // g3: all four values identical → variance 0 → z NULL
    // g4: B side empty → z NULL
    val rows = (Seq(1, 2, 3).map(v => ("g1", true, v.toDouble)) ++
      Seq(4, 5, 6).map(v => ("g1", false, v.toDouble)) ++
      Seq(("g2", true, 1.0), ("g2", true, 1.0), ("g2", false, 1.0),
        ("g2", false, 2.0)) ++
      Seq(("g3", true, 5.0), ("g3", true, 5.0), ("g3", false, 5.0),
        ("g3", false, 5.0)) ++
      Seq(("g4", true, 1.0), ("g4", true, 2.0)))
      .toDF("g", "a", "v")
    def run(nB: Int) = DataQuality.mannWhitney(rows, col("g"), col("a"),
        col("v"), nBuckets = nB)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("u_a"),
          Option(r.getAs[java.lang.Double]("z_stat")).map(_.doubleValue)))).toMap
    val out = run(32)
    assert(out("g1")._1 === 3L && out("g1")._2 === 3L && out("g1")._3 === 0.0)
    assert(math.abs(out("g1")._4.get - (-4.5 / math.sqrt(5.25))) < 1e-3)
    assert(out("g2") === ((2L, 2L, 1.0, Some(-1.0))))
    assert(out("g3")._3 === 2.0 && out("g3")._4 === None)
    assert(out("g4")._2 === 0L && out("g4")._4 === None)
    // ranks are bucketing-invariant: the quantile grid must never change
    // the statistic, only the parallelism
    assert(run(2) === out)
    intercept[IllegalArgumentException](
      DataQuality.mannWhitney(rows, col("g"), col("a"), col("v"), nBuckets = 1))
  }

  test("mannWhitney fuzz: matches a driver-side reference on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // small value domain → heavy ties, the hard case for rank arithmetic
    val data = (1 to 400).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextBoolean(), rnd.nextInt(12).toDouble))
    val out = DataQuality.mannWhitney(data.toDF("g", "a", "v"), col("g"),
        col("a"), col("v"), nBuckets = 4)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_a"), r.getAs[Double]("u_a"),
          Option(r.getAs[java.lang.Double]("z_stat")).map(_.doubleValue)))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(t => (t._3, t._2)).sortBy(_._1)
      // average ranks with ties, driver-side
      val ranks = scala.collection.mutable.Map[Double, Double]()
      var i = 0
      while (i < sorted.length) {
        val v = sorted(i)._1
        val j = sorted.indexWhere(_._1 > v, i) match {
          case -1 => sorted.length; case x => x
        }
        ranks(v) = (i + 1 + j) / 2.0 // mean of ranks i+1..j
        i = j
      }
      val a = sorted.filter(_._2)
      val nA = a.length.toDouble
      val nB = sorted.length - nA
      val rA = a.map(t => ranks(t._1)).sum
      val uA = rA - nA * (nA + 1) / 2
      assert(out(g)._1 === a.length.toLong, s"group $g n_a")
      assert(math.abs(out(g)._2 - uA) < 1e-9, s"group $g u_a")
      val n = nA + nB
      val ties = sorted.groupBy(_._1).values
        .map(ts => math.pow(ts.length, 3) - ts.length).sum
      val variance = nA * nB / 12 * ((n + 1) - ties / (n * (n - 1)))
      if (nA > 0 && nB > 0 && variance > 0)
        assert(math.abs(out(g)._3.get -
          (uA - nA * nB / 2) / math.sqrt(variance)) < 1e-3, s"group $g z")
    }
  }

  test("jsDivergence is 0 on identical mass and finite on one-sided cats") {
    import spark.implicits._
    // ref {a,a,b,b} vs cur {a,a,c,c}: a contributes 0 (same mass); b and c
    // each appear on ONE side only and still contribute the finite
    // (1/2)·(1/2)·ln 2 — the no-smoothing-needed property under test.
    val ref = Seq("a", "a", "b", "b").toDF("cat")
    val cur = Seq("a", "a", "c", "c").toDF("cat")
    val out = DataQuality.jsDivergence(ref, cur, col("cat"))
      .collect().map(r => r.getAs[String]("cat") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("contrib")))).toMap
    assert(out === Map(
      "a" -> ((2L, 2L, 0.0)),
      "b" -> ((2L, 0L, 0.173287)),
      "c" -> ((0L, 2L, 0.173287))))
    // total JSD = ln2 / 2 for half the mass swapping category
    assert(math.abs(out.values.map(_._3).sum - math.log(2) / 2) < 1e-5)
    // one side empty (zero total): no DIVIDE_BY_ZERO under ANSI mode —
    // q ≡ 0 is the continuous limit, each ref category contributes
    // (1/2)·p·ln 2, summing to ln2/2 (P vs the zero measure)
    val oneSided = DataQuality.jsDivergence(ref, cur.filter(col("cat") === "nope"),
        col("cat"))
      .collect().map(r => r.getAs[Double]("contrib"))
    assert(math.abs(oneSided.sum - math.log(2) / 2) < 1e-5)
  }

  test("calibrationReport bins scores, clamps 1.0, and weights ECE by mass") {
    import spark.implicits._
    // bin 1: scores .1/.3 (conf .2), labels F/T (acc .5) → |.3|·2/5 = .12
    // bin 2: scores .6/.9/1.0 (1.0 clamps in), conf .8333, acc 1.0
    //        → |.1667|·3/5 = .10002. Null score and null label drop.
    val rows = Seq(
      (Some(0.1), Some(false)), (Some(0.3), Some(true)),
      (Some(0.6), Some(true)), (Some(0.9), Some(true)),
      (Some(1.0), Some(true)),
      (None, Some(true)), (Some(0.5), None))
      .toDF("s", "y")
    val out = DataQuality.calibrationReport(rows, col("s"), col("y"), nBins = 2)
      .collect().map(r => r.getAs[Int]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("conf"), r.getAs[Double]("acc"),
          r.getAs[Double]("ece_contrib")))).toMap
    assert(out === Map(
      1 -> ((2L, 0.2, 0.5, 0.12)),
      2 -> ((3L, 0.8333, 1.0, 0.10002))))
    intercept[IllegalArgumentException](
      DataQuality.calibrationReport(rows, col("s"), col("y"), nBins = 0))
  }

  test("corpusHealth: hand-computed per-source rollup incl. dups and median") {
    // source A: 4 docs, one exact dup pair, 2 langs, chars 10/20/30/20
    //   -> total 80, floor-mean 20, median (20+20)/2 = 20, tokens 2+2+3+2
    // source B: 1 doc, no dups
    val docs = Seq(
      (1L, "aa bb", "en", "A", 10L),
      (2L, "cc dd", "de", "A", 20L),
      (3L, "ee ff gg", "en", "A", 30L),
      (4L, "cc dd", "en", "A", 20L),   // exact dup of doc 2
      (5L, "solo", "fr", "B", 7L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DataQuality.corpusHealth(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7)))).toMap
    assert(out("A") === ((4L, 1L, 2L, 80L, 20L, 20.0, 9L)))
    assert(out("B") === ((1L, 0L, 1L, 7L, 7L, 7.0, 1L)))
  }
}
