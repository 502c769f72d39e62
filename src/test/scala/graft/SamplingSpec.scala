package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val events = Tables.load(spark, "/root/testdata/sf0.01", "events")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("hash sample fraction tracks the threshold and is partition-invariant") {
    val s = ids(Sampling.hashSample(events, col("event_id"), "28")) // ≈15.6%
    val frac = s.size.toDouble / events.count()
    assert(frac > 0.10 && frac < 0.22, s"fraction $frac")
    val repartitioned = ids(Sampling.hashSample(
      events.repartition(17, col("user_id")), col("event_id"), "28"))
    assert(repartitioned === s, "row-keyed sampling must ignore partitioning")
  }

  test("lower-threshold samples nest inside higher-threshold ones") {
    val small = ids(Sampling.hashSample(events, col("event_id"), "10"))
    val big = ids(Sampling.hashSample(events, col("event_id"), "40"))
    assert(small.nonEmpty && small.subsetOf(big))
  }

  test("hashShard is balanced, in-range, and partition-invariant") {
    def shards(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashShard(df, col("event_id"), 16)
        .select("event_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = shards(events)
    assert(base.values.forall(s => s >= 0 && s < 16))
    val sizes = base.values.groupBy(identity).values.map(_.size)
    assert(sizes.size === 16, "every shard must be populated")
    assert(sizes.max.toDouble / sizes.min < 1.5, s"unbalanced: $sizes")
    assert(shards(events.repartition(13, col("user_id"))) === base,
      "shard id must be row-keyed, not partition-derived")
    // boundary shard counts: 1 shard = everything; 256 = the bucket space
    assert(Sampling.hashShard(events, col("event_id"), 1)
      .select("shard").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    val s256 = Sampling.hashShard(events, col("event_id"), 256)
      .select("shard").distinct().count()
    assert(s256 > 200, s"256-way sharding reached only $s256 buckets")
  }

  test("tokenBudgetMix admits a deterministic per-stratum prefix under budget") {
    import org.apache.spark.sql.SparkSession
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L + i % 7))
      .toDF("doc_id", "lang", "n_tokens")
    val out = Sampling.tokenBudgetMix(docs, col("doc_id"), col("lang"),
      col("n_tokens"), budget = 100L)
    val rows = out.collect()
    // every stratum stays within budget and cum_tokens is consistent
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.keySet === Set("en", "de"))
    byLang.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_tokens")).sum <= 100L)
      assert(rs.map(_.getAs[Long]("cum_tokens")).max <= 100L)
    }
    // determinism across partitionings (the hash-order property)
    val repart = Sampling.tokenBudgetMix(docs.repartition(13, col("doc_id")),
      col("doc_id"), col("lang"), col("n_tokens"), budget = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart === rows.map(_.getLong(0)).toSet)
    // nested budgets: a smaller budget's pick is a prefix-subset
    val small = Sampling.tokenBudgetMix(docs, col("doc_id"), col("lang"),
      col("n_tokens"), budget = 50L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.nonEmpty && small.subsetOf(rows.map(_.getLong(0)).toSet))
    // a row larger than the whole budget can never be admitted
    val big = Seq((1000L, "fr", 999L), (1001L, "fr", 5L)).toDF("doc_id", "lang", "n_tokens")
    val fr = Sampling.tokenBudgetMix(big, col("doc_id"), col("lang"),
      col("n_tokens"), budget = 100L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!fr.contains(1000L))
  }

  test("capPerKey keeps the md5-order prefix per key, invariant under partitioning") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val out = Sampling.capPerKey(docs, col("source"), col("doc_id"), n = 10)
    // reference: the window formulation (fine at test scale) must agree
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    val ref = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === ref)
    assert(out.groupBy("source").count().collect().forall(_.getLong(1) === 10L))
    // partition-invariance (the determinism contract)
    val repart = Sampling.capPerKey(docs.repartition(13, col("lang")),
      col("source"), col("doc_id"), n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart === got)
    // nested caps: a smaller cap's pick is a prefix-subset of a larger one's
    val small = Sampling.capPerKey(docs, col("source"), col("doc_id"), n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.size === 60 && small.subsetOf(got))
  }

  test("capPerKey survives a hot key and partial-aggregates before the exchange") {
    import spark.implicits._
    // one key carrying 200k rows (the operator's raison d'être) + a cold key
    val hot = spark.range(0, 200000L).selectExpr("'megadomain' AS k", "id")
      .union(spark.range(1000000L, 1000005L).selectExpr("'tiny' AS k", "id"))
      .toDF("k", "id")
    val out = Sampling.capPerKey(hot, col("k"), col("id"), n = 7)
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("megadomain" -> 7L, "tiny" -> 5L))
    // plan shape: the bounded aggregate must split partial/final around the
    // exchange (ObjectHashAggregate with a partial top_n_by_order), so hot
    // keys collapse map-side — the entire point vs a row_number window
    val agg = hot.groupBy(col("k")).agg(graft.functions.TopNExpressions
      .topNByOrder(md5(col("id").cast("string").cast("binary")), col("id"), 7).as("ids"))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(p.contains("partial_top_n_by_order"), p.take(400))
  }

  test("tokenBudgetMix two-phase scan is row-identical to the window formulation") {
    import spark.implicits._
    // fixture with a hot stratum, a null-weight row, an all-null-weight
    // stratum, and a NULL stratum (windows group NULL keys together — the
    // two-phase join must too, via null-safe keys)
    val rows = (0L until 2000L).map(i => (i, Option("hot"), Some(1L + i % 5))) ++
      (10000L until 10020L).map(i => (i, Option("cold"), Some(3L))) ++
      Seq((20000L, Option("cold"), None),
        (30000L, Option("nulls"), None), (30001L, Option("nulls"), None),
        (40000L, None, Some(2L)), (40001L, None, Some(3L)))
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.tokenBudgetMix(df, col("doc_id"), col("lang"),
        col("n_tokens"), budget = 500L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"))).toSet
    // reference: the single-window formulation this replaced (fine at test
    // scale, hot-stratum funnel at 100 TB)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = df.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 500L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"))).toSet
    assert(got === ref)
    // the all-null-weight stratum must contribute nothing (NULL cum, filtered)
    assert(!got.exists(f => f._1 == 30000L || f._1 == 30001L))
    // the NULL stratum survives (null-safe join keys)
    assert(got.exists(_._1 >= 40000L))
  }

  test("stratified thresholds apply per stratum") {
    val out = Sampling.stratifiedHashSample(events, col("event_id"),
        col("event_type"), Map("click" -> "80"), defaultThreshold = "08")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val clickRate = out("click").toDouble / totals("click")
    val viewRate = out.getOrElse("view", 0L).toDouble / totals("view")
    assert(clickRate > 0.4 && clickRate < 0.6, s"click rate $clickRate (≈50% expected)")
    assert(viewRate < 0.08, s"view rate $viewRate (≈3% expected)")
  }

  test("quantileStratifiedSample takes equal mass per bucket, partition-invariant") {
    val df = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("s"))
    val out = Sampling.quantileStratifiedSample(df, col("s"), col("doc_id"),
      nBuckets = 4, perBucket = 10)
    val byBucket = out.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet === Set(0L, 1L, 2L, 3L))
    assert(byBucket.values.forall(_ === 10L), s"unbalanced pick: $byBucket")
    // row-keyed decisions: repartitioning must not change the picked set
    val repart = Sampling.quantileStratifiedSample(
        df.repartition(17, col("s")), col("s"), col("doc_id"),
        nBuckets = 4, perBucket = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart === out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // smaller per-bucket picks nest inside larger ones (md5-prefix property)
    val small = Sampling.quantileStratifiedSample(df, col("s"), col("doc_id"),
        nBuckets = 4, perBucket = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(repart))
  }

  test("hashSplit is disjoint, exhaustive, leakage-proof under corpus growth") {
    val split = Sampling.hashSplit(events, col("event_id"),
      Seq("train" -> "cc", "val" -> "e6"), "test")
    val byId = split.select("event_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive: every row got exactly one label
    assert(byId.size.toLong === events.count())
    // ~80/10/10 mass
    val frac = byId.values.groupBy(identity).view.mapValues(_.size.toDouble / byId.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.03, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.03, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.03, s"test ${frac("test")}")
    // leakage-proof: membership is a function of the row key alone, so
    // splitting HALF the corpus assigns the same labels to shared rows
    val half = Sampling.hashSplit(events.filter(col("event_id") % 2 === 0),
        col("event_id"), Seq("train" -> "cc", "val" -> "e6"), "test")
      .select("event_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => byId(id) == s })
  }

  test("split-leakage audit: theta overlap across hashSplit labels is zero") {
    // the audit a pipeline runs before training: sketch each split's key
    // population once, then assert pairwise intersections are empty —
    // composition of hashSplit with the Theta overlap matrix, no exact
    // distinct or pairwise self-join over raw keys anywhere
    val split = Sampling.hashSplit(events, col("event_id"),
      Seq("train" -> "cc", "val" -> "e6"), "test")
    // lgK 14 → 16384 nominal entries ≥ the ~8k-key train split, so every
    // estimate below stays in the exact regime and the equalities are hard
    val overlap = graft.operators.Sketches
      .groupOverlap(split, "split", "event_id", lgK = 14)
      .collect()
    assert(overlap.length === 3) // (test,train), (test,val), (train,val)
    overlap.foreach { r =>
      assert(r.getAs[Long]("n_inter") === 0L,
        s"${r.getAs[String]("type_a")}∩${r.getAs[String]("type_b")}")
      assert(r.getAs[Long]("n_only_a") === r.getAs[Long]("n_a"))
      assert(r.getAs[Double]("jaccard") === 0.0)
    }
    // label populations are exact below 2^lgK: the three per-label counts
    // recovered from the pair rows must sum to the whole corpus
    val byLabel = (overlap.map(r => r.getAs[String]("type_a") -> r.getAs[Long]("n_a")) ++
      overlap.map(r => r.getAs[String]("type_b") -> r.getAs[Long]("n_b"))).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel.values.sum === events.count())
  }

  test("alphaMixWeights flattens toward uniform as alpha drops") {
    import spark.implicits._
    val df = (Seq.fill(900)("big") ++ Seq.fill(90)("mid") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "domain")
    def shares(alpha: Double) =
      Sampling.alphaMixWeights(df, col("domain"), alpha)
        .collect().map(r => r.getAs[String]("domain") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("share"),
            r.getAs[Double]("boost")))).toMap
    val natural = shares(1.0)
    assert(natural("big")._1 === 900L)
    assert(math.abs(natural("big")._2 - 0.9) < 1e-6)   // α=1 keeps proportions
    assert(math.abs(natural("small")._3 - 1.0) < 1e-6) // boost 1 everywhere
    val cooled = shares(0.5)
    assert(math.abs(cooled.values.map(_._2).sum - 1.0) < 1e-5) // shares sum to 1
    assert(cooled("big")._2 < 0.9)        // head domain gives up share...
    assert(cooled("small")._2 > 0.01)     // ...the tail gains it
    assert(cooled("small")._3 > 1.0 && cooled("big")._3 < 1.0)
    // exact: share(big, α=.5) = 30 / (30 + √90 + √10)
    val expBig = 30.0 / (math.sqrt(900.0) + math.sqrt(90.0) + math.sqrt(10.0))
    assert(math.abs(cooled("big")._2 - expBig) < 1e-6)
    intercept[IllegalArgumentException](
      Sampling.alphaMixWeights(df, col("domain"), alpha = 0.0))
  }

  test("weightedSample favors heavy rows, is partition-invariant and bounded") {
    val df = spark.range(1000).select(col("id"),
      when(col("id") < 10, 100000L).otherwise(lit(1L)).as("w"))
    val picked = Sampling.weightedSample(df, col("id"), col("w"), n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.size === 50)
    // the 10 overwhelming weights all make a 50-row sample
    assert((0L until 10L).forall(picked), s"heavy rows missing: $picked")
    // deterministic across partitionings
    val repart = Sampling.weightedSample(df.repartition(13), col("id"), col("w"), n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(repart === picked)
    // null / non-positive weights are excluded, never crash the rank
    val withBad = df.union(spark.range(2000, 2010).select(col("id"), lit(0L).as("w")))
      .union(spark.range(3000, 3010).select(col("id"), lit(null).cast("long").as("w")))
    val guarded = Sampling.weightedSample(withBad, col("id"), col("w"), n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(guarded.forall(_ < 2000))
    // selection is a global TakeOrdered (bounded heaps), not a full sort
    val p = Sampling.weightedSample(df, col("id"), col("w"), n = 50)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TakeOrderedAndProject"), p.take(300))
  }

  test("curriculumOrder ramps difficulty per stratum and keeps prefixes proportional") {
    import spark.implicits._
    // A: difficulties 1..100, B: 1..50 — decile boundaries land between
    // consecutive integers, so every (stratum, bucket) holds EXACTLY
    // n_stratum/10 rows: each global prefix of k full buckets contains
    // k/10 of BOTH strata.
    val rows = ((1 to 100).map(i => (s"A$i", "A", Some(i.toDouble))) ++
      (1 to 50).map(i => (s"B$i", "B", Some(i.toDouble))) :+
      (("null_d", "A", Option.empty[Double])))
      .toDF("id", "stratum", "d")
    val out = Sampling.curriculumOrder(rows, col("id"), col("stratum"), col("d"),
        nBuckets = 10)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[String]("stratum"),
        r.getAs[Double]("d"), r.getAs[Long]("bucket"), r.getAs[Double]("ord_key")))
    assert(out.length === 150) // null difficulty dropped
    // exact equal-mass buckets per stratum
    val byBucket = out.groupBy(t => (t._2, t._4)).view.mapValues(_.length).toMap
    (0L to 9L).foreach { b =>
      assert(byBucket(("A", b)) === 10, s"A bucket $b")
      assert(byBucket(("B", b)) === 5, s"B bucket $b")
    }
    // difficulty ramps: every bucket's max difficulty <= next bucket's min
    Seq("A", "B").foreach { s =>
      val ranges = out.filter(_._2 == s).groupBy(_._4).view
        .mapValues(ts => (ts.map(_._3).min, ts.map(_._3).max)).toMap
      (0L to 8L).foreach(b =>
        assert(ranges(b)._2 <= ranges(b + 1)._1, s"$s bucket $b overlap"))
    }
    // ord_key lives STRICTLY inside its bucket's [b/10, (b+1)/10) band —
    // the u clamp guarantees the 6dp round can't land on the next boundary
    out.foreach { case (id, _, _, b, k) =>
      assert(k >= b / 10.0 && k < (b + 1) / 10.0, s"$id key $k bucket $b")
    }
    // deterministic across partitionings
    val again = Sampling.curriculumOrder(rows.repartition(7), col("id"),
        col("stratum"), col("d"), nBuckets = 10)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("ord_key")).toMap
    assert(out.forall { case (id, _, _, _, k) => again(id) === k })
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(rows, col("id"), col("stratum"), col("d"), nBuckets = 1))
  }
}
