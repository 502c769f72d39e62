package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashMix, VectorExpressions}

/** Custom-expression correctness: codegen results must equal both the
 * interpreted eval path and the (slow) higher-order-function formulations
 * they replaced. */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("float_dot equals the zip_with/aggregate formulation bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorExpressions.floatDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("slow"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("nearest_centroid_index matches a pure-Scala reference incl. NaN/zero/null") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    centroids(3) = Array.fill(dim)(0f) // zero-norm centroid must never win
    val norms = centroids.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    def reference(v: Option[Seq[Float]]): Int = v match {
      case None => 0
      case Some(x) =>
        val vn = math.sqrt(x.map(f => f.toDouble * f).sum)
        val keys = centroids.indices.map { c =>
          val m = math.min(x.length, centroids(c).length)
          val d = (0 until m).map(j => x(j).toDouble * centroids(c)(j)).sum
          val denom = vn * norms(c)
          if (denom == 0d) Double.PositiveInfinity
          else { val cos = d / denom; if (cos.isNaN) Double.PositiveInfinity else -cos }
        }
        keys.zipWithIndex.minBy { case (k, i) => (k, i) }._2
    }
    val vecs: Seq[Option[Seq[Float]]] =
      Seq.fill(100)(Some(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))) ++ Seq(
        Some(Seq.fill(dim)(0f)),              // zero-norm input: all-NaN → index 0
        Some(Seq(Float.NaN) ++ Seq.fill(dim - 1)(1f)), // NaN element
        Some(Seq.empty[Float]),               // empty array
        Some(Seq(1f, 2f)),                    // shorter than centroids
        None)                                 // null vector → index 0
    val out = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), VectorExpressions.nearestCentroidIndex(col("v"), centroids, norms).as("idx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(out(i.toLong) === reference(v), s"vector $i: $v")
    }
  }

  test("max_cosine_sim matches greatest-of-cosines semantics incl. NaN-wins") {
    val rnd = new scala.util.Random(12)
    val dim = 8
    val seeds = Array.fill(5)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val norms = seeds.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    def reference(x: Seq[Float]): Double = {
      val vn = math.sqrt(x.map(f => f.toDouble * f).sum)
      val sims = seeds.indices.map { c =>
        val m = math.min(x.length, seeds(c).length)
        val d = (0 until m).map(j => x(j).toDouble * seeds(c)(j)).sum
        val denom = vn * norms(c)
        if (denom == 0d) Double.NaN else d / denom
      }
      if (sims.exists(_.isNaN)) Double.NaN else sims.max
    }
    val vecs = Seq.fill(50)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1)) ++
      Seq(Seq.fill(dim)(0f), Seq.empty[Float])
    val out = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), VectorExpressions.maxCosineSim(col("v"), seeds, norms).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val exp = reference(v)
      val got = out(i.toLong)
      assert((exp.isNaN && got.isNaN) || exp === got, s"vector $i")
    }
    // null input → null result (greatest over all-null parity)
    val nullRow = Seq((0L, Option.empty[Seq[Float]])).toDF("id", "v")
      .select(VectorExpressions.maxCosineSim(col("v"), seeds, norms).as("s"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("char_ngrams equals the substr/transform formulation incl. non-ASCII") {
    val texts = Seq("", "a", "ab", "abc", "abcd", "héllo wörld", "日本語のテキスト",
      "mixed 中文 and ascii", "  spaces  ", "emoji 😀 text") // 😀 is non-BMP
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val out = df.select(col("id"),
        graft.functions.HashExpressions.charNgrams(col("t"), 3).as("fast"),
        when(length(col("t")) >= 3,
          transform(sequence(lit(1), length(col("t")) - 2), i => col("t").substr(i, lit(3))))
          .otherwise(array().cast("array<string>")).as("slow"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"text: ${texts(r.getLong(0).toInt)}")
    }
    // SQL surface parity (extension-registered function)
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT char_ngrams('abcd', 3)").collect()(0).getSeq[String](0)
    assert(viaSql === Seq("abc", "bcd"))
  }

  test("ngram_count_pairs equals explode(char_ngrams) + groupBy counts") {
    val texts = Seq("", "a", "ab", "abc", "abab", "aaaa", "héllo wörld",
      "日本語のテキスト", "banana banana", "emoji 😀😀 text")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val viaPairs = df.select(col("id"),
        explode(graft.functions.HashExpressions.ngramCountPairs(col("t"), 3)).as("p"))
      .select(col("id"), col("p.g"), col("p.cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaGroup = df.select(col("id"),
        explode(graft.functions.HashExpressions.charNgrams(col("t"), 3)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaPairs === viaGroup)
    // repeat counting: "abab" has ONE distinct pair per gram with count 1
    // each ("aba", "bab"), "aaaa" collapses to ("aaa" -> 2)
    assert(viaPairs((5L, "aaa")) === 2L)
    // null text → null array → explode drops the row, same as char_ngrams
    val nulls = Seq((0L, Option.empty[String])).toDF("id", "t")
      .select(explode(graft.functions.HashExpressions.ngramCountPairs(col("t"), 3)))
      .count()
    assert(nulls === 0L)
  }

  test("ngram_bucket_counts equals the md5-mod SQL formulation the oracle replays") {
    val texts = Seq("", "a", "ab", "abc", "abab", "aaaa", "héllo wörld",
      "日本語のテキスト", "banana banana", "emoji 😀😀 text",
      "the quick brown fox jumps over the lazy dog")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val buckets = 8192
    val viaExpr = df.select(col("id"),
        explode(graft.functions.HashExpressions.ngramBucketCounts(col("t"), 3, buckets)).as("p"))
      .select(col("id"), col("p.b"), col("p.cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the reference formulation: gram strings -> first 8 md5 hex chars
    // parsed as an int, mod buckets — exactly what the DuckDB oracle runs
    val viaSql = df.select(col("id"),
        explode(graft.functions.HashExpressions.charNgrams(col("t"), 3)).as("g"))
      .select(col("id"),
        (conv(substring(md5(col("g").cast("binary")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaExpr === viaSql)
    assert(viaExpr.nonEmpty)
    // bucket ids stay inside [0, buckets)
    assert(viaExpr.keys.forall { case (_, b) => b >= 0 && b < buckets })
  }

  test("float_dot handles length mismatch and empty arrays") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(10.0f, 20.0f)), (Seq.empty[Float], Seq(1.0f)))
      .toDF("a", "b")
    val out = df.select(VectorExpressions.floatDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 50.0) // min-length semantics
    assert(out(1).getDouble(0) === 0.0)
  }

  test("simhash64 SQL function matches the operator column") {
    GraftExtensions.register(spark)
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "zzz"))
      .toDF("id", "text")
    df.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sh
        |FROM sh_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql(1L) === viaSql(2L))
    assert(viaSql(1L) !== viaSql(3L))
  }

  test("minhash signature: identical inputs identical sigs; mix is splitmix64") {
    GraftExtensions.register(spark)
    val df = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(30L, 20L, 10L)), (3L, Seq(99L)))
      .toDF("id", "hs")
    df.createOrReplaceTempView("mh_docs")
    val sigs = spark.sql("SELECT id, minhash_sig(hs, 8) AS sig FROM mh_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L)) // order-insensitive (set semantics)
    assert(sigs(1L).length === 8)
    // spot-check the construction: sig[j] = min over h of mix64(h ^ seed(j))
    val expected0 = Seq(10L, 20L, 30L).map(h => HashMix.mix64(h ^ HashMix.seed(0))).min
    assert(sigs(1L).head === expected0)
  }

  test("float_dot via SQL on the embeddings table") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT vec_id FROM emb WHERE float_dot(embedding, embedding) > 0").count()
    assert(n === 500)
  }

  test("nearest_centroid_indices orders all cells by cosine; head == argmax") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cents = Array(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f), Array(0.7f, 0.7f))
    val norms = cents.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    val rows = Seq(
      (1L, Seq(1f, 0.1f)),   // → [0, 3, 1, 2]
      (2L, Seq(-0.9f, 0.2f)), // → [2, 1, 3, 0]
      (3L, Seq(0f, 0f)),     // zero-norm: every key +∞ → ascending indices
      (4L, Seq(0.6f, 0.8f))) // → [3, 1, 0, 2]
      .toDF("id", "v")
    def run(p: Int) = rows.select(col("id"),
        graft.functions.VectorExpressions
          .nearestCentroidIndices(col("v"), cents, norms, p).as("idxs"),
        graft.functions.VectorExpressions
          .nearestCentroidIndex(col("v"), cents, norms).as("best"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1).toSeq, r.getInt(2)))).toMap
    val full = run(4)
    assert(full(1L)._1 === Seq(0, 3, 1, 2))
    assert(full(2L)._1 === Seq(2, 1, 3, 0))
    assert(full(3L)._1 === Seq(0, 1, 2, 3))
    assert(full(4L)._1 === Seq(3, 1, 0, 2))
    for ((_, (idxs, best)) <- full) assert(idxs.head === best,
      "first probe must equal the single-probe argmax")
    // p < nCells takes the prefix; p > nCells caps at nCells
    val two = run(2)
    for ((id, (idxs, _)) <- two) assert(idxs === full(id)._1.take(2))
    assert(run(9)(1L)._1 === Seq(0, 3, 1, 2))
  }

  test("two_level_nearest_cell_indices: coarse routing, flat parity, eval==codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // four fine cells in two cleanly separable coarse groups (+x vs -x)
    val fine = Array(Array(1f, 0f), Array(0.9f, 0.1f), Array(-1f, 0f), Array(-0.9f, -0.1f))
    val fnorms = fine.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    val coarse = Array(Array(1f, 0.05f), Array(-1f, -0.05f))
    val cnorms = coarse.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    val members = Array(Array(0, 1), Array(2, 3))
    val rows = Seq(
      (1L, Seq(1f, 0.02f)),   // +x side
      (2L, Seq(-1f, 0.3f)),   // -x side
      (3L, Seq(0f, 0f)))      // zero-norm: nothing scores
      .toDF("id", "v")
    def run(q: Int, p: Int) = rows.select(col("id"),
        graft.functions.VectorExpressions.twoLevelNearestCellIndices(
          col("v"), coarse, cnorms, members, fine, fnorms, q, p).as("idxs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // q=1: only the matching coarse group's members are eligible
    val one = run(1, 2)
    assert(one(1L) === Seq(0, 1))
    assert(one(2L) === Seq(2, 3))
    // zero-norm vector: no group scores; first group's members in index order
    assert(one(3L) === Seq(0, 1))
    // q = all groups: ordering must equal the flat multi-probe scan
    val flat = rows.select(col("id"),
        graft.functions.VectorExpressions
          .nearestCentroidIndices(col("v"), fine, fnorms, 4).as("idxs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val all = run(2, 4)
    for (id <- Seq(1L, 2L)) assert(all(id) === flat(id), s"id $id vs flat")
    // interpreted eval must agree bit-for-bit with the codegen'd run above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def evalOf(v: Seq[Float], q: Int, p: Int): Seq[Int] =
      graft.functions.TwoLevelNearestCellIndices(
          Literal.create(v, ArrayType(FloatType)),
          coarse, cnorms, members, fine, fnorms, q, p)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    assert(evalOf(Seq(1f, 0.02f), 1, 2) === one(1L))
    assert(evalOf(Seq(-1f, 0.3f), 1, 2) === one(2L))
    assert(evalOf(Seq(0f, 0f), 1, 2) === one(3L))
    assert(evalOf(Seq(1f, 0.02f), 2, 4) === all(1L))
    assert(evalOf(Seq(-1f, 0.3f), 2, 4) === all(2L))
  }

  test("residual_vector subtracts the indexed centroid; edge cases degrade to raw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cents = Array(Array(1f, 2f), Array(10f, 20f))
    val rows = Seq(
      (1L, Some(Seq(5f, 7f)), Some(0)),   // → (4, 5)
      (2L, Some(Seq(5f, 7f)), Some(1)),   // → (-5, -13)
      (3L, Some(Seq(5f, 7f, 9f)), Some(0)), // longer vec: tail unchanged → (4, 5, 9)
      (4L, Some(Seq(5f, 7f)), Some(99)),  // out-of-range idx → raw
      (5L, Some(Seq(5f, 7f)), None),      // NULL idx → raw
      (6L, None, Some(0)))                // NULL vec → NULL
      .toDF("id", "v", "idx")
    val out = rows.select(col("id"), graft.functions.VectorExpressions
        .residualVector(col("v"), col("idx"), cents).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1).toSeq)).toMap
    assert(out(1L) === Seq(4f, 5f))
    assert(out(2L) === Seq(-5f, -13f))
    assert(out(3L) === Seq(4f, 5f, 9f))
    assert(out(4L) === Seq(5f, 7f))
    assert(out(5L) === Seq(5f, 7f))
    assert(out(6L) === null)
  }

  test("sliding_min equals a brute-force per-window scan; short/empty degrade") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val arrays: Seq[Seq[Long]] = Seq(Seq.empty[Long], Seq(5L), Seq(3L, 3L, 3L)) ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(30))(rnd.nextInt(10).toLong))
    def reference(a: Seq[Long], w: Int): Seq[Long] =
      if (a.isEmpty) Seq.empty else a.sliding(math.min(w, a.length)).map(_.min).toSeq
    for (w <- Seq(1, 4, 7)) {
      val got = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "arr")
        .orderBy("id")
        .select(graft.functions.HashExpressions.slidingMin(col("arr"), w))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      assert(got === arrays.map(reference(_, w)), s"w=$w")
    }
    // SQL-registered twin agrees
    GraftExtensions.register(spark)
    val sql = spark.sql("SELECT sliding_min(array(9L, 1L, 7L, 3L, 8L), 2)")
      .collect().head.getSeq[Long](0).toSeq
    assert(sql === Seq(1L, 1L, 3L, 3L))
  }

  test("bloom agg + probe: zero false negatives, FP rate near fpp, merge across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.BloomExpressions
    // build distributed (13 partitions force partial-buffer merges)
    val members = spark.range(0, 10000L).repartition(13)
    val bytes = members.agg(BloomExpressions.bloomFilterAgg(col("id"), 10000L, 0.03))
      .head().getAs[Array[Byte]](0)
    val filter = BloomExpressions.filterFromBytes(bytes)
    // the bloom invariant: NO false negatives, whatever the merge order
    val missed = members.filter(!BloomExpressions.mightContainLong(col("id"), filter)).count()
    assert(missed === 0L, "bloom filters must never produce false negatives")
    // false-positive rate on 20k definite non-members tracks the configured fpp
    val fp = spark.range(1000000L, 1020000L)
      .filter(BloomExpressions.mightContainLong(col("id"), filter)).count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.09, s"FP rate $rate vs configured 0.03")
  }
}
