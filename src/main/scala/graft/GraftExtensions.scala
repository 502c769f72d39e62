package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgrams, FloatDotProduct, MinHashSignature, SimHash64, SlidingMin, WordShingleHashes}

/**
 * SQL surface for the engine's custom Catalyst expressions. Activate on a
 * new session with `spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`); for an
 * already-running session use [[GraftExtensions.register]].
 *
 * Functions: `float_dot(a, b)`, `simhash64(hashes)`, `minhash_sig(hashes, k)`,
 * `word_shingle_hashes(text, n)`, `char_ngrams(text, n)`,
 * `sliding_min(arr, w)`, `hilbert_key(x, y, bits)`, `deflate_size(data)`,
 * `deflate(data)`, `inflate(data)`, `ngram_count_pairs(text, n)`.
 * Optimizer rules: [[graft.plans.CollectSetSizeToCountDistinct]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => graft.plans.CollectSetSizeToCountDistinct)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "float_dot" -> (info("float_dot",
      "float_dot(a, b) - dot product of two ARRAY<FLOAT> in double precision"),
      (es: Seq[Expression]) => FloatDotProduct(es(0), es(1))),
    "simhash64" -> (info("simhash64",
      "simhash64(hashes) - 64-bit simhash from an ARRAY<BIGINT> of element hashes"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    "minhash_sig" -> (info("minhash_sig",
      "minhash_sig(hashes, k) - k-long minhash signature from ARRAY<BIGINT>"),
      (es: Seq[Expression]) => MinHashSignature(es(0), kLiteral("minhash_sig", es(1)))),
    "word_shingle_hashes" -> (info("word_shingle_hashes",
      "word_shingle_hashes(text, n) - ordered 64-bit hashes of word n-grams"),
      (es: Seq[Expression]) => WordShingleHashes(es(0), kLiteral("word_shingle_hashes", es(1)))),
    "char_ngrams" -> (info("char_ngrams",
      "char_ngrams(text, n) - all length-n codepoint windows as ARRAY<STRING>"),
      (es: Seq[Expression]) => CharNgrams(es(0), kLiteral("char_ngrams", es(1)))),
    "sliding_min" -> (info("sliding_min",
      "sliding_min(arr, w) - per-window minima of ARRAY<BIGINT> (winnowing pass)"),
      (es: Seq[Expression]) => SlidingMin(es(0), kLiteral("sliding_min", es(1)))),
    "deflate_size" -> (info("deflate_size",
      "deflate_size(data) - raw-DEFLATE byte count of STRING/BINARY (compressibility signal)"),
      (es: Seq[Expression]) => graft.functions.DeflateSize(es(0))),
    "deflate" -> (info("deflate",
      "deflate(data) - raw-DEFLATE (level 6, nowrap) bytes of STRING/BINARY"),
      (es: Seq[Expression]) => graft.functions.DeflateBytes(es(0))),
    "inflate" -> (info("inflate",
      "inflate(data) - inverse of deflate(); corrupt streams throw"),
      (es: Seq[Expression]) => graft.functions.InflateBytes(es(0))),
    "ngram_count_pairs" -> (info("ngram_count_pairs",
      "ngram_count_pairs(text, n) - per-row (gram, count) pairs over codepoint n-grams"),
      (es: Seq[Expression]) => graft.functions.NgramCountPairs(
        es(0), kLiteral("ngram_count_pairs", es(1)))),
    "hilbert_key" -> (info("hilbert_key",
      "hilbert_key(x, y, bits) - Hilbert-curve index of a 2-D point (layout key)"),
      // cast like the Column API does, so INT columns work from SQL too
      (es: Seq[Expression]) => graft.functions.HilbertKey(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.LongType),
        kLiteral("hilbert_key", es(2)))))

  /** The trailing integer parameter must be a foldable integral literal;
   * anything else gets a clean error (naming the CALLED function) instead
   * of a ClassCastException from eval(). */
  private def kLiteral(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: the integer parameter must be a literal, got $other")
  }

  /** Register the functions and optimizer rules on an already-built session
   * (`experimental.extraOptimizations` is the post-hoc twin of
   * `injectOptimizerRule`; idempotent). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, (_, builder)) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.CollectSetSizeToCountDistinct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CollectSetSizeToCountDistinct
    }
    // Engine default: ObjectHashAggregate (collect_set/collect_list and
    // every TypedImperativeAggregate) falls back to SORT-based
    // aggregation after only 128 distinct keys per task — i.e. any real
    // grouped collect at scale silently becomes a full-input sort. The
    // r14 sf100 rehearsal measured exactly that: the windowed collect_set
    // over 10⁸ events sorted (and spilled) its whole input, exhausting
    // scratch disk. We raise the default to 2¹⁶ — enough to keep
    // realistic grouped collects hash-based — but NOT unconditionally
    // higher: the fallback is the memory-safety valve for unbounded
    // aggregation buffers, and a workload collecting large lists per
    // group would OOM with millions of in-memory buffers per task.
    // Catalog runners with KNOWN-SMALL per-group buffers (Bench/Verify:
    // bounded sets of categories/ids) opt into 2²² via
    // spark.graft.objectHashFallbackThreshold; callers with large
    // per-group state should set that key LOWER (or leave the engine
    // default in place by pre-setting the spark.sql key).
    if (spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        .forall(_ == "128")) {
      val keys = spark.conf.getOption("spark.graft.objectHashFallbackThreshold")
        .map(_.toInt).getOrElse(1 << 16)
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", keys.toString)
    }
  }
}
