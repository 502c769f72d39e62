package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared analysis-time check: input must be ARRAY<BIGINT> (manual, not
 * ExpectsInputTypes — AbstractDataType is private[sql] in Spark 4). Without
 * it, e.g. ARRAY<INT> input silently reinterprets bits via ArrayData.getLong
 * instead of failing analysis. */
trait RequiresLongArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
    }
}

/** Static mix used by the minhash family; callable from generated code. */
object HashMix {
  /** splitmix64 finalizer (public-domain constant mix). */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** seed for the j-th minhash function (golden-ratio multiples). */
  def seed(j: Int): Long = 0x9e3779b97f4a7c15L * (j + 1)
}

/**
 * 64-bit SimHash from an array of element hashes, in ONE codegen'd pass
 * (the higher-order-function formulation runs 64 interpreted folds over the
 * array — measured ~11 s on 500 docs; this is milliseconds).
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with RequiresLongArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // All locals from ctx.freshName — fixed names collide when two expression
  // instances land in one generated function (CompileException → interpreted
  // fallback for the whole stage).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("shVotes")
      val i = ctx.freshName("shI")
      val h = ctx.freshName("shH")
      val b = ctx.freshName("shB")
      val b2 = ctx.freshName("shB2")
      val out = ctx.freshName("shOut")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) if ($votes[$b2] > 0) $out |= (1L << $b2);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * MinHash signature from an array of element hashes: sig[j] =
 * min over elements of splitmix64(h ⊕ seedⱼ), j < k — the standard
 * one-hash + k-mix construction, one codegen'd pass over the array
 * instead of k interpreted folds.
 */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with RequiresLongArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = HashMix.mix64(h ^ HashMix.seed(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("mhSig")
      val i = ctx.freshName("mhI")
      val h = ctx.freshName("mhH")
      val j = ctx.freshName("mhJ")
      val v = ctx.freshName("mhV")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = graft.functions.HashMix.mix64($h ^ graft.functions.HashMix.seed($j));
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * Word n-gram shingle hashes straight from the string, one pass: tokenize on
 * ASCII whitespace (same class as regex `\s`: space \t \n  \f \r —
 * deliberately NOT `Character.isWhitespace`, so the DuckDB oracle's
 * `string_split_regex('\s+')` sees identical token boundaries; empty tokens
 * are dropped on both sides), hash each token (FNV-1a 64 over its UTF-16
 * code units), and chain n consecutive token hashes (order-sensitive
 * splitmix chain) into one 64-bit shingle hash per position. Replaces the
 * split→transform(slice→concat_ws)→xxhash64 pipeline, which is interpreted
 * per element AND materializes every n-gram string.
 *
 * Output is ORDERED and positional (winnowing needs the sequence);
 * set-semantics callers apply `array_distinct` (cheap on longs).
 */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WordShingleHashes.compute(input.toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordShingleHashes.compute($a.toString(), $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {

  private def fnv1a64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      // hash the UTF-16 chars directly: stable and allocation-free; only
      // internal consistency matters for shingle identity
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** RE2's `\s` class — NOT Java's, which additionally matches vertical tab
   * (\x0B). The DuckDB oracles split with RE2 `\s+`, and TextAnalysis.tokens
   * uses the same explicit class, so all three tokenizers agree even on
   * documents containing \x0B. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Ordered shingle hashes of the whitespace-tokenized string. */
  def compute(text: String, n: Int): Array[Long] = {
    // find token [start, end) spans
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(text.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return Array.empty[Long]
    val tokenHash = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      tokenHash(t) = fnv1a64(text, starts.get(t), ends.get(t))
      t += 1
    }
    val out = new Array[Long](nTok - n + 1)
    var p = 0
    while (p < out.length) {
      var h = 0x51ed270b9a3e11c5L // chain seed
      var j = 0
      while (j < n) {
        h = HashMix.mix64(h ^ tokenHash(p + j))
        j += 1
      }
      out(p) = h
      p += 1
    }
    out
  }
}

/**
 * Character n-grams of a string as ARRAY<STRING>, one pass, codegen'd —
 * the char-window sibling of [[WordShingleHashes]]. The `transform(
 * sequence(...), i => substr)` formulation it replaces is interpreted per
 * CHARACTER (one boxed lambda call + expression-tree eval per position),
 * which made the corpus-trained trigram model's extraction pass the
 * slowest query in the bench (3.7 s at sf0.1).
 *
 * Slicing is by CODEPOINT (`UTF8String.substringSQL` — identical to SQL
 * `substring` and DuckDB's `substring`), so outputs match both the old
 * formulation and the oracle byte-for-byte, including on non-ASCII text.
 * Strings shorter than n yield an empty array (never sub-n-char grams).
 */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"char_ngrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharNgrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/**
 * Character n-grams of a string COUNTED per row, as
 * ARRAY<STRUCT<g: STRING, cnt: BIGINT>> — the map-side-combined sibling of
 * [[CharNgrams]]. `explode(char_ngrams(text))` followed by a
 * `groupBy(doc, g).count()` shuffles one row per gram INSTANCE (a
 * corpus-sized exchange: ~|text| rows per document); exploding this
 * expression's output yields the already-distinct (gram, count) pairs with
 * NO shuffle at all — per-document counting is row-local work, exactly
 * where it belongs at 100 TB. Slicing is by CODEPOINT (`substringSQL`,
 * identical to SQL `substring`), so gram strings match [[CharNgrams]] and
 * the DuckDB oracle byte-for-byte. Strings shorter than n yield an empty
 * array. Pair order is first-occurrence (deterministic), though downstream
 * aggregates never depend on it.
 */
case class NgramCountPairs(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"ngram_count_pairs: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ngram_count_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramCountPairs.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramCountPairs.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramCountPairs =
    copy(child = newChild)
}

object NgramCountPairs {
  import org.apache.spark.unsafe.types.UTF8String

  /** (gram, count) pairs over all length-n codepoint windows of `s`, keyed
   * by first occurrence; callable from generated code. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    val windows = chars - n + 1
    var i = 0
    while (i < windows) {
      val g = s.substringSQL(i + 1, n)
      val c = m.get(g)
      if (c == null) m.put(g, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Character n-grams of a string HASHED into a fixed bucket space and
 * counted per row, as ARRAY<STRUCT<b: BIGINT, cnt: BIGINT>> — the
 * fixed-feature-space sibling of [[NgramCountPairs]], and the actual DSIR
 * formulation (Xie et al. 2023 use hashed n-gram features, 10k buckets):
 * bucket = first 4 md5 bytes of the gram, unsigned, mod `buckets`, which is
 * exactly DuckDB's `CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) %
 * buckets` — the one hash both engines share, so the oracle stays
 * hash-green.
 *
 * The scale property this buys: the downstream model aggregate's key space
 * is CONSTANT (`buckets`), not the observed vocabulary — per-partition
 * partial aggregates, the exchange they feed, and the broadcast model all
 * stop growing with the corpus (the sf1 rehearsal measured the
 * exact-gram formulation at ~n^1.13 from exactly that vocabulary growth).
 * Counting stays row-local: grams are counted then bucket-merged inside
 * the row, so exploding the output still shuffles nothing.
 */
case class NgramBucketCounts(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {

  require(n >= 1, s"ngram_bucket_counts: n must be >= 1, got $n")
  require(buckets >= 1, s"ngram_bucket_counts: buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ngram_bucket_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramBucketCounts.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramBucketCounts.compute($a, $n, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): NgramBucketCounts =
    copy(child = newChild)
}

object NgramBucketCounts {
  import org.apache.spark.unsafe.types.UTF8String

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned value of the first 4 md5 bytes of `g`'s UTF-8 encoding —
   * identical to parsing the first 8 hex chars of `md5(g)`. */
  private def md5Head(g: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(g.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** (bucket, count) pairs over all length-n codepoint windows of `s`,
   * keyed by first bucket occurrence; callable from generated code. */
  def compute(s: UTF8String, n: Int, buckets: Int): GenericArrayData = {
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    // count distinct grams first (md5 runs once per DISTINCT gram, not per
    // instance), then merge into bucket counts
    val grams = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    val windows = chars - n + 1
    var i = 0
    while (i < windows) {
      val g = s.substringSQL(i + 1, n)
      val c = grams.get(g)
      if (c == null) grams.put(g, Array(1L)) else c(0) += 1L
      i += 1
    }
    val byBucket = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    val git = grams.entrySet().iterator()
    while (git.hasNext) {
      val e = git.next()
      val b = java.lang.Long.valueOf(md5Head(e.getKey) % buckets)
      val c = byBucket.get(b)
      if (c == null) byBucket.put(b, Array(e.getValue()(0)))
      else c(0) += e.getValue()(0)
    }
    val out = new Array[Any](byBucket.size())
    val it = byBucket.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.longValue(), e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}

object CharNgrams {
  import org.apache.spark.unsafe.types.UTF8String

  /** All length-n codepoint windows of `s` (empty if shorter than n). */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i < out.length) {
      // substringSQL is 1-based and codepoint-aware, matching SQL substring
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Sliding-window minimum over an ARRAY<BIGINT>: out[j] = min(arr[j..j+w)).
 * For 0 < n < w degrades to one window of all n elements (so winnowing's
 * "short doc → single fingerprint" rule needs no branch outside); empty in,
 * empty out.
 *
 * Replaces winnowing's interpreted `transform(sequence, i =>
 * array_min(slice(...)))` formulation — that is O(n·w) with per-window
 * array allocations outside codegen; this is the classic monotonic-deque
 * scan, O(n) amortized, one pass, zero allocation beyond the output.
 */
case class SlidingMin(child: Expression, w: Int)
    extends UnaryExpression with RequiresLongArrayInput {
  require(w > 0, s"window must be positive, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val effW = math.min(w, n)
    val out = new Array[Long](n - effW + 1)
    val dq = new Array[Int](n) // indices with increasing values
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - effW) head += 1
      if (i >= effW - 1) out(i - effW + 1) = arr.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("smN")
      val effW = ctx.freshName("smW")
      val out = ctx.freshName("smOut")
      val dq = ctx.freshName("smDq")
      val head = ctx.freshName("smHead")
      val tail = ctx.freshName("smTail")
      val i = ctx.freshName("smI")
      val v = ctx.freshName("smV")
      s"""
         |int $n = $a.numElements();
         |int $effW = java.lang.Math.min($w, $n);
         |long[] $out = new long[$n == 0 ? 0 : $n - $effW + 1];
         |int[] $dq = new int[$n];
         |int $head = 0, $tail = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  while ($tail > $head && $a.getLong($dq[$tail - 1]) >= $v) $tail--;
         |  $dq[$tail++] = $i;
         |  if ($dq[$head] <= $i - $effW) $head++;
         |  if ($i >= $effW - 1) $out[$i - $effW + 1] = $a.getLong($dq[$head]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object HashExpressions {
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))
  def slidingMin(hashes: Column, w: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(hashes), w))
  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), k))
  def wordShingleHashes(text: Column, n: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), n))
  def charNgrams(text: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(text), n))

  def ngramCountPairs(text: Column, n: Int): Column =
    Bridge.column(NgramCountPairs(Bridge.expression(text), n))

  def ngramBucketCounts(text: Column, n: Int, buckets: Int): Column =
    Bridge.column(NgramBucketCounts(Bridge.expression(text), n, buckets))
}
