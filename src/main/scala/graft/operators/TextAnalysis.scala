package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline:
 * tokenization, quality scoring, language ID, document fingerprinting.
 *
 * Everything is built-in (codegen'd) expressions — higher-order array
 * functions instead of UDFs — so the hot path stays inside whole-stage
 * codegen and scales linearly with no per-row JVM boundary crossings.
 */
object TextAnalysis {

  /** RE2's `\s` class, spelled explicitly. Java regex `\s` additionally
   * matches vertical tab (\x0B); the DuckDB oracles tokenize with RE2
   * `string_split_regex('\s+')`, so using Java `\s` here would split
   * differently on any document containing \x0B. */
  val wsClass = "[ \\t\\n\\f\\r]"

  /** Whitespace tokenizer (the cross-engine-stable baseline; a BPE-ish
   * subword regex is [[bpeishTokens]]). */
  def tokens(text: Column): Column = split(trim(text), wsClass + "+")

  /** BPE-ish tokenization: words, numbers, and single punctuation marks as
   * separate tokens — a regex approximation of byte-pair pretokenizers.
   * Whitespace is dropped via the explicit [[wsClass]], NOT `trim()` —
   * trim strips only 0x20, so a bare tab/newline token would otherwise
   * survive and diverge from the RE2 token class
   * `[A-Za-z0-9]+|[^A-Za-z0-9\t\n\f\r ]` the q_token_count oracle states. */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(regexp_replace(t, wsClass, "")) > 0)

  /** Small English stopword list (public domain, the usual top function words). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /**
   * Quality-score columns: token count, stopword ratio, punctuation ratio,
   * mean token length — the standard cheap heuristics used to filter web
   * text before training (c4/ccnet-style length+symbol filters).
   */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_stopwords", stopwordCount(t).cast("long"))
      .withColumn("n_punct", punctCount(col(textCol)).cast("long"))
      .withColumn("stop_ratio", col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("mean_token_chars",
        (length(trim(col(textCol))) - col("n_tokens") + 1).cast("double") / col("n_tokens"))
  }

  /** Tiny per-language function-word lists for the n-gram/stopword heuristic
   * language identifier (public-domain word lists). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "des", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "que", "una", "con", "por", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Scripts written without word spaces — token matching never fires for
   * them, so their markers are scored by substring occurrence instead. */
  private val spaceFreeScripts = Set("zh")

  /** Number of occurrences of `needle` in `haystack` as a column. */
  private def occurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) / needle.length)
      .cast("long")

  /**
   * Heuristic language ID: score = count of language marker hits; winner =
   * argmax with deterministic tie-break (lexicographically greatest language
   * wins on equal score via struct max-ordering). Latin-script languages
   * match whole tokens (substrings would inflate, e.g. "les" in "tables");
   * space-free scripts (zh) count marker-character occurrences, since the
   * whole sentence is one whitespace token. Emits `lang_pred` + the winning
   * score. The classic fastText-free fallback; at 100 TB it is one codegen'd
   * projection, no shuffle.
   */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val lowered = lower(col(textCol))
    val toks = tokens(lowered)
    val scored = langMarkers.keys.toSeq.sorted.map { lang =>
      val score =
        if (spaceFreeScripts(lang))
          langMarkers(lang).map(m => occurrences(lowered, m)).reduce(_ + _)
        else
          size(filter(toks, t => t.isin(langMarkers(lang).map(lit): _*))).cast("long")
      struct(score.as("score"), lit(lang).as("lang"))
    }
    df.withColumn("best", array_max(array(scored: _*)))
      .withColumn("lang_pred", col("best.lang"))
      .withColumn("lang_score", col("best.score"))
      .drop("best")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text.
   * md5 is bit-identical across engines (unlike xxhash64/DuckDB hash), so
   * it doubles as the exact-dedup key the oracle can recompute. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), wsClass + "+", " ")))

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing: Local
   * Algorithms for Document Fingerprinting", SIGMOD 2003): hash every token
   * k-gram, slide a window of `w` hashes, keep each window's minimum →
   * a compact fingerprint set that overlaps heavily for documents sharing
   * any sufficiently long passage. Guarantees: any shared run of
   * w + k − 1 tokens produces ≥1 shared fingerprint.
   */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    val hashes = graft.functions.HashExpressions.wordShingleHashes(text, k)
    when(size(hashes) >= w,
      array_distinct(transform(
        sequence(lit(0), size(hashes) - w),
        i => array_min(slice(hashes, i + 1, lit(w))))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))
  }
}
