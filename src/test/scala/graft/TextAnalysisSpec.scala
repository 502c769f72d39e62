package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token and stopword counts") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val out = TextAnalysis.withQuality(df).head()
    assert(out.getAs[Long]("n_tokens") === 6L)
    assert(out.getAs[Long]("n_stopwords") === 3L) // the, on, the
    assert(out.getAs[Double]("stop_ratio") === 0.5)
  }

  test("punctuation count") {
    val df = Seq((1L, "wait, what?! ok.")).toDF("doc_id", "text")
    assert(df.select(TextAnalysis.punctCount(col("text"))).head().getInt(0) === 4)
  }

  test("bpe-ish tokenizer splits words, numbers and punctuation") {
    val df = Seq((1L, "hello, world42!")).toDF("doc_id", "text")
    val toks = df.select(TextAnalysis.bpeishTokens(col("text"))).head().getSeq[String](0)
    assert(toks === Seq("hello", ",", "world42", "!"))
  }

  test("language id picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog went to the house and it was good"),
      (2L, "der hund und die katze ist nicht mit der maus auf dem tisch"),
      (3L, "le chat et la maison est dans les arbres pour une heure"),
      (4L, "el perro y la casa es una cosa que con los gatos por aqui")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es"))
  }

  test("language id handles space-free scripts via occurrence counting") {
    val df = Seq(
      (1L, "我们的人都说这是不可能的但是我有我的想法"),  // zh, no spaces
      (2L, "the dog and the cat went to the house")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "zh", 2L -> "en"))
  }

  test("winnowing fingerprints: shared passages share fingerprints") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, s"intro words here $shared trailing bits"),
      (2L, s"completely other opening $shared and another ending"),
      (3L, "nothing in common with those documents at all whatsoever today")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // docs 1 and 2 share a 10-token passage >> w+k-1 → guaranteed overlap
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
    // identical text → identical fingerprint set
    val dup = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
      .select(TextAnalysis.winnowFingerprints(col("text"))).collect()
    assert(dup(0).getSeq[Long](0) === dup(1).getSeq[Long](0))
  }

  test("winnowing fingerprints: NULL and too-short text both yield EMPTY sets") {
    // the expression chain is null-intolerant, so without the explicit
    // coalesce a NULL doc would get a NULL set (size -1, dropped by joins)
    // instead of the documented empty set
    val df = Seq((1L, null: String), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text")).as("fps"),
        size(TextAnalysis.winnowFingerprints(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getInt(2)))).toMap
    assert(out.values.forall { case (fps, n) => fps.isEmpty && n === 0 })
  }

  test("fingerprint is stable under whitespace and case noise") {
    val df = Seq((1L, "Some  Document\tText "), (2L, "some document text")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("redaction replaces emails, ids, and phones with placeholders and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob.smith+x@example.org now"),
      (2L, "ssn 123-45-6789 ok"),
      (3L, "call +1 (415) 555-0123 today"),
      (4L, "clean text, nothing to hide"),
      (5L, "multi a@b.co c@d.org and 4155550199")).toDF("doc_id", "text")
    val out = TextAnalysis.withRedaction(df)
      .select("doc_id", "text_redacted", "n_emails", "n_phones", "n_ids", "n_redactions")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) === (("contact <EMAIL> now", 1L, 0L, 0L, 1L)))
    assert(out(2L) === (("ssn <ID> ok", 0L, 0L, 1L, 1L)))
    assert(out(3L) === (("call <PHONE> today", 0L, 1L, 0L, 1L)))
    assert(out(4L) === (("clean text, nothing to hide", 0L, 0L, 0L, 0L)))
    assert(out(5L) === (("multi <EMAIL> <EMAIL> and <PHONE>", 2L, 1L, 0L, 3L)))
  }

  test("redaction overlap precedence: email beats id beats phone") {
    import spark.implicits._
    val df = Seq(
      // SSN-shaped digits inside an email local part: the email redaction
      // consumes them whole — no partial <ID> inside an address
      (1L, "id55-1234@host.com"),
      // an SSN inside a longer digit context stays an <ID>, never <PHONE>
      (2L, "dial 999-88-7777 now"),
      // a phone that merely CONTAINS hyphenated digits without SSN shape
      (3L, "fax 415-555-0123")).toDF("doc_id", "text")
    val out = TextAnalysis.withRedaction(df)
      .select("doc_id", "text_redacted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "<EMAIL>")
    assert(out(2L) === "dial <ID> now")
    assert(out(3L) === "fax <PHONE>")
  }

  test("redactFull: card/ip kinds and the widened precedence chain") {
    import spark.implicits._
    val df = Seq(
      // grouped and flat card shapes both become <CC>, never <PHONE>
      (1L, "pay 4111 1111 1111 1111 now"),
      (2L, "pay 4111-1111-1111-1111 or 5500005555555559"),
      // amex grouping (4-6-5) is NOT card-shaped here → phone rule eats it
      (3L, "amex 3782 822463 10005"),
      // ip quads redact; octets not range-checked (recall over precision)
      (4L, "ping 10.0.0.1 then 999.1.1.1"),
      // version-ish dotted triple is NOT an ip
      (5L, "spark 4.1.2 released"),
      // ssn stays <ID> even with a card and phone in the same row
      (6L, "ssn 123-45-6789 card 4111111111111111 call +1 (415) 555-0123"),
      // 20-digit run: word-bounded cc can't partially consume → <PHONE>
      (7L, "ref 41111111111111111111 end"),
      (8L, "clean, nothing to hide")).toDF("doc_id", "text")
    val out = TextAnalysis.withFullRedaction(df)
      .select("doc_id", "text_redacted", "n_ccs", "n_ips", "n_phones", "n_ids")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) === (("pay <CC> now", 1L, 0L, 0L, 0L)))
    assert(out(2L) === (("pay <CC> or <CC>", 2L, 0L, 0L, 0L)))
    assert(out(3L) === (("amex <PHONE>", 0L, 0L, 1L, 0L)))
    assert(out(4L) === (("ping <IP> then <IP>", 0L, 2L, 0L, 0L)))
    assert(out(5L) === (("spark 4.1.2 released", 0L, 0L, 0L, 0L)))
    assert(out(6L) === (("ssn <ID> card <CC> call <PHONE>", 1L, 0L, 1L, 1L)))
    assert(out(7L) === (("ref <PHONE> end", 0L, 0L, 1L, 0L)))
    assert(out(8L) === (("clean, nothing to hide", 0L, 0L, 0L, 0L)))
  }

  test("paragraph dedup keeps first occurrences in order and reassembles") {
    import spark.implicits._
    val df = Seq(
      (1L, "para one\n\npara two\n\npara one\n\nfooter"),
      (2L, "single paragraph"),
      (3L, "a\n\n\n\na\n\nb"), // 2+ newlines collapse to one separator
      (4L, "x\n\nx\n\nx\n\nx")).toDF("doc_id", "text")
    val out = TextAnalysis.withParagraphDedup(df)
      .select("doc_id", "n_paras", "text_dedup", "n_paras_kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) === ((4L, "para one\n\npara two\n\nfooter", 3L)))
    assert(out(2L) === ((1L, "single paragraph", 1L)))
    assert(out(3L) === ((3L, "a\n\nb", 2L)))
    assert(out(4L) === ((4L, "x", 1L)))
  }

  test("repetition metrics: dup lines, dup 2-grams, top-2-gram share") {
    import spark.implicits._
    val df = Seq(
      // 4 lines, "menu" twice → 1 dup line; 2-grams of "a b a b a b":
      // [a b, b a, a b, b a, a b] = 5 total, 2 distinct, top "a b"×3
      (1L, "menu\na b a b a b\nmenu\nend"),
      // all unique: 1 line, grams [u v, v w] distinct
      (2L, "u v w"),
      // single token: no 2-grams → NULL ratios, n_2grams = 0
      (3L, "alone"),
      // empty text: split("") = [""] → one line, zero dups
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) === 4L && r1.getLong(2) === 1L) // n_lines, n_dup_lines
    assert(r1.getDouble(3) === 0.25)
    assert(r1.getLong(4) === 8L)  // menu,a  a,b  b,a  a,b  b,a  a,b  b,menu  menu,end
    assert(r1.getLong(5) === 5L)  // distinct: menu-a ab ba b-menu menu-end
    assert(r1.getDouble(6) === 1.0 - 5.0 / 8.0)
    assert(r1.getDouble(7) === 3.0 / 8.0) // "a b" ×3
    val r2 = out(2L)
    assert(r2.getLong(4) === 2L && r2.getLong(5) === 2L)
    assert(r2.getDouble(6) === 0.0 && r2.getDouble(7) === 0.5)
    val r3 = out(3L)
    assert(r3.getLong(4) === 0L && r3.isNullAt(6) && r3.isNullAt(7))
    val r4 = out(4L)
    assert(r4.getLong(1) === 1L && r4.getLong(2) === 0L && r4.getLong(4) === 0L)
  }

  test("trigram log-likelihood: corpus-trained model, exact tiny-corpus values") {
    import spark.implicits._
    // corpus: "aaaa" → [aaa, aaa]; "aaab" → [aaa, aab]; "ab" → none.
    // model: aaa:3, aab:1, total 4.
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramLogLikelihood(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lnAaa = math.log(3.0) - math.log(4.0)
    val lnAab = math.log(1.0) - math.log(4.0)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === ((2L, r4(lnAaa))))
    assert(out(2L) === ((2L, r4((lnAaa + lnAab) / 2))))
    assert(!out.contains(3L)) // too short to score
    // fluent-vs-junk discrimination on a slightly larger corpus: the doc
    // made of the corpus's dominant pattern outscores the mojibake one
    val corpus = (0L until 20L).map(i => (i, "the cat sat on the mat " * 3)) ++
      Seq((100L, "the cat sat on the mat"), (101L, "q7#zp@!x¿鬼w%"))
    val scored = TextAnalysis.trigramLogLikelihood(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(100L) > scored(101L) + 1.0, s"fluent ${scored(100L)} vs junk ${scored(101L)}")
  }

  test("bpeish tokens drop tab/newline whitespace, matching the RE2 token class") {
    import spark.implicits._
    val df = Seq(("a\tb", 1), ("a\nb c!", 2)).toDF("text", "id")
    val counts = df.select(col("id"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    // "a\tb" -> [a, b]; "a\nb c!" -> [a, b, c, !]
    assert(counts === Map(1 -> 2, 2 -> 4))
  }

  test("normalize canonicalizes CRLF, whitespace runs, and blank-line gaps") {
    import spark.implicits._
    val cases = Seq(
      (1L, "  a\t\tb  "),              // tab run + outer pad → "a b"
      (2L, "a\r\nb\rc"),               // CRLF and bare CR → LF
      (3L, "a \n b\n\n\n\n\nc"),       // hugged spaces + 5 newlines → para break
      (4L, "\n\n \t \n\n"),            // all whitespace → empty
      (5L, "a\fb"))              // VT/FF are horizontal whitespace
      .toDF("doc_id", "text")
    val out = TextAnalysis.withNormalization(cases)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_norm")).toMap
    assert(out === Map(
      1L -> "a b", 2L -> "a\nb\nc", 3L -> "a\nb\n\nc", 4L -> "", 5L -> "a b"))
    // removal arithmetic holds
    val counts = TextAnalysis.withNormalization(cases)
      .selectExpr("n_chars_raw - n_chars_norm = n_chars_removed AS ok")
      .collect().map(_.getBoolean(0))
    assert(counts.forall(identity))
  }

  test("stripHtml drops script/style/comments, flattens tags, decodes entities once") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "<SCRIPT>var a = 1 < 2;</SCRIPT>keep<style\ntype=\"x\">p{}</style>"),
      (3L, "a<!-- multi\nline comment -->b"),
      (4L, "5 &lt; 6 &amp; x &#39;q&#39; &nbsp;z"),
      (5L, "&amp;lt; stays entity"), // one decode level only
      (6L, "<a href=\"/x\">one</a> <a href=\"/y\">two</a>"))
      .toDF("doc_id", "html")
    val out = TextAnalysis.withHtmlExtraction(pages)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_clean"), r.getAs[Long]("n_links")))).toMap
    assert(out(1L) === (("hello world", 0L)))
    assert(out(2L) === (("keep", 0L)))
    assert(out(3L) === (("a b", 0L)))
    assert(out(4L) === (("5 < 6 & x 'q' z", 0L)))
    assert(out(5L) === (("&lt; stays entity", 0L)))
    assert(out(6L) === (("one two", 2L)))
  }

  test("DSIR importance weights pull the resample toward the target domain") {
    import org.apache.spark.sql.functions.{col, exp}
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = TextAnalysis.importanceWeights(docs, col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val means = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("logw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target-domain docs must outscore the rest: $means")
    // Resampling shift needs real domain separation (the testdata langs
    // share most character-trigram mass, weights sit at ±0.02): build a
    // corpus where 30% is target-like English and 70% is alien noise —
    // exp(logw) resampling must over-represent the target side decisively.
    import spark.implicits._
    val tgt = (0 until 30).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i", true))
    val noise = (30 until 100).map(i =>
      (i.toLong, s"zq$i xv${i * 7} qqkz wvx${i % 9} zzt jjq kqv wxz", false))
    val mix = (tgt ++ noise).toDF("doc_id", "text", "is_tgt")
    val mw = TextAnalysis.importanceWeights(mix, col("is_tgt"))
      .join(mix.select(col("doc_id"), col("is_tgt")), "doc_id")
    val picked = graft.operators.Sampling.weightedSample(
        mw, col("doc_id"), exp(col("logw")), n = 30)
      .filter(col("is_tgt")).count()
    assert(picked >= 25,
      s"resample must over-represent the 30%-share target: picked $picked of 30")
  }

  test("chunkByTokens: lossless coverage, exact overlap, bounded windows") {
    import org.apache.spark.sql.functions.col
    val doc = (1 to 103).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkByTokens(df, "doc_id", "text", chunk = 10, overlap = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts advance by step = 7; last window starts ≤ 102
    assert(d1.map(_._3).toSeq === (0L until 103L by 7L).toSeq)
    // every window holds ≤ 10 tokens and only the last may be shorter
    assert(d1.dropRight(1).forall(_._4 === 10L) && d1.last._4 <= 10L)
    // consecutive chunks share exactly `overlap` tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._5.split(" ").takeRight(3).toSeq === b._5.split(" ").take(3).toSeq)
    case _ => }
    // lossless: de-overlapped concatenation reconstructs the document
    val rebuilt = (d1.head._5.split(" ").toSeq ++
      d1.tail.toSeq.flatMap(c => c._5.split(" ").drop(3).toSeq)).mkString(" ")
    assert(rebuilt === doc)
    // short doc → one chunk, intact
    assert(chunks.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L, "a b c")))
    // empty doc → a single empty chunk (split of "" is [""]), never zero rows
    assert(chunks.count(_._1 == 3L) === 1)
  }

  test("withC4Filter applies the line and document heuristics") {
    val good = "this is a perfectly reasonable first sentence here."
    val df = Seq(
      // 3 good lines, one too-short line, one no-terminal-punct line,
      // one javascript line → kept; doc passes
      (1L, Seq(good, "too short line.", "no terminal punctuation at all here",
        "please enable JavaScript to view this page.",
        "another long and complete sentence follows right here!",
        "and one more full sentence to meet the three line bar?").mkString("\n")),
      // enough good lines but doc contains lorem ipsum → dropped
      (2L, Seq(good, good, good, "lorem ipsum dolor sit amet").mkString("\n")),
      // curly brace (code) → dropped
      (3L, Seq(good, good, good, "function f() { return 1; }").mkString("\n")),
      // only 2 surviving lines → dropped
      (4L, Seq(good, good, "short.").mkString("\n")),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.withC4Filter(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[Boolean]("c4_keep")))).toMap
    assert(out(1L) === ((6L, 3L, true)))
    assert(out(2L)._3 === false && out(2L)._2 === 3L) // lines fine, doc fails
    assert(out(3L)._3 === false)                      // curly brace kills it
    assert(out(4L) === ((3L, 2L, false)))
    assert(out(5L) === ((1L, 0L, false)))
    // clean_chars = kept lines rejoined
    val c1 = TextAnalysis.withC4Filter(df).filter(col("doc_id") === 1L)
      .head().getAs[Long]("clean_chars")
    assert(c1 === Seq(good,
      "another long and complete sentence follows right here!",
      "and one more full sentence to meet the three line bar?")
      .mkString("\n").length.toLong)
  }

  test("tfIdfTopTerms ranks distinguishing terms above ubiquitous ones") {
    val df = Seq(
      (1L, "spark spark spark common common word"),
      (2L, "duck duck common common word word"),
      (3L, "goose goose goose common word word")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(df, topK = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("trank"),
        r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df_t")))
    // every doc's #1 term is its unique high-tf token, not the shared ones
    val top1 = out.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    assert(top1 === Map(1L -> "spark", 2L -> "duck", 3L -> "goose"))
    // df counts: "common"/"word" in all 3 docs, "spark" in 1
    val spark1 = out.find(r => r._1 == 1L && r._3 == "spark").get
    assert(spark1._4 === 3L && spark1._5 === 1L)
    // exactly topK rows per doc, ranks 1..k
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq === Seq(1L, 2L) })
    // idf really discounts ubiquity: in doc 2, doc-unique "duck" (tf 2,
    // score 2·(ln(4/2)+1) ≈ 3.39) outranks every-doc "word" at the SAME
    // tf (score 2) — frequency alone doesn't win
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.head._3 === "duck")
    assert(d2.map(_._3).toSeq === Seq("duck", "common")) // tie at 2.0 → term asc
  }

  test("bm25Scores: length normalization, idf, zero for query-free docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark spark filler filler filler filler filler"),
      (2L, "spark spark spark"),
      (3L, "filler words only here nothing relevant at all"),
      (4L, "rare rare spark")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(df, Seq("spark", "rare"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dl"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("bm25")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(3L) === ((8L, 0L, 0.0)))      // no query term → exactly 0
    assert(out(4L)._2 === 2L)                // both terms hit
    // same tf(spark)=3: the 3-token doc beats the 8-token doc (b-norm)
    assert(out(2L)._3 > out(1L)._3)
    // exact value for doc 2 against a scalar reimplementation of the
    // formula (df(spark)=3 of N=4, avgdl=22/4)
    val n = 4.0; val avgdl = 22 / 4.0
    def idf(dfT: Double) = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
    def s(tf: Double, dfT: Double, dl: Double) =
      idf(dfT) * ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
    val exp2 = BigDecimal(s(3, 3, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._3 === exp2)
    // doc 4 sums both terms in fixed order; the rare term (df=1) carries
    // a larger idf than the common one (df=3)
    val exp4 = BigDecimal(s(2, 1, 3) + s(1, 3, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(4L)._3 === exp4)
    assert(idf(1.0) > idf(3.0))
  }

  test("hashedLinearScore: mean-pooled bucket weights, absent buckets weigh 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good good good"),  // logit = bias + w(good)
      (2L, "good bad"),        // mean of the two weights
      (3L, "unmodeled tokens only"), // every bucket absent → logit = bias
      (4L, "")).toDF("doc_id", "text") // tokenless → logit = bias, n=0
    val nB = 64
    def b(term: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16) % nB
    }
    val model = Seq(b("good") -> 2.0, b("bad") -> -1.0).toDF("bucket", "weight")
    // hash collisions between the fixture terms would invalidate the
    // expected logits below — assert the buckets are genuinely distinct
    val fixtureBuckets = Seq("good", "bad", "unmodeled", "tokens", "only").map(b)
    assert(fixtureBuckets.distinct.size === fixtureBuckets.size)
    val out = TextAnalysis.hashedLinearScore(docs, model, nB, bias = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("logit"),
          r.getAs[Boolean]("label")))).toMap
    assert(out(1L) === ((3L, 2.5, true)))        // 0.5 + 6/3
    assert(out(2L) === ((2L, 1.0, true)))        // 0.5 + (2-1)/2
    assert(out(3L) === ((3L, 0.5, true)))        // all-unmodeled → bias
    assert(out(4L) === ((0L, 0.5, true)))        // tokenless → bias
    // sigmoid is consistent with the logit
    val s1 = TextAnalysis.hashedLinearScore(docs, model, nB, bias = 0.5)
      .filter(col("doc_id") === 1L).head().getAs[Double]("score")
    assert(math.abs(s1 - 1.0 / (1.0 + math.exp(-2.5))) < 1e-12)
    // a negative-weight-dominated doc flips the label
    val neg = TextAnalysis.hashedLinearScore(
        Seq((9L, "bad bad bad bad")).toDF("doc_id", "text"), model, nB, bias = 0.5)
      .head()
    assert(neg.getAs[Double]("logit") === -0.5 && !neg.getAs[Boolean]("label"))
  }

  test("oovRate: head vocabulary in, tail out, deterministic boundary") {
    import spark.implicits._
    // "the" ×6, "cat" ×4, "dog" ×2, "zyx" ×1 — vocabSize 2 keeps {the, cat}
    val docs = Seq(
      (1L, "the cat the cat"),         // all in-vocab → 0.0
      (2L, "the dog zyx cat dog the"), // 3 OOV of 6 → 0.5
      (3L, ""))                        // tokenless → absent
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate")))).toMap
    assert(out === Map(1L -> ((4L, 0L, 0.0)), 2L -> ((6L, 3L, 0.5))))
    intercept[IllegalArgumentException](TextAnalysis.oovRate(docs, vocabSize = 0))
  }

  test("collocations: hand-computed PMI, minCount suppresses hapax pairs") {
    import spark.implicits._
    // (new, york) ×3 and (old, deal) ×1; hapax pair has the HIGHER pmi
    // (ln 16 > ln 16/3) — exactly the pathology minCount exists to drop
    val docs = (Seq.fill(3)("new york") :+ "old deal" :+ "" :+ "   ")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, k = 5, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // Nb = 4 pairs, Nu = 8 tokens: pmi = ln((3/4)/((3/8)·(3/8)))
    val expected = math.log((3.0 / 4) / ((3.0 / 8) * (3.0 / 8)))
    assert(out.keySet === Set(("new", "york")))
    assert(out(("new", "york"))._1 === 3L)
    assert(math.abs(out(("new", "york"))._2 - expected) < 1e-4)
    // minCount = 1 admits the hapax pair, which then outranks
    val all = TextAnalysis.collocations(docs, k = 5, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(all.head === (("old", "deal")) && all.toSet.size === 2)
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(docs, k = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(docs, k = 1, minCount = 0))
  }

  test("readability: hand-computed FK on a known sentence, degenerate docs NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat."),     // 3 words, 1 sentence, 3 vowel runs
      (2L, "hello world"),      // no terminator → sentences floored at 1
      (3L, "zzz pfft"),         // no vowels → syllables floored at word count
      (4L, ""),                 // empty → 0 words → NULL metrics
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getAs[Long]("n_sentences"),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getAs[java.lang.Double]("fk_grade")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("reading_ease")).map(_.doubleValue))))
      .toMap
    // wps = 3, spw = 1: grade = .39·3 + 11.8 − 15.59 = −2.62,
    // ease = 206.835 − 3.045 − 84.6 = 119.19
    assert(out(1L) === ((Some(3L), 1L, Some(3L), Some(-2.62), Some(119.19))))
    assert(out(2L)._2 === 1L && out(2L)._1 === Some(2L))
    assert(out(3L)._3 === Some(2L)) // floored at n_words, never 0
    assert(out(4L) === ((Some(0L), 1L, Some(0L), None, None)))
    assert(out(5L)._1 === None && out(5L)._4 === None)
  }

  test("compressionSignals: boilerplate compresses, noise doesn't, empty is NULL") {
    import spark.implicits._
    // deterministic "high-entropy" text: hex of a seeded hash chain — no
    // RNG, same bytes every run
    val noise = (0 until 200).map(i =>
      java.lang.Long.toHexString(
        graft.functions.HashMix.mix64(i.toLong + 42L))).mkString
    val docs = Seq(
      (1L, "ab" * 2000),                      // pure repetition
      (2L, ("the quick brown fox jumps over the lazy dog. " * 40) + noise),
      (3L, noise),                            // incompressible
      (4L, ""),                               // empty
      (5L, null.asInstanceOf[String]))        // null text
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignals(docs)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.getAs[java.lang.Double]("ratio")).map(_.doubleValue)))).toMap
    // ordering pin: repetition << prose+noise < noise alone
    val ratio = (id: Long) => out(id)._3.get
    assert(ratio(1L) < 0.02, s"repetition ratio ${ratio(1L)}")
    assert(ratio(1L) < ratio(2L) && ratio(2L) < ratio(3L))
    assert(ratio(3L) > 0.4, s"noise ratio ${ratio(3L)}")
    // empty: 0 bytes, 0 deflate, NULL ratio (not 'perfectly compressible')
    assert(out(4L) === ((Some(0L), Some(0L), None)))
    // null text: byte length NULL upstream → whole row null-propagated
    assert(out(5L) === ((None, None, None)))
    // determinism across evaluations (thread-local deflater reuse)
    val again = TextAnalysis.compressionSignals(docs)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(again(1L) === Some(out(1L)._2.get) && again(3L) === Some(out(3L)._2.get))
    // SQL surface
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT deflate_size('aaaaaaaaaaaaaaaaaaaaaaaa')")
      .head().getLong(0)
    assert(viaSql > 0L && viaSql < 24L)
  }

  test("deflate/inflate: round-trip identity, size consistency, edge cases") {
    import graft.functions.CompressExpressions.{deflate, deflateSize, inflate}
    val noise = (0 until 300).map(i =>
      java.lang.Long.toHexString(
        graft.functions.HashMix.mix64(i.toLong - 7L))).mkString
    val docs = Seq(
      (1L, "ab" * 5000),
      (2L, "unicode: café ☃ 😀 mixed with ascii"),
      (3L, noise),
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        col("text"),
        inflate(deflate(col("text"))).cast("string").as("rt"),
        deflateSize(col("text")).as("dsize"),
        octet_length(deflate(col("text"))).cast("long").as("dlen"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    // round-trip identity on every non-null row (incl. multi-byte UTF-8)
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(out(id)._2 === out(id)._1, s"round-trip mismatch for $id")
    // the streaming size expression equals the materialized byte count
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(out(id)._3 === out(id)._4, s"size mismatch for $id")
    // null propagates
    assert(out(5L) === ((None, None, None, None)))
    // corrupt stream fails loud, not silently-partial
    val corrupt = docs.filter(col("doc_id") === 3L)
      .select(inflate(expr("substring(CAST('notdeflate' AS BINARY), 1, 8)")))
    val err = intercept[Exception] { corrupt.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("inflate") || m.contains("DEFLATE")))
    // SQL surface
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT CAST(inflate(deflate('abc')) AS STRING)")
      .head().getString(0) === "abc")
  }

  test("encodingAudit: replacement/control/mojibake counts, ppm, repair flag") {
    val docs = Seq(
      (1L, "plain ascii text"),                       // clean
      (2L, "cafÃ© naÃ¯ve"),       // 2-byte mojibake ×2
      (3L, "donâ€™t â€œq"), // 3-byte mojibake ×2
      (4L, "bad�bytes�"),                   // replacement ×2
      (5L, "bell\u0007 esc\u001B tab\t nl\n del\u007F"), // controls: BEL ESC DEL
      (6L, "résumé"),                       // real é: non-ascii, NOT mojibake
      (7L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.encodingAudit(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(1L) === ((0L, 0L, 0L, 0L, 1000000L, false)))
    assert(out(2L) === ((0L, 0L, 2L, 4L, 666666L, true)))  // floor(8/12*1e6)
    assert(out(3L) === ((0L, 0L, 2L, 6L, 500000L, true)))  // 12 chars, 6 non-ascii
    assert(out(4L) === ((2L, 0L, 0L, 2L, 800000L, true)))  // floor(8/10*1e6)
    assert(out(5L) === ((0L, 3L, 0L, 0L, 1000000L, true))) // all-ascii yet dirty
    assert(out(6L) === ((0L, 0L, 0L, 2L, 666666L, false))) // clean UTF-8 passes
    assert(out(7L) === ((0L, 0L, 0L, 0L, 1000000L, false))) // empty → clean
  }
}
