package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Seeded-random invariant checks for the text-cleaning chain — the fixed
 * fixtures in TextAnalysisSpec pin known outputs; these pin the properties
 * that must hold on ANY input. */
class TextFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def normalizeAll(in: Seq[String]): Seq[String] =
    in.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
      .orderBy("id").select(TextAnalysis.normalize(col("t"))).collect()
      .map(_.getString(0)).toSeq

  test("normalize is idempotent and shape-clean on whitespace soup") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab c\t\n\r\f  \n\n"
    val docs = Seq.fill(300)(
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val once = normalizeAll(docs)
    val twice = normalizeAll(once)
    assert(twice === once, "normalize must be idempotent")
    for (s <- once) {
      assert(!s.exists("\r\t\f".contains(_)), s"control ws survived: ${s.map(_.toInt)}")
      assert(!s.contains("  ") && !s.contains(" \n") && !s.contains("\n "),
        s"uncollapsed ws: ${s.map(_.toInt)}")
      assert(!s.contains("\n\n\n"), "3+ newline run survived")
      assert(s == s.trim, "not trimmed")
    }
  }

  test("stripHtml is idempotent on entity-free tag soup and strips every tag") {
    val rnd = new scala.util.Random(7)
    val pool = Seq("<p>", "</p>", "<b class='x'>", "</b>", "<script>", "</script>",
      "<style type=\"y\">", "</style>", "<!--", "-->", "<a href=\"/z\">", "word",
      "42", "<", ">", " ")
    val docs = Seq.fill(300)(
      (0 until rnd.nextInt(25)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    def strip(in: Seq[String]): Seq[String] =
      in.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
        .orderBy("id").select(TextAnalysis.stripHtml(col("t"))).collect()
        .map(_.getString(0)).toSeq
    val once = strip(docs)
    assert(strip(once) === once,
      "stripHtml must be idempotent when no entities can double-decode")
    for (s <- once)
      assert(!s.matches("(?s).*<[^>]+>.*"), s"tag survived one pass: $s")
  }

  test("chunkByTokens is lossless and bounded for any (length, chunk, overlap)") {
    val rnd = new scala.util.Random(11)
    // 60 random (doc, chunk, overlap) combos across the parameter space
    val cases = Seq.fill(60) {
      val n = rnd.nextInt(120)                     // token count 0..119
      val chunk = 1 + rnd.nextInt(20)              // 1..20
      val overlap = rnd.nextInt(chunk)             // 0..chunk-1
      (n, chunk, overlap)
    }
    cases.zipWithIndex.foreach { case ((n, chunk, overlap), i) =>
      val toks = (0 until n).map(j => s"w$j")
      val df = Seq((i.toLong, toks.mkString(" "))).toDF("doc_id", "text")
      val rows = TextAnalysis.chunkByTokens(df, "doc_id", "text", chunk, overlap)
        .orderBy("chunk_id")
        .collect().map(r => (r.getAs[Long]("start_tok"),
          r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
      val step = chunk - overlap
      // every window bounded; starts on the exact step grid
      assert(rows.forall(_._2 <= chunk), s"case $i: window over chunk size")
      assert(rows.map(_._1).toSeq ===
        (0L until math.max(toks.length, 1).toLong by step.toLong).toSeq, s"case $i")
      // lossless: de-overlapped concatenation reconstructs the token stream
      // (empty text tokenizes to [""], so expect a single empty chunk there)
      val rebuilt = (rows.head._3.split(" ", -1).toSeq ++
        rows.tail.toSeq.flatMap(c => c._3.split(" ", -1).drop(overlap).toSeq))
      val expected = if (n == 0) Seq("") else toks
      assert(rebuilt === expected, s"case $i: n=$n chunk=$chunk overlap=$overlap")
    }
  }

  test("encodingAudit matches a driver-side reference counter on mixed soup") {
    val rnd = new scala.util.Random(23)
    // alphabet mixes clean ascii, allowed ws, counted controls, real
    // accents, mojibake fragments and U+FFFD — including ADJACENT defects
    // (e.g. ÃÃ©, â€â€) that exercise non-overlapping match semantics
    val pool: IndexedSeq[String] = IndexedSeq(
      "a", "Z", " ", "\t", "\n", "\u0000", "\u0007", "\u001B", "\u007F",
      "é", "ü", "Ã", "©", "¯", "â", "€", "™", "�")
    val docs = Seq.tabulate(400)(i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => pool(rnd.nextInt(pool.length))).mkString))
    // independent reference: counts via explicit scans, not regex
    def refCounts(s: String): (Long, Long, Long, Long, Long, Boolean) = {
      val cs = s.toCharArray
      val repl = cs.count(_ == '�').toLong
      val ctrl = cs.count(c => (c <= '\u0008') || c == '\u000B' || c == '\u000C' ||
        (c >= '\u000E' && c <= '\u001F') || c == '\u007F').toLong
      // non-overlapping left-to-right: Ã + [80,BF], else â€, else advance
      var i = 0; var moji = 0L
      while (i < cs.length) {
        if (i + 1 < cs.length && cs(i) == 'Ã' &&
            cs(i + 1) >= '\u0080' && cs(i + 1) <= '¿') { moji += 1; i += 2 }
        else if (i + 1 < cs.length && cs(i) == 'â' && cs(i + 1) == '€') { moji += 1; i += 2 }
        else i += 1
      }
      val nonAscii = cs.count(_ > '\u007F').toLong
      val ppm = if (cs.isEmpty) 1000000L
        else math.floor((cs.length - nonAscii).toDouble * 1000000.0 / cs.length).toLong
      (repl, ctrl, moji, nonAscii, ppm, repl + ctrl + moji > 0)
    }
    val got = TextAnalysis.encodingAudit(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    for ((id, s) <- docs)
      assert(got(id) === refCounts(s), s"doc $id: ${s.map(_.toInt).mkString(",")}")
  }
}
