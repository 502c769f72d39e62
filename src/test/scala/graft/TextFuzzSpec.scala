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
}
