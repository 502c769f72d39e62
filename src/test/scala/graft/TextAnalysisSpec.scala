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

  test("fingerprint is stable under whitespace and case noise") {
    val df = Seq((1L, "Some  Document\tText "), (2L, "some document text")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }
}
