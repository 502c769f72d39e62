package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenize

class TokenizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeTrain learns the classic merge sequence with deterministic ties") {
    // word counts: hug×10 pug×5 pun×12 bun×4 hugs×5 → round-1 pair counts
    // (u,g)=20 (h,u)=15 (p,u)=17 (u,n)=16 (b,u)=4 (g,s)=5
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Tokenize.bpeTrain(df, rounds = 3)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_n"))).toSeq
    assert(merges === Seq(
      (0L, "u", "g", "ug", 20L),   // the top raw pair
      (1L, "u", "n", "un", 16L),   // (h,ug)=15 loses to (u,n)=16
      (2L, "h", "ug", "hug", 15L)))
  }

  test("bpeTrain merges greedily left-to-right and breaks ties lexically") {
    // "aaa": fold gives [aa, a] — the fused symbol does not chain-fuse
    val rep = Seq.fill(3)((1L, "aaa")).toDF("doc_id", "text")
    val m = Tokenize.bpeTrain(rep, rounds = 1).collect()
    assert(m.length === 1 &&
      m.head.getAs[String]("merged") === "aa" &&
      m.head.getAs[Long]("pair_n") === 6L) // two (a,a) adjacencies × 3 words
    // tie at count 2: (a,b) vs (c,d) → lexicographically smallest wins
    val tie = Seq((1L, "ab"), (2L, "ab"), (3L, "cd"), (4L, "cd"))
      .toDF("doc_id", "text")
    val t = Tokenize.bpeTrain(tie, rounds = 1).collect()
    assert(t.head.getAs[String]("left") === "a" &&
      t.head.getAs[String]("right") === "b")
  }

  test("bpeEncode applies the learned merges in order, positions preserved") {
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val train = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Tokenize.bpeTrain(train, rounds = 3) // ug, un, hug
    val out = Tokenize.bpeEncode(
        Seq((1L, "hug pun hugs"), (2L, "bun pug zap")).toDF("doc_id", "text"),
        merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[String]]("subwords"), r.getAs[Long]("n_subwords")))).toMap
    assert(out(1L) === ((Seq("hug", "p", "un", "hug", "s"), 5L)))
    // unseen word "zap" falls back to characters
    assert(out(2L) === ((Seq("b", "un", "p", "ug", "z", "a", "p"), 7L)))
    // an empty merge table encodes to raw characters
    val raw = Tokenize.bpeEncode(
        Seq((3L, "ab")).toDF("doc_id", "text"),
        spark.emptyDataset[(Long, String, String, String, Long)]
          .toDF("round", "left", "right", "merged", "pair_n"))
      .head()
    assert(raw.getAs[Seq[String]]("subwords") === Seq("a", "b"))
  }

  test("bpeTrain stops early when no pair repeats") {
    val df = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    assert(Tokenize.bpeTrain(df, rounds = 5).count() === 0L)
  }
}
