package graft

import org.apache.spark.sql.functions._

import graft.text.Text

/** Tokenizer edge cases — SURVEY.md §7.4 traps 1–3. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t")).as[Seq[String]].head()

  test("empty string yields no tokens") { assert(tok("") == Seq()) }

  test("all punctuation yields no tokens (no phantom empty token)") {
    assert(tok("!!! ... ---") == Seq())
  }

  test("leading/trailing punctuation does not create empty tokens") {
    assert(tok("!word!") == Seq("word"))
  }

  test("case is preserved (reference is case-sensitive)") {
    assert(tok("The the THE") == Seq("The", "the", "THE"))
  }

  test("digits and unicode are separators, ASCII letters only") {
    assert(tok("abc123def") == Seq("abc", "def"))
    assert(tok("café naïve") == Seq("caf", "na", "ve"))
  }

  test("shingles: fewer tokens than n gives empty, exact n gives one") {
    val df = Seq("a b", "a b c").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s")).as[Seq[String]].collect()
    assert(df(0) == Seq())
    assert(df(1) == Seq("a b c"))
  }

  test("shingles are distinct") {
    val s = Seq("x y x y x y").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 2).as("s")).as[Seq[String]].head()
    assert(s.sorted == Seq("x y", "y x"))
  }

  test("bpeish token count: letters, digit runs, punctuation glyphs") {
    val n = Seq("ab 12 c!?").toDF("text")
      .select(Text.bpeishTokenCount(col("text")).as("n")).as[Long].head()
    assert(n == 5) // ab, 12, c, !, ?
  }
}
