package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, Text}

/** BPE trainer: exact-verified against the hand-computed classic fixture
  * (the hug/pug/pun/bun corpus of the Sennrich-style walkthrough), greedy
  * overlap semantics, and corpus-scale determinism.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    ("hug", 5L), ("pug", 2L), ("pun", 6L), ("bun", 4L), ("hugs", 1L))

  test("first three merges match the hand computation") {
    // pair counts round 1: (u,n)=10, (u,g)=8, (h,u)=6, (p,u)=2, (b,u)=4?
    // no — (b,u)=4, (g,s)=1, (p,u)=2+6=8 ties (u,g)=8; tie-break (p,u) vs
    // (u,g): 'p' < 'u' so (p,u) would win a tie — but (u,n)=10 wins round
    // 1 outright. Round 2: pun→p un kills (p,u)'s 6, leaving (p,u)=2,
    // (u,g)=8 → merge (u,g). Round 3: (h,ug)=6 ties (p,un)=6 → 'h' < 'p'.
    val merges = Bpe.train(fixture.toDF("word", "freq"), rounds = 3)
    assert(merges == Seq(("u", "n"), ("u", "g"), ("h", "ug")))
  }

  test("greedy left-to-right overlap: aaaa + (a,a) -> [aa, aa]; aaa -> [aa, a]") {
    val df = Seq("aaaa", "aaa").toDF("w")
      .select(col("w"), Bpe.applyMerge(Bpe.initialSymbols(col("w")), "a", "a").as("m"))
    val out = df.as[(String, Seq[String])].collect().toMap
    assert(out("aaaa") == Seq("aa", "aa"))
    assert(out("aaa") == Seq("aa", "a"))
  }

  test("encode applies the learned merges in order") {
    val merges = Seq(("u", "n"), ("u", "g"), ("h", "ug"))
    val out = Seq("hugging", "unpug")
      .toDF("w").select(Bpe.encode(Bpe.initialSymbols(col("w")), merges).as("m"))
      .as[Seq[String]].collect()
    // hugging: chars h u g g i n g → (u,n) no adjacent un → h ug g i n g
    //          → (h,ug) → hug g i n g
    assert(out(0) == Seq("hug", "g", "i", "n", "g"))
    // unpug: u n p u g → un p u g → un p ug
    assert(out(1) == Seq("un", "p", "ug"))
  }

  test("pure count tie at round 1 breaks on (a, b) lexicographically") {
    // (x,y) = 2 and (a,b) = 2 tie on count; 'a' < 'x' so (a,b) must win.
    // Pins the driver-side trainer's argmax order against the documented
    // (cnt DESC, a, b) contract the distributed loop used.
    val merges = Bpe.train(Seq(("xy", 2L), ("ab", 2L)).toDF("word", "freq"), rounds = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("applyMergeLocal mirrors the column applyMerge overlap rule") {
    assert(Bpe.applyMergeLocal(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMergeLocal(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMergeLocal(Array("h", "u", "g"), "u", "g").toSeq == Seq("h", "ug"))
  }

  test("trainer stops when no pair remains") {
    val merges = Bpe.train(Seq(("ab", 3L)).toDF("word", "freq"), rounds = 10)
    assert(merges == Seq(("a", "b"))) // after merging, every word is one symbol
  }

  test("deterministic on the real corpus and vocabulary-driven") {
    val vocab = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val m1 = Bpe.train(vocab, rounds = 5)
    val m2 = Bpe.train(vocab, rounds = 5)
    assert(m1 == m2)
    assert(m1.size == 5)
    assert(m1.distinct.size == 5) // 5 distinct merges
    assert(m1.forall(p => p._1.nonEmpty && p._2.nonEmpty))
  }
}
