package graft

import org.apache.spark.sql.functions._

import graft.text.Text

/** The native shingle expression must equal the HOF formulation exactly
  * (same contents, same order) on real data and edge cases.
  */
class TokenShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles equal HOF shingles on all documents (n=3,5)") {
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")
    Seq(3, 5).foreach { n =>
      val diff = docs.select(
        Text.shingles(Text.tokens(col("text")), n).as("a"),
        Text.shinglesHof(Text.tokens(col("text")), n).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"n=$n mismatch")
    }
  }

  test("edge cases: short arrays, exact n, repeats keep first-occurrence order") {
    def nat(toks: Seq[String], n: Int): Seq[String] =
      Seq(toks).toDF("t").select(Text.shingles(col("t"), n).as("s")).as[Seq[String]].head()
    assert(nat(Seq(), 2) == Seq())
    assert(nat(Seq("a"), 2) == Seq())
    assert(nat(Seq("a", "b"), 2) == Seq("a b"))
    assert(nat(Seq("x", "y", "x", "y", "x"), 2) == Seq("x y", "y x"))
  }

  test("multiplicity variant keeps every position") {
    val all = Seq(Seq("x", "y", "x", "y")).toDF("t")
      .select(Text.shinglesAll(col("t"), 2).as("s")).as[Seq[String]].head()
    assert(all == Seq("x y", "y x", "x y"))
  }

  test("native window hashes equal the HOF spelling on all documents (w=3,10)") {
    import graft.functions.PortableHash
    import org.apache.spark.sql.graft.WindowHashes
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")
    Seq(3, 10).foreach { w =>
      val t = Text.tokens(col("text"))
      val th = transform(t, tk => PortableHash.asciiPolyHash(tk))
      val hof = when(size(th) >= w,
        transform(sequence(lit(0), size(th) - w),
          i => aggregate(slice(th, i + 1, lit(w)), lit(0L),
            (acc, x) => (acc * 31 + x) % PortableHash.Mod)))
        .otherwise(array().cast("array<bigint>"))
      val diff = docs.select(WindowHashes.windowHashes(t, w).as("a"), hof.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"w=$w mismatch")
    }
  }

  test("window hash edge cases: short arrays, exact w") {
    import org.apache.spark.sql.graft.WindowHashes
    def nat(toks: Seq[String], w: Int): Seq[Long] =
      Seq(toks).toDF("t").select(WindowHashes.windowHashes(col("t"), w).as("h"))
        .as[Seq[Long]].head()
    assert(nat(Seq(), 2) == Seq())
    assert(nat(Seq("a"), 2) == Seq())
    assert(nat(Seq("ab"), 1).size == 1)
    assert(nat(Seq("a", "b"), 2).size == 1)
    // identical windows hash identically, distinct windows differ
    val h = nat(Seq("x", "y", "x", "y"), 2)
    assert(h.size == 3 && h(0) == h(2) && h(0) != h(1))
  }
}
