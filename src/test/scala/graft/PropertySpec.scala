package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.mr.MapReduce

/** Property tests (SURVEY.md §5.3): driver-side invariants of the word
  * count semantics, plus a Spark-vs-Scala bit-equality check for the
  * portable hash. ScalaCheck generators driven directly (deterministic
  * seed) — the scalatest bridge artifact isn't available offline.
  */
class PropertySpec extends SparkSpec {

  private def forAllN[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(12345L)
    (0 until n).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private val line: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "!", "42", "--", "é"))).map(_.mkString(" "))

  private val corpus: Gen[List[String]] = Gen.listOf(line)

  test("word count distributes over concatenation of corpora") {
    forAllN(Gen.zip(corpus, corpus)) { case (a, b) =>
      val merged = MapReduce.wordCountOracle(a ++ b)
      val partwise = (MapReduce.wordCountOracle(a).toSeq ++ MapReduce.wordCountOracle(b).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(merged == partwise)
    }
  }

  test("word count is permutation-invariant") {
    forAllN(corpus) { a =>
      assert(MapReduce.wordCountOracle(a) == MapReduce.wordCountOracle(a.reverse))
    }
  }

  test("tokens are always non-empty pure-ASCII-letter runs") {
    forAllN(line) { l =>
      val toks = MapReduce.wordCountOracle(Seq(l)).keys
      assert(toks.forall(t => t.nonEmpty && t.forall(c => c.isLetter && c < 128)))
    }
  }

  /** Scala reimplementation of PortableHash.asciiPolyHash. */
  private def polyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)

  test("PortableHash on Spark equals the driver-side fold bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gen = Gen.listOfN(64, Gen.alphaStr.map(_.take(20)))
    val samples = (gen(Gen.Parameters.default, Seed(7L)).getOrElse(Nil) :+ "" :+ "a" :+ ("z" * 100)).distinct
    val got = samples.toDF("s")
      .select(col("s"), graft.functions.PortableHash.asciiPolyHash(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach(s => assert(got(s) == polyHash(s), s"mismatch for '$s'"))
  }
}
