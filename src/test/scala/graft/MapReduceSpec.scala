package graft

import graft.mr.MapReduce

/** t1-shape smoke: the generic MR word count vs the in-driver Scala oracle
  * (port of the reference's verify.py:6-15) on real test data.
  */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lines: Seq[String] =
    graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select("text").as[String].collect().toSeq

  test("wordCount matches the verify.py-shaped oracle on sf0.001 documents") {
    val got = MapReduce.wordCount(lines.toDS(), numBuckets = 4).collect().toMap
    val want = MapReduce.wordCountOracle(lines)
    assert(got == want)
  }

  test("wordCount respects numBuckets for output layout") {
    val ds = MapReduce.wordCount(lines.take(50).toDS(), numBuckets = 3)
    assert(ds.rdd.getNumPartitions == 3)
  }

  test("runAggregating (map-side combine) agrees with run (shuffle-all)") {
    val a = MapReduce.wordCount(lines.toDS(), 4).collect().toMap
    val b = MapReduce.runAggregating[String, Long](
      lines.toDS(),
      l => l.replaceAll("[^A-Za-z]", " ").split("\\s+").toSeq.filter(_.nonEmpty).map(w => (w, 1L)),
      _ + _).collect().toMap
    assert(a == b)
  }

  test("oracle example: tokenizer fidelity on crafted input") {
    val want = Map("It" -> 1L, "s" -> 1L, "a" -> 2L, "test" -> 2L, "A" -> 1L)
    assert(MapReduce.wordCountOracle(Seq("It's a test!", "A test a")) == want)
  }
}
