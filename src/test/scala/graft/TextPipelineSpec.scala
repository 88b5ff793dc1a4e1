package graft

import java.nio.file.Files

import graft.mr.MapReduce
import graft.sources.TextPipeline

/** End-to-end file pipeline: glob of .txt files → word count → sorted
  * bucketed text sink → read-back equals the verify.py-shaped oracle.
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dirs: (String, String) = {
    val in = Files.createTempDirectory("graft-txt-in")
    val texts = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select("text").as[String].collect()
    texts.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(in.resolve(s"part$i.txt"), chunk.mkString("\n").getBytes("UTF-8"))
    }
    (in.toString, Files.createTempDirectory("graft-txt-out").toString)
  }

  test("text glob -> word count -> sorted text sink round-trips against the oracle") {
    val (in, out) = dirs
    TextPipeline.run(spark, s"$in/*.txt", out, numBuckets = 3)
    val got = TextPipeline.readResult(spark, out).as[(String, Long)].collect().toMap
    val lines = spark.read.textFile(s"$in/*.txt").collect().toSeq
    assert(got == MapReduce.wordCountOracle(lines))
  }

  test("sink produces numBuckets files, each internally sorted") {
    val (in, out) = dirs
    TextPipeline.run(spark, s"$in/*.txt", out, numBuckets = 3)
    val parts = new java.io.File(out).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 3)
    parts.foreach { f =>
      val words = scala.io.Source.fromFile(f).getLines().map(_.split(" ")(0)).toSeq
      assert(words == words.sorted, s"${f.getName} not sorted")
    }
  }
}
