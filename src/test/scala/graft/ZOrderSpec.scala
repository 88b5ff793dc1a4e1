package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits exactly (vs a Scala reference)") {
    def ref(a: Int, b: Int, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
      }.reduce(_ | _)
    val rng = new scala.util.Random(7)
    val cases = Seq((0, 0), (255, 255), (255, 0), (0, 255), (1, 2)) ++
      Seq.fill(50)((rng.nextInt(256), rng.nextInt(256)))
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b"), 8).cast("long").as("z"))
    df.as[(Int, Int, Long)].collect().foreach { case (a, b, z) =>
      assert(z == ref(a, b, 8), s"zvalue($a, $b) = $z, expected ${ref(a, b, 8)}")
    }
  }

  test("zvalue is a bijection on the 8x8-bit grid") {
    val grid = for (a <- 0 until 64; b <- 0 until 64) yield (a, b)
    val n = grid.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"), 6).as("z"))
      .agg(countDistinct("z")).as[Long].head()
    assert(n == 64L * 64L, "interleaved values must be distinct")
  }

  test("z-ordered files bound BOTH dimensions; a one-column sort bounds only its own") {
    // The measurable claim behind q111: per-file (max-min) spans. With a
    // z-ordered layout every file covers a bounded tile in (pb, sb);
    // with a pb-sorted layout the sb span per file stays ~global.
    // Synthetic independent uniform dimensions (the fixture's own key
    // columns are correlated and low-cardinality at sf0.001).
    val li = spark.range(100000).toDF("id")
      .withColumn("pb", pmod(hash(col("id")), lit(256)).cast("int"))
      .withColumn("sb", pmod(hash(col("id") + 1000000), lit(256)).cast("int"))
      .select("pb", "sb")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zspec_z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_zspec_s").toString
    ZOrder.writeZOrdered(li, "pb", "sb", bits = 8, numFiles = 16, out = zDir)
    li.repartitionByRange(16, col("pb")).sortWithinPartitions("pb")
      .write.mode("overwrite").parquet(sDir)

    def spans(dir: String): Seq[(Int, Int)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(max("pb") - min("pb"), max("sb") - min("sb"))
            .as[(Int, Int)].head()
          r
        }
    val zSpans = spans(zDir)
    val sSpans = spans(sDir)
    assert(zSpans.size >= 8 && sSpans.size >= 8, "expected multiple files per layout")
    def avg(xs: Seq[Int]) = xs.sum.toDouble / xs.size
    val (zPb, zSb) = (avg(zSpans.map(_._1)), avg(zSpans.map(_._2)))
    val (sPb, sSb) = (avg(sSpans.map(_._1)), avg(sSpans.map(_._2)))
    // one-column sort: pb tightly bounded, sb unbounded (~255)
    assert(sPb < 64, s"pb-sorted layout should bound pb (avg span $sPb)")
    assert(sSb > 192, s"pb-sorted layout cannot bound sb (avg span $sSb)")
    // z-order: BOTH dimensions bounded well below the global 255 span
    assert(zPb < 160 && zSb < 160,
      s"z-ordered files must bound both dims (avg spans pb=$zPb sb=$zSb)")
    assert(zSb < sSb / 2,
      s"z-order must at least halve the non-leading dim's span ($zSb vs $sSb)")
  }

}
