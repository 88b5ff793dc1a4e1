package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the bounded-heap top-k aggregate: random scores
  * (with deliberate ties and duplicates) against a reference sort, across
  * several k values and partition counts.
  */
class TopKPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rows: Gen[List[(Long, Double, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.choose(0L, 3L)
      s <- Gen.oneOf(Gen.choose(0, 10).map(_ / 10.0), Gen.choose(-1000.0, 1000.0))
      i <- Gen.choose(0L, 50L)
    } yield (g, s, i))

  test("TopKAgg equals sort-take under ties, duplicates and k variations") {
    var seed = Seed(99L)
    (1 to 25).foreach { _ =>
      rows.apply(Gen.Parameters.default, seed).foreach { data =>
        val k = 1 + (math.abs(seed.long._1) % 7).toInt
        val df = data.toDF("g", "s", "i").repartition(3)
        val got = df.groupBy("g")
          .agg(org.apache.spark.sql.graft.TopKAgg.topk(col("s"), col("i"), k).as("top"))
          .select(col("g"), col("top"))
          .as[(Long, Seq[(Double, Long)])].collect().toMap
        val want = data.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(k)
        }
        assert(got.keySet == want.keySet)
        want.foreach { case (g, exp) => assert(got(g) == exp, s"group $g k=$k: ${got(g)} vs $exp") }
      }
      seed = seed.next
    }
  }
}
