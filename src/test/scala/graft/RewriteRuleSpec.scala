package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotF32, NormF32, RewriteVectorHofs}

import graft.functions.VectorOps

/** The optimizer rule must rewrite the declarative HOF spellings into the
  * native expressions without changing a single bit of output.
  */
class RewriteRuleSpec extends SparkSpec {

  override lazy val spark = {
    val s = SparkSpec.session
    if (!s.experimental.extraOptimizations.contains(RewriteVectorHofs))
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ RewriteVectorHofs
    s
  }

  private lazy val emb = graft.core.Tables(spark, sf("sf0.001"), "embeddings")

  private def anyExpr(df: org.apache.spark.sql.DataFrame)(p: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean =
    df.queryExecution.optimizedPlan.collect { case n => n.expressions }.flatten
      .exists(_.exists(p))

  test("HOF dot over float arrays is rewritten to DotF32") {
    val df = emb.limit(10).select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
    assert(anyExpr(df)(_.isInstanceOf[DotF32]), s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
  }

  test("HOF norm over float arrays is rewritten to NormF32") {
    val df = emb.limit(10).select(VectorOps.norm(col("embedding")).as("n"))
    assert(anyExpr(df)(_.isInstanceOf[NormF32]), s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
  }

  test("rewrite does not change results (bit-identical)") {
    import spark.implicits._
    val viaHof = emb.select(col("vec_id"),
      VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(viaHof.values.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("rule leaves double-array HOFs untouched") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0)).toDF("a")
      .select(VectorOps.dot(col("a"), col("a")).as("d"))
    assert(!anyExpr(df)(_.isInstanceOf[DotF32]))
    assert(df.as[Double].head() == 5.0)
  }
}
