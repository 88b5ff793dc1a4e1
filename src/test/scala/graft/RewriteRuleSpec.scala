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

  test("rewrite preserves NULL results for null elements and ragged arrays") {
    import spark.implicits._
    // With the rule active session-wide these HOF chains become
    // DotF32/NormF32; user-visible results must still be NULL exactly
    // where zip_with/transform null-padding + `acc + NULL` made them NULL.
    // Roundtrip through parquet: a pure LocalRelation is constant-folded
    // before extraOptimizations run, which would bypass the native path
    // (and parquet is also the containsNull=true shape real tables have).
    val tmp = java.nio.file.Files.createTempDirectory("rewrite-nulls").toString
    Seq(
      (0L, Seq(Some(1f), None), Seq(Some(1f), Some(2f))),             // null element
      (1L, Seq(Some(1f), Some(2f), Some(3f)), Seq(Some(1f), Some(2f))), // ragged
      (2L, Seq(Some(1f), Some(2f)), Seq(Some(3f), Some(4f)))            // clean
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val probe = df.select(VectorOps.dot(col("a"), col("b")))
    assert(anyExpr(probe)(_.isInstanceOf[DotF32]),
      s"rule must still fire on containsNull=true float arrays:\n${probe.queryExecution.optimizedPlan}")
    val out = df.select(col("id"),
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.norm(col("a")).as("n")).orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2), "null element must stay NULL")
    assert(out(1).isNullAt(1), "ragged pair must stay NULL")
    assert(out(2).getDouble(1) == 11.0 && math.abs(out(2).getDouble(2) - math.sqrt(5.0)) < 1e-12)
  }

  test("rule leaves double-array HOFs untouched") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0)).toDF("a")
      .select(VectorOps.dot(col("a"), col("a")).as("d"))
    assert(!anyExpr(df)(_.isInstanceOf[DotF32]))
    assert(df.as[Double].head() == 5.0)
  }
}
