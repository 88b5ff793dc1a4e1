package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native expressions as SQL functions, so
  * `spark.sql("SELECT dot_f32(a, b) ...")` works.
  *
  * Two entry points:
  *  - config `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (session-creation time), or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => RewriteVectorHofs)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  /** Folds argument `i` of `fn` to an Int, raising the same
    * AnalysisException classes Spark's own functions use instead of an
    * opaque ClassCastException on e.g. `kmv_sketch(h, CAST(2 AS BIGINT))`
    * or a non-literal k.
    */
  private def litInt(es: Seq[Expression], i: Int, fn: String, param: String): Int = {
    val e = es(i)
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
    e.eval() match {
      case n: Int => n
      case n: java.lang.Number if n.longValue().isValidInt => n.intValue()
      case _ =>
        throw new AnalysisException("UNEXPECTED_INPUT_TYPE",
          Map("paramIndex" -> s"${i + 1}", "functionName" -> s"`$fn`",
            "requiredType" -> "\"INT\"", "inputSql" -> s"\"${e.sql}\"",
            "inputType" -> s"\"${e.dataType.sql}\""))
    }
  }

  private def litBool(es: Seq[Expression], i: Int, fn: String, param: String): Boolean = {
    val e = es(i)
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"BOOLEAN\""))
    e.eval() match {
      case b: Boolean => b
      case _ =>
        throw new AnalysisException("UNEXPECTED_INPUT_TYPE",
          Map("paramIndex" -> s"${i + 1}", "functionName" -> s"`$fn`",
            "requiredType" -> "\"BOOLEAN\"", "inputSql" -> s"\"${e.sql}\"",
            "inputType" -> s"\"${e.dataType.sql}\""))
    }
  }

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("dot_f32",
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (es: Seq[Expression]) => DotF32(es(0), es(1))),
    ("norm_f32",
      new ExpressionInfo(classOf[NormF32].getName, "norm_f32"),
      (es: Seq[Expression]) => NormF32(es(0))),
    ("minhash_agg",
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (es: Seq[Expression]) => MinHashAgg(es(0),
        litInt(es, 1, "minhash_agg", "numHashes"), 0, 0).toAggregateExpression()),
    ("tokenize_words",
      new ExpressionInfo(classOf[TokenizeWords].getName, "tokenize_words"),
      (es: Seq[Expression]) => TokenizeWords(es(0))),
    ("token_shingles",
      new ExpressionInfo(classOf[TokenShingles].getName, "token_shingles"),
      (es: Seq[Expression]) => TokenShingles(es(0),
        litInt(es, 1, "token_shingles", "n"),
        litBool(es, 2, "token_shingles", "hashOutput"))),
    ("topk_agg",
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      (es: Seq[Expression]) => TopKAgg(es(0), es(1),
        litInt(es, 2, "topk_agg", "k")).toAggregateExpression()),
    ("kmv_sketch",
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_sketch"),
      (es: Seq[Expression]) => KmvAgg(es(0),
        litInt(es, 1, "kmv_sketch", "k")).toAggregateExpression()),
    ("hll_sketch",
      new ExpressionInfo(classOf[HllAgg].getName, "hll_sketch"),
      (es: Seq[Expression]) => HllAgg(es(0),
        litInt(es, 1, "hll_sketch", "p")).toAggregateExpression()))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
