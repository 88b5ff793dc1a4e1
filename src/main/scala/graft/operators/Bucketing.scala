package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-partition fact tables on their join key so
  * repeated joins/aggregations on that key skip the shuffle entirely —
  * the static cousin of repartition(), and the main lever for co-located
  * joins at 100 TB (both sides bucketed by the same key and count ⇒
  * SortMergeJoin with zero Exchange).
  */
object Bucketing {
  /** Write `df` as a bucketed, sorted parquet table — managed (warehouse
    * dir) by default, or EXTERNAL at `path` so callers that cannot rely
    * on the session's warehouse location (the catalog queries, which
    * run under whatever JVM the driver launches) control the files.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Number of shuffle exchanges in the final physical plan of `df`.
    * Descends into AQE query stages (materialized shuffles become leaf
    * QueryStageExec nodes that plain collect() would miss).
    */
  def shuffleExchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // Force execution so AQE finalizes the plan it actually ran.
    df.write.format("noop").mode("overwrite").save()
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}
