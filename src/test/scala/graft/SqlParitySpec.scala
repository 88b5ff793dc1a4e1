package graft

import org.apache.spark.sql.DataFrame

/** The engine is equally usable through `spark.sql(...)`: register the
  * test tables as temp views and check a few catalog queries expressed in
  * Spark SQL produce identical results to their DataFrame builders.
  */
class SqlParitySpec extends SparkSpec {

  private lazy val views: Unit =
    graft.core.Tables.names.foreach { n =>
      graft.core.Tables(spark, sf("sf0.001"), n).createOrReplaceTempView(n)
    }

  /** Row-wise equality with relative tolerance on doubles — different
    * plan shapes (SQL vs DataFrame) may legally accumulate float sums in
    * different orders, giving ulp-level differences.
    */
  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length == rb.length)
    ra.zip(rb).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (da: Double, db: Double) =>
            assert(math.abs(da - db) <= 1e-9 * math.max(1.0, math.abs(db)), s"col $i: $da vs $db")
          case (va, vb) => assert(va == vb, s"col $i: $va vs $vb")
        }
      }
    }
  }

  test("q07 pricing summary via spark.sql equals the DataFrame builder") {
    views
    same(
      spark.sql("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      graft.queries.QueriesRelational.q07_pricing_summary(spark, sf("sf0.001")))
  }

  test("q08 nation revenue via spark.sql equals the DataFrame builder") {
    views
    same(
      spark.sql("""
        SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      graft.queries.QueriesRelational.q08_nation_revenue(spark, sf("sf0.001")))
  }

  test("q12 running total via spark.sql equals the DataFrame builder") {
    views
    same(
      spark.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""),
      graft.queries.QueriesRelational.q12_running_total(spark, sf("sf0.001")))
  }

  test("word count via spark.sql with the registered native function") {
    views
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_words",
      es => org.apache.spark.sql.graft.TokenizeWords(es.head),
      "built-in")
    same(
      spark.sql("""
        SELECT word, count(*) AS cnt
        FROM (SELECT explode(tokenize_words(text)) AS word FROM documents)
        GROUP BY word ORDER BY word"""),
      graft.queries.QueriesText.q01_wordcount(spark, sf("sf0.001")))
  }
  test("q185 temporal drift via spark.sql equals the DataFrame builder") {
    views
    same(
      spark.sql("""
        WITH ev AS (SELECT CAST(floor(CAST(CAST(ts AS TIMESTAMP) AS LONG) / 86400) AS BIGINT) AS day,
                           event_type FROM events),
        cnt AS (SELECT day, event_type, count(*) AS c FROM ev GROUP BY day, event_type),
        types AS (SELECT DISTINCT event_type FROM cnt),
        kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM types),
        grid AS (SELECT d.day, t.event_type FROM (SELECT DISTINCT day FROM cnt) d CROSS JOIN types t),
        tot AS (SELECT day, sum(c) AS n FROM cnt GROUP BY day),
        p AS (SELECT g.day, g.event_type, tot.n, (coalesce(cnt.c, 0) + 1.0) / (tot.n + kk.k) AS p
              FROM grid g LEFT JOIN cnt ON cnt.day = g.day AND cnt.event_type = g.event_type
              JOIN tot ON tot.day = g.day CROSS JOIN kk),
        pr AS (SELECT day + 1 AS day, event_type, p AS q FROM p),
        j AS (SELECT p.day, p.n, p.p, pr.q
              FROM p JOIN pr ON pr.day = p.day AND pr.event_type = p.event_type),
        agg AS (SELECT day, CAST(min(n) AS BIGINT) AS n_events,
                       round(sum((p - q) * ln(p / q)), 6) AS psi FROM j GROUP BY day)
        SELECT day, n_events, psi,
               CASE WHEN psi > 0.2 THEN 'drift'
                    WHEN psi > 0.1 THEN 'moderate' ELSE 'stable' END AS verdict
        FROM agg ORDER BY day"""),
      graft.queries.QueriesAnalytics.q185_temporal_drift(spark, sf("sf0.001")))
  }
}
