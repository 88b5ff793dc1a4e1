package graft

import graft.queries.Queries

/** Smoke for the whole catalog: every declared query runs on sf0.001,
  * returns rows, and every oracle-covered query declares identical column
  * names to its SQL (the driver hashes columns by sorted name — a rename
  * on either side silently fails the gate; SURVEY.md §5).
  */
class QueriesSpec extends SparkSpec {

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has a DuckDB oracle") {
    assert(Queries.all.keySet -- Queries.oracles.keySet == Set.empty)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
