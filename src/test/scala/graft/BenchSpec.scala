package graft

import org.apache.spark.sql.functions._

/** Contracts of the bench harness's timing primitive: a failure is a
  * FAILURE, never a timing. Round 10's bench_quiet.json was poisoned by
  * 37 four-millisecond "measurements" because timeOnce caught the
  * Throwable and returned the elapsed time anyway — one broken sweep
  * then understated the committed quiet total by ~21 s.
  */
class BenchSpec extends SparkSpec {

  test("a throwing query is reported failed, not timed") {
    val r = Bench.timeOnce(spark, sf("sf0.001"), "boom",
      (_, _) => sys.error("simulated query failure"))
    assert(r.isEmpty, s"a throwing query must yield None, got $r")
  }

  test("a query that dies at plan time (missing input) is failed, not timed") {
    val r = Bench.timeOnce(spark, "/nonexistent-sf-dir", "noinput",
      (s, dir) => s.read.parquet(s"$dir/documents.parquet"))
    assert(r.isEmpty)
  }

  test("an impossibly fast run is rejected by the floor") {
    // an empty pre-materialized frame writes to noop in ~a millisecond —
    // physically impossible for any real catalog query, so the floor
    // must reject it rather than record it
    val empty = spark.range(1).filter(lit(false)).toDF()
    val r = Bench.timeOnce(spark, sf("sf0.001"), "fast", (_, _) => empty)
    r.foreach(t => assert(t >= Bench.FloorSec,
      s"sub-floor $t accepted as a timing"))
  }

  test("a real query times as a positive, above-floor measurement") {
    val r = Bench.timeOnce(spark, sf("sf0.001"), "real",
      (s, dir) => s.read.parquet(s"$dir/documents.parquet")
        .groupBy("lang").count())
    assert(r.exists(_ >= Bench.FloorSec), s"real query should time above floor, got $r")
  }
}
