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

  test("the 32x exclusion list is FROZEN: exactly the 12 audited pair-family entries") {
    // The exclusions are legitimately output-quadratic on the replica
    // corpus (SCALING.md), but the list must not silently grow — a 13th
    // exclusion shrinks the 32x guard's coverage and must be a reviewed
    // edit to BOTH Bench.Excluded32x and this literal (round-13 verdict
    // item 3). Every entry needs a named reason and must be a real
    // catalog query; nothing else may be excluded.
    val audited = Set(
      "q19_ngram_jaccard", "q20_embedding_neardup", "q40_srp_neardup",
      "q46_dup_clusters", "q55_dup_clusters_star", "q65_triangles",
      "q72_containment", "q108_semantic_dedup", "q149_span_removal",
      "q163_semantic_trained", "q186_text_index", "q207_leakage_safe_split")
    assert(Bench.Excluded32x.keySet == audited,
      s"32x exclusion drift: +${Bench.Excluded32x.keySet -- audited} -${audited -- Bench.Excluded32x.keySet}")
    Bench.Excluded32x.foreach { case (name, reason) =>
      assert(SparkEntry.queries.contains(name), s"excluded name $name is not a catalog query")
      assert(reason.trim.length > 20, s"$name: exclusion must carry a substantive named reason")
    }
    // and the capped companions that give each excluded family its
    // runnable 100 TB shape must themselves be IN the sweep
    Seq("q90_jaccard_prefix", "q91_dup_clusters_prefix", "q98_srp_params",
        "q233_dup_clusters_capped", "q234_containment_capped").foreach { twin =>
      assert(SparkEntry.queries.contains(twin) && !Bench.Excluded32x.contains(twin),
        s"capacity-aware twin $twin must exist and stay in the 32x sweep")
    }
  }

  test("a real query times as a positive, above-floor measurement") {
    val r = Bench.timeOnce(spark, sf("sf0.001"), "real",
      (s, dir) => s.read.parquet(s"$dir/documents.parquet")
        .groupBy("lang").count())
    assert(r.exists(_ >= Bench.FloorSec), s"real query should time above floor, got $r")
  }
}
