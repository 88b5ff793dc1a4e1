package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interchange-format roundtrips: the documents table written to and read
  * back from CSV and JSON-lines — the two formats raw corpora actually
  * arrive in — then aggregated. A catalog user can therefore land data in
  * csv/jsonl/parquet/orc and run the same queries; the oracle checks the
  * roundtrip is lossless (the aggregate over the read-back equals the
  * aggregate over the source table). Reads use an explicit schema: at
  * 100 TB, schema inference is a full extra pass over the corpus.
  * Malformed-record semantics (PERMISSIVE/DROPMALFORMED/FAILFAST — the
  * reference's A8 skip rule generalized to these sources) are spec'd in
  * SourcesRobustnessSpec.
  */
object QueriesSources {
  private val DocsSchema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  /** Side-effect output root, unique per (input dir, JVM): the full dir
    * string is SHA-256'd (no 32-bit hashCode collisions across dirs) and
    * the PID is appended so two concurrent runs over the same sf dir
    * (bench + verify) cannot race overwrite-vs-read on one path.
    */
  private[queries] def tmp(prefix: String, dir: String) = {
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val pid = java.lang.ProcessHandle.current().pid()
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"$prefix${dirKey}_$pid").getAbsolutePath
  }

  /** CSV roundtrip: header + quoted fields out, explicit-schema read
    * back, per-lang aggregate including the payload character total —
    * any mangled row would shift the sums and fail the oracle hash.
    * multiLine on the read: document text containing a newline is
    * legally written as a quoted multi-line field, and the default
    * line-split reader would shred it into malformed rows. (Cost note:
    * multiLine disables intra-file split parallelism — at 100 TB,
    * either keep files small or strip newlines at write time.)
    */
  def q86_csv_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_q86_csv_", dir)
    Tables(s, dir, "documents").write.mode("overwrite")
      .option("header", "true").csv(out)
    s.read.schema(DocsSchema).option("header", "true")
      .option("multiLine", "true").csv(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(length(col("text"))).as("total_text_len"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
      .orderBy("lang")
  }

  val q86Sql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents GROUP BY lang ORDER BY lang"""

  /** JSON-lines roundtrip: one JSON object per line out (the lingua
    * franca of web-scale corpus drops), explicit-schema read back,
    * per-source aggregate. Same losslessness contract as q86.
    */
  def q87_jsonl_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_q87_jsonl_", dir)
    Tables(s, dir, "documents").write.mode("overwrite").json(out)
    s.read.schema(DocsSchema).json(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(length(col("text"))).as("total_text_len"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
      .orderBy("source")
  }

  val q87Sql: String =
    """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents GROUP BY source ORDER BY source"""

  /** Schema evolution across ingestion generations: an old batch written
    * WITHOUT a column and a new batch written WITH it, read back as one
    * table via mergeSchema — the v1/v2 drop problem every long-lived
    * corpus hits. Old rows surface the new column as NULL (never a read
    * failure); the aggregate accounts for exactly which generation each
    * row came from. Production note: mergeSchema costs a footer read
    * per file at planning — at 100 TB, pin the unified schema in a
    * catalog/metastore instead and let the scan apply it for free; the
    * READ semantics (absent column → NULL) are identical either way.
    */
  def q95_schema_evolution(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_q95_evo_", dir)
    val base = Tables(s, dir, "documents")
    base.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/gen=v1")
    base.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("n_chars") >= 200).as("is_long"))
      .write.mode("overwrite").parquet(s"$out/gen=v2")
    s.read.option("mergeSchema", "true").parquet(s"$out/gen=v1", s"$out/gen=v2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_long").isNull.cast("long")).as("n_v1_rows"),
        sum(when(col("is_long"), 1L).otherwise(0L)).as("n_long_v2"),
        sum("n_chars").as("total_chars"))
      .orderBy("lang")
  }

  val q95Sql: String =
    """WITH unioned AS (
  SELECT doc_id, lang, n_chars, CAST(NULL AS BOOLEAN) AS is_long
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, lang, n_chars, n_chars >= 200 AS is_long
  FROM documents WHERE doc_id % 2 <> 0)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN is_long IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1_rows,
       CAST(sum(CASE WHEN is_long THEN 1 ELSE 0 END) AS BIGINT) AS n_long_v2,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM unioned GROUP BY lang ORDER BY lang"""

  /** Z-order layout roundtrip: lineitem rewritten clustered along the
    * Morton curve of (partkey bucket, suppkey bucket), then scanned with
    * a predicate on BOTH dimensions. The answer is layout-invariant (the
    * oracle reads the raw table), so the hash check proves the rewrite
    * moved every row intact; what the layout buys — tight per-file
    * min/max on BOTH bucket columns, vs a one-column sort that bounds
    * only its leading column — is measured in ZOrderSpec, and the
    * dimension predicates still reach the read-back scan as
    * PushedFilters (plan-asserted). At 100 TB the rewrite is the
    * one-off OPTIMIZE pass; every multi-dimension point/range query
    * after it prunes files by footer stats alone.
    */
  def q111_zorder_scan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    val out = tmp("graft_q111_z_", dir)
    // partkey/orderkey buckets: both dimensions span their bucket range
    // at every sf (suppkey does not — 10 suppliers at sf0.001)
    val li = Tables(s, dir, "lineitem")
      .withColumn("pb", pmod(col("l_partkey"), lit(256)).cast("int"))
      .withColumn("ob", pmod(col("l_orderkey"), lit(256)).cast("int"))
    ZOrder.writeZOrdered(li, "pb", "ob", bits = 8, numFiles = 32, out)
    s.read.parquet(out)
      .filter(col("pb").between(16, 47) && col("ob").between(16, 47))
      .groupBy(col("pb").cast("long").as("pb"))
      .agg(count(lit(1)).as("n_rows"),
        // exact integer cents: a raw double sum can land a 1-ulp apart
        // across engines and straddle the gate's 6-sig-digit rounding
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"),
        min("l_orderkey").as("min_orderkey"),
        max("l_orderkey").as("max_orderkey"))
      .orderBy("pb")
  }

  /** Bucketed co-located join: orders and customer pre-bucketed on the
    * join key (8 buckets, sorted) as managed tables, then joined WITHOUT
    * a shuffle on either side — the static layout that makes repeated
    * fact⋈fact joins affordable at 100 TB (bucket co-location replaces
    * the per-query Exchange; BucketingSpec + PlanAssertionsSpec assert
    * the join runs with only the final aggregation's shuffle). The
    * result is layout-invariant, so the oracle joining the raw tables
    * proves the bucketed rewrite moved every row intact. Table names
    * carry the dir digest + PID (same isolation rule as tmp()).
    */
  def q116_bucketed_join(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bucketing
    val root = tmp("graft_q116_", dir)
    val suffix = root.split('/').last.stripPrefix("graft_q116_") // dirdigest_pid
    val (to, tc) = (s"graft_q116_o_$suffix", s"graft_q116_c_$suffix")
    Bucketing.writeBucketed(
      Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      to, "o_custkey", 8, Some(s"$root/o"))
    Bucketing.writeBucketed(
      Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
      tc, "c_custkey", 8, Some(s"$root/c"))
    s.table(to).join(s.table(tc), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("nation")
  }

  val q116Sql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY nation"""

  val q111Sql: String =
    """SELECT CAST(l_partkey % 256 AS BIGINT) AS pb, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey
FROM lineitem
WHERE (l_partkey % 256) BETWEEN 16 AND 47 AND (l_orderkey % 256) BETWEEN 16 AND 47
GROUP BY 1 ORDER BY pb"""

  /** Small-file compaction planner — the Delta/Iceberg OPTIMIZE shape:
    * given a file inventory (here each document stands in for one file,
    * partitioned by lang, sized by its byte length), pack the
    * small files (< 8 KiB) of each partition into merge bins of ~4 KiB
    * with the DISTRIBUTED bin rule — cumulative size BEFORE the file,
    * integer-divided by the target — instead of sequential first-fit.
    * Each bin overshoots the target by at most one file, every bin is a
    * contiguous id range (one read stream per merge task), and the rule
    * is a pure window expression, so planning 100 TB = a window over
    * the metadata-scale inventory (one row per file, partitioned by the
    * table's partition key) that never touches data bytes.
    */
  def q120_compaction_plan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"), octet_length(col("text")).cast("long").as("size_bytes"))
      .filter(col("size_bytes") < 8192L)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("size_bytes").over(w), lit(0L)))
      .withColumn("bin", expr("cast(cum_before div 4096 as bigint)"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum("size_bytes").as("total_bytes"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "bin")
  }

  val q120Sql: String =
    """WITH f AS (SELECT lang, doc_id, CAST(strlen(text) AS BIGINT) AS size_bytes
           FROM documents WHERE strlen(text) < 8192),
c AS (SELECT lang, doc_id, size_bytes,
             coalesce(sum(size_bytes) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM f)
SELECT lang, CAST(cum_before // 4096 AS BIGINT) AS bin,
       count(*) AS n_files, CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2 ORDER BY lang, bin"""

  /** ORC roundtrip — the third columnar interchange format after
    * parquet (q82) and the row formats (q86 CSV, q87 JSONL): write the
    * documents table as ORC, read it back, aggregate per (lang,
    * source). ORC ships in Spark's core jars (warehouse estates mix
    * parquet and ORC freely), so the source/sink matrix should cover
    * it; the oracle aggregates the original table directly — the
    * roundtrip's losslessness IS the claim (DuckDB reads no ORC).
    */
  def q177_orc_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_q177_orc_", dir)
    Tables(s, dir, "documents").write.mode("overwrite").orc(out)
    s.read.schema(DocsSchema).orc(out)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(length(col("text"))).as("total_text_len"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
      .orderBy("lang", "source")
  }

  val q177Sql: String =
    """SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents GROUP BY lang, source ORDER BY lang, source"""

  /** FILE-SKIPPING INDEX over the documents corpus
    * ([[graft.sources.SkippingIndex]] — the Delta/Iceberg zone-map +
    * bloom file-statistics pattern): the corpus is written clustered
    * into 64 id-range directories with a per-cluster stats sidecar
    * (min/max doc_id zone map + a portable 2016-bit bloom over the
    * document fingerprint), then two selective probes run through the
    * index:
    *
    *  - a RANGE probe (`doc_id BETWEEN lo AND hi`, a backfill-window
    *    shape) prunes via the zone map, and
    *  - a POINT probe (find every copy of doc 42's content by
    *    fingerprint — the content-lookup shape) prunes via the bloom.
    *
    * Each probe reads ONLY the admitted clusters (`cluster IN (…)` →
    * PartitionFilters; metric-asserted in SkippingIndexSpec). The
    * output is the per-cluster audit — stats, both admission
    * decisions, and the matching-row counts from the pruned scans — so
    * the gate hashes the skipping DECISIONS (zone-map overlap test,
    * bloom word/bit membership) as well as the pruned-read results.
    * The oracle replays the cluster assignment, the sidecar builds and
    * both decisions from the same portable arithmetic.
    *
    * Scale: the stats/bloom sidecars are |files|-row metadata (the
    * manifest pattern — millions of rows at 100 TB, never data-scale);
    * the probes' driver collects are bounded by |files|; the data scan
    * opens only admitted directories. The cluster width is derived
    * from max(doc_id) so the 64-cluster demo layout holds on sparse id
    * spaces (the 8x replica corpora) too.
    */
  def q196_skipping_index(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.SkippingIndex
    import graft.functions.PortableHash
    import graft.text.Text
    val out = tmp("graft_q196_skip_", dir)
    val d = Tables(s, dir, "documents").select(col("doc_id"),
      PortableHash.asciiPolyHash(concat_ws(" ", Text.tokens(col("text")))).as("fp"))
    // 1-row driver scalars (manifest-scale collects): the cluster width
    // targeting 64 clusters, and the probe key (doc 42's fingerprint)
    val maxId = d.agg(max("doc_id")).head.getLong(0)
    val w = math.ceil((maxId + 1) / 64.0).toLong
    val h = d.filter(col("doc_id") === 42).head.getLong(1)
    val clustered = d.withColumn("cluster", expr(s"doc_id div $w"))
    SkippingIndex.build(clustered, out, "cluster", Seq("doc_id"), "fp")
    val (lo, hi) = (3 * w + 1, 5 * w + w / 2)
    val rSel = SkippingIndex.selectRange(s, out, "doc_id", lo, hi)
    val pSel = SkippingIndex.selectPoint(s, out, h)
    val rangeRows = SkippingIndex.readClusters(s, out, rSel)
      .filter(col("doc_id").between(lo, hi))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("range_rows"))
    val bloomHits = SkippingIndex.readClusters(s, out, pSel)
      .filter(col("fp") === h)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("bloom_hits"))
    SkippingIndex.stats(s, out)
      .select(col("cluster").cast("long").as("cluster"), col("n_rows"),
        col("min_doc_id").as("min_id"), col("max_doc_id").as("max_id"),
        when(col("cluster").cast("long").isInCollection(rSel), 1L).otherwise(0L).as("range_read"),
        when(col("cluster").cast("long").isInCollection(pSel), 1L).otherwise(0L).as("bloom_read"))
      .join(rangeRows, Seq("cluster"), "left")
      .join(bloomHits, Seq("cluster"), "left")
      .select(col("cluster"), col("n_rows"), col("min_id"), col("max_id"),
        col("range_read"), col("bloom_read"),
        coalesce(col("range_rows"), lit(0L)).as("range_rows"),
        coalesce(col("bloom_hits"), lit(0L)).as("bloom_hits"))
      .orderBy("cluster")
  }

  val q196Sql: String = {
    import graft.sources.SkippingIndex.{probeA1, probeB1, probeA2, probeB2, P, Words, WordBits}
    val bits = Words * WordBits
    raw"""WITH d AS (SELECT doc_id, ${QueriesDedup.polyHashSql(s"array_to_string(${QueriesText.ToksSql}, ' ')")} AS fp FROM documents),
wv AS (SELECT CAST(ceil((max(doc_id) + 1) / 64.0) AS BIGINT) AS w FROM d),
c AS (SELECT doc_id, fp, doc_id // w AS cluster FROM d CROSS JOIN wv),
st AS (SELECT cluster, count(*) AS n_rows, min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM c GROUP BY cluster),
bounds AS (SELECT 3 * w + 1 AS lo, 5 * w + w // 2 AS hi FROM wv),
pk AS (SELECT fp AS h FROM d WHERE doc_id = 42),
bloom AS (SELECT cluster, bp // $WordBits AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(bp % $WordBits AS INTEGER)) AS mask
          FROM (SELECT cluster, (((fp % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp FROM c
                UNION ALL
                SELECT cluster, (((fp % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp FROM c)
          GROUP BY cluster, word),
pb AS (SELECT (((h % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp0,
              (((h % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp1 FROM pk),
sel AS (SELECT st.cluster,
               CASE WHEN st.min_id <= b.hi AND st.max_id >= b.lo THEN 1 ELSE 0 END AS range_read,
               CASE WHEN b1.cluster IS NOT NULL AND b2.cluster IS NOT NULL THEN 1 ELSE 0 END AS bloom_read
        FROM st CROSS JOIN bounds b CROSS JOIN pb
        LEFT JOIN bloom b1 ON b1.cluster = st.cluster AND b1.word = pb.bp0 // $WordBits
          AND (b1.mask & (CAST(1 AS BIGINT) << CAST(pb.bp0 % $WordBits AS INTEGER))) <> 0
        LEFT JOIN bloom b2 ON b2.cluster = st.cluster AND b2.word = pb.bp1 // $WordBits
          AND (b2.mask & (CAST(1 AS BIGINT) << CAST(pb.bp1 % $WordBits AS INTEGER))) <> 0),
rr AS (SELECT c.cluster, count(*) AS range_rows
       FROM c JOIN sel ON sel.cluster = c.cluster AND sel.range_read = 1
       CROSS JOIN bounds b WHERE c.doc_id BETWEEN b.lo AND b.hi GROUP BY c.cluster),
bh AS (SELECT c.cluster, count(*) AS bloom_hits
       FROM c JOIN sel ON sel.cluster = c.cluster AND sel.bloom_read = 1
       CROSS JOIN pk WHERE c.fp = pk.h GROUP BY c.cluster)
SELECT st.cluster, st.n_rows, st.min_id, st.max_id,
       CAST(sel.range_read AS BIGINT) AS range_read,
       CAST(sel.bloom_read AS BIGINT) AS bloom_read,
       COALESCE(rr.range_rows, CAST(0 AS BIGINT)) AS range_rows,
       COALESCE(bh.bloom_hits, CAST(0 AS BIGINT)) AS bloom_hits
FROM st JOIN sel ON sel.cluster = st.cluster
LEFT JOIN rr ON rr.cluster = st.cluster
LEFT JOIN bh ON bh.cluster = st.cluster
ORDER BY st.cluster"""
  }

  /** DELETION-VECTOR table maintenance
    * ([[graft.operators.DeletionVectors]] — merge-on-read position
    * deletes): the corpus is written once as an immutable 8-shard
    * table, then two deletes land as (shard, pos) sidecars with NO base
    * rewrite — first a dedup-by-takedown (every non-canonical duplicate
    * by content fingerprint, the keys-list GDPR shape), then a quality
    * purge (n_chars < 200 over the LIVE rows — the sidecar disjointness
    * contract: already-deleted rows are not re-recorded). A compaction
    * then folds the vectors in, rewriting ONLY the shards that carry
    * deletions. The output is the per-shard audit — live count and
    * checksum from the post-compaction read, both sidecars' per-shard
    * row counts (captured before the fold), and the manifest's
    * base-version pointer (10 = rewritten, 0 = untouched) — so the gate
    * hashes the delete semantics, the sidecar disjointness, AND the
    * dirty-shard-only compaction decision. Read-equality across the
    * fold, position stability, torn-sidecar invisibility and the
    * broadcast masking join are spec-pinned (DeletionVectorsSpec).
    *
    * Scale: a takedown costs O(deleted) sidecar bytes; the masking
    * anti-join broadcasts the delete-scale DV set, so the corpus never
    * shuffles; compaction IO is proportional to dirty shards only.
    */
  def q198_deletion_vectors(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DeletionVectors
    import graft.functions.PortableHash
    import graft.text.Text
    import s.implicits._
    val out = tmp("graft_q198_dv_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh table per run (the fold mutates state)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      PortableHash.asciiPolyHash(concat_ws(" ", Text.tokens(col("text")))).as("fp"),
      pmod(col("doc_id"), lit(8)).as("shard"))
    DeletionVectors.writeBase(d, out, Seq("doc_id"))
    val live0 = DeletionVectors.read(s, out)
    val keepers = live0.groupBy("fp").agg(min("doc_id").as("keep_id"))
    val dupIds = live0.join(keepers, Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    DeletionVectors.deleteMatching(s, out, dupIds, Seq("doc_id"), 1L)
    DeletionVectors.deleteWhere(s, out, col("n_chars") < 200, 2L)
    // per-shard sidecar audit BEFORE the fold deletes the vectors
    // (|shards|-row collects: metadata scale)
    def dvCounts(v: Long): Map[Long, Long] =
      s.read.parquet(out + "/" + DeletionVectors.DvPrefix + v + "/dv")
        .groupBy(col("shard").cast("long").as("shard")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two independent sidecar collects over already-committed versions —
    // overlapped (guide §2.6)
    val Seq(c1, c2) = graft.core.ArtifactIO.inParallelMap(Seq(
      () => dvCounts(1L), () => dvCounts(2L)))
    DeletionVectors.compactApply(s, out, 10L)
    val liveAgg = DeletionVectors.read(s, out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_live"),
        sum((col("doc_id") * 31 + col("n_chars")) % 1000000007L).as("checksum"))
    val sv = DeletionVectors.shardVersions(s, out)
    val dvDf = sv.select("shard").collect().map(_.getLong(0)).toSeq
      .map(sh => (sh, c1.getOrElse(sh, 0L), c2.getOrElse(sh, 0L)))
      .toDF("shard", "n_dv1", "n_dv2")
    sv.join(liveAgg, Seq("shard"), "left").join(dvDf, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        coalesce(col("checksum"), lit(0L)).as("checksum"),
        col("n_dv1"), col("n_dv2"), col("base_version"))
      .orderBy("shard")
  }

  val q198Sql: String =
    raw"""WITH d AS (SELECT doc_id, n_chars, doc_id % 8 AS shard,
                ${QueriesDedup.polyHashSql(s"array_to_string(${QueriesText.ToksSql}, ' ')")} AS fp
         FROM documents),
keep AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp),
live1 AS (SELECT d.doc_id, d.n_chars, d.shard
          FROM d JOIN keep ON keep.fp = d.fp AND d.doc_id = keep.keep_id),
dup AS (SELECT d.shard FROM d JOIN keep ON keep.fp = d.fp WHERE d.doc_id <> keep.keep_id),
live2 AS (SELECT * FROM live1 WHERE n_chars >= 200),
shards AS (SELECT DISTINCT shard FROM d),
la AS (SELECT shard, count(*) AS n_live,
              sum((doc_id * 31 + n_chars) % 1000000007) AS checksum
       FROM live2 GROUP BY shard),
d1 AS (SELECT shard, count(*) AS n_dv1 FROM dup GROUP BY shard),
d2 AS (SELECT shard, count(*) AS n_dv2 FROM live1 WHERE n_chars < 200 GROUP BY shard)
SELECT s.shard,
       COALESCE(la.n_live, CAST(0 AS BIGINT)) AS n_live,
       CAST(COALESCE(la.checksum, 0) AS BIGINT) AS checksum,
       CAST(COALESCE(d1.n_dv1, 0) AS BIGINT) AS n_dv1,
       CAST(COALESCE(d2.n_dv2, 0) AS BIGINT) AS n_dv2,
       CAST(CASE WHEN COALESCE(d1.n_dv1, 0) + COALESCE(d2.n_dv2, 0) > 0
                 THEN 10 ELSE 0 END AS BIGINT) AS base_version
FROM shards s LEFT JOIN la ON la.shard = s.shard
LEFT JOIN d1 ON d1.shard = s.shard
LEFT JOIN d2 ON d2.shard = s.shard
ORDER BY s.shard"""

  /** MERGE-ON-READ UPSERT lifecycle ([[graft.operators.DeletionVectors]]
    * `upsert` — the lakehouse MERGE INTO shape, the copy-on-write
    * q145's modern sibling): against the immutable 8-shard corpus,
    * batch v1 UPDATES every doc_id ≡ 2 (mod 5) and INSERTS shifted
    * copies of every doc_id ≡ 3 (mod 7) — one (shard, pos) deletion
    * vector for the matched rows plus one append in the version's own
    * position namespace, O(batch) IO, no base rewrite; batch v2 then
    * updates half the rows v1 INSERTED (vectors masking append
    * positions). A compaction folds vectors and appends into rewritten
    * dirty shards behind the manifest. Output: the per-shard audit —
    * post-fold live count + checksum, both versions' per-shard
    * update/append sidecar counts (captured pre-fold), and the
    * manifest pointer — so the gate hashes the MERGE semantics, the
    * append visibility rules AND the fold decision. Replay idempotence
    * and the version-guard (no double-count while superseded sidecars
    * await the vacuum) are spec-pinned (DeletionVectorsSpec).
    */
  def q201_merge_on_read(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DeletionVectors
    import s.implicits._
    val out = tmp("graft_q201_mor_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh table per run
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      pmod(col("doc_id"), lit(8)).as("shard"))
    DeletionVectors.writeBase(d, out, Seq("doc_id"))
    val maxId = d.agg(max("doc_id")).head.getLong(0) // 1-row driver scalar
    val upd = d.filter(col("doc_id") % 5 === 2)
      .select(col("doc_id"), (col("n_chars") + 1000).as("n_chars"))
    val ins = d.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + maxId + 1).as("doc_id"), (col("n_chars") + 7).as("n_chars"))
    val batch1 = upd.unionByName(ins).withColumn("shard", pmod(col("doc_id"), lit(8)))
    DeletionVectors.upsert(s, out, batch1, Seq("doc_id"), Seq("doc_id"), 1L)
    val batch2 = ins.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), (col("n_chars") + 9).as("n_chars"))
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
    DeletionVectors.upsert(s, out, batch2, Seq("doc_id"), Seq("doc_id"), 2L)
    // per-shard sidecar audit BEFORE the fold GCs them (|shards|-row collects)
    def sideCounts(prefix: String, v: Long, sub: String): Map[Long, Long] = {
      val pth = out + "/" + prefix + v + "/" + sub
      s.read.parquet(pth).groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // four independent |shards|-row collects over already-committed
    // sidecars — overlapped (guide §2.6), each otherwise pays full
    // driver job latency back to back
    val Seq(u1, a1, u2, a2) = graft.core.ArtifactIO.inParallelMap(Seq(
      () => sideCounts(DeletionVectors.DvPrefix, 1L, "dv"),
      () => sideCounts(DeletionVectors.AppendPrefix, 1L, "data"),
      () => sideCounts(DeletionVectors.DvPrefix, 2L, "dv"),
      () => sideCounts(DeletionVectors.AppendPrefix, 2L, "data")))
    DeletionVectors.compactApply(s, out, 10L)
    val liveAgg = DeletionVectors.read(s, out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_live"),
        sum((col("doc_id") * 31 + col("n_chars")) % 1000000007L).as("checksum"))
    val sv = DeletionVectors.shardVersions(s, out)
    val sideDf = sv.select("shard").collect().map(_.getLong(0)).toSeq
      .map(sh => (sh, u1.getOrElse(sh, 0L), a1.getOrElse(sh, 0L),
        u2.getOrElse(sh, 0L), a2.getOrElse(sh, 0L)))
      .toDF("shard", "n_upd1", "n_app1", "n_upd2", "n_app2")
    sv.join(liveAgg, Seq("shard"), "left").join(sideDf, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        coalesce(col("checksum"), lit(0L)).as("checksum"),
        col("n_upd1"), col("n_app1"), col("n_upd2"), col("n_app2"),
        col("base_version"))
      .orderBy("shard")
  }

  val q201Sql: String =
    raw"""WITH d AS (SELECT doc_id, n_chars, doc_id % 8 AS shard FROM documents),
mx AS (SELECT max(doc_id) AS m FROM d),
ins AS (SELECT d.doc_id + mx.m + 1 AS doc_id, d.n_chars + 7 AS n_chars
        FROM d CROSS JOIN mx WHERE d.doc_id % 7 = 3),
s1 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 2 THEN n_chars + 1000 ELSE n_chars END AS n_chars
       FROM d
       UNION ALL SELECT doc_id, n_chars FROM ins),
s2 AS (SELECT s1.doc_id,
              CASE WHEN s1.doc_id > mx.m AND s1.doc_id % 2 = 0
                   THEN s1.n_chars + 9 ELSE s1.n_chars END AS n_chars
       FROM s1 CROSS JOIN mx),
fin AS (SELECT doc_id, n_chars, doc_id % 8 AS shard FROM s2),
shards AS (SELECT DISTINCT shard FROM d),
la AS (SELECT shard, count(*) AS n_live,
              sum((doc_id * 31 + n_chars) % 1000000007) AS checksum
       FROM fin GROUP BY shard),
c_u1 AS (SELECT doc_id % 8 AS shard, count(*) AS n FROM d WHERE doc_id % 5 = 2 GROUP BY 1),
c_a1 AS (SELECT shard, count(*) AS n FROM (
           SELECT doc_id % 8 AS shard FROM d WHERE doc_id % 5 = 2
           UNION ALL SELECT doc_id % 8 FROM ins) GROUP BY shard),
c_u2 AS (SELECT doc_id % 8 AS shard, count(*) AS n FROM ins WHERE doc_id % 2 = 0 GROUP BY 1),
dirty AS (SELECT shard, max(x) AS any_side FROM (
            SELECT shard, 1 AS x FROM c_u1
            UNION ALL SELECT shard, 1 FROM c_a1
            UNION ALL SELECT shard, 1 FROM c_u2) GROUP BY shard)
SELECT s.shard,
       COALESCE(la.n_live, CAST(0 AS BIGINT)) AS n_live,
       CAST(COALESCE(la.checksum, 0) AS BIGINT) AS checksum,
       CAST(COALESCE(c_u1.n, 0) AS BIGINT) AS n_upd1,
       CAST(COALESCE(c_a1.n, 0) AS BIGINT) AS n_app1,
       CAST(COALESCE(c_u2.n, 0) AS BIGINT) AS n_upd2,
       CAST(COALESCE(c_u2.n, 0) AS BIGINT) AS n_app2,
       CAST(CASE WHEN dirty.shard IS NOT NULL THEN 10 ELSE 0 END AS BIGINT) AS base_version
FROM shards s LEFT JOIN la ON la.shard = s.shard
LEFT JOIN c_u1 ON c_u1.shard = s.shard
LEFT JOIN c_a1 ON c_a1.shard = s.shard
LEFT JOIN c_u2 ON c_u2.shard = s.shard
LEFT JOIN dirty ON dirty.shard = s.shard
ORDER BY s.shard"""

  /** INCREMENTAL SKIPPING-INDEX MAINTENANCE ([[SkippingIndex.append]]
    * — q196's ingestion path): the index is built over HALF the corpus,
    * the other half arrives as an append — data files land inside the
    * existing cluster directories and the batch's sidecar aggregates
    * land as a second VERSION (count → sum, zone map → min/max, bloom
    * → bit-or: every sidecar is a mergeable sketch, so ingestion never
    * recomputes global statistics). The q196 probes then run over the
    * FOLDED sidecars and must decide exactly as a from-scratch build
    * over the full corpus would (mergeability is precisely that
    * equality — also pinned row-for-row in SkippingIndexSpec). The
    * `n_stat_versions = 2` column proves no sidecar rewrite happened.
    * Probe window and key differ from q196's so the two entries gate
    * different decisions.
    */
  def q205_skipping_append(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.SkippingIndex
    import graft.functions.PortableHash
    import graft.text.Text
    val out = tmp("graft_q205_skipapp_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh index per run (append mutates)
    val d = Tables(s, dir, "documents").select(col("doc_id"),
      PortableHash.asciiPolyHash(concat_ws(" ", Text.tokens(col("text")))).as("fp"))
    // one pass for both driver scalars (guide §1.2: don't run two jobs
    // where one aggregate answers both — `when` evaluates fp only on the
    // matching row, so the probe hash costs one tokenization, not a scan)
    val hdr = d.agg(max("doc_id"),
      max(when(col("doc_id") === 41, col("fp")))).head
    require(!hdr.isNullAt(1), "probe doc_id 41 missing from the corpus")
    val maxId = hdr.getLong(0) // ingestion-stable width
    val w = math.ceil((maxId + 1) / 64.0).toLong
    val h = hdr.getLong(1)
    val clustered = d.withColumn("cluster", expr(s"doc_id div $w"))
    SkippingIndex.build(clustered.filter(col("doc_id") % 2 === 0),
      out, "cluster", Seq("doc_id"), "fp")
    SkippingIndex.append(clustered.filter(col("doc_id") % 2 =!= 0),
      out, "cluster", Seq("doc_id"), "fp", 1L)
    val (lo, hi) = (2 * w + 1, 4 * w + w / 2)
    // three independent sidecar probes (a listing + two metadata-scale
    // selection collects) — overlapped (guide §2.6)
    val Seq(nVersionsA, rSelA, pSelA) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => SkippingIndex.sideVersionCount(s, out),
      () => SkippingIndex.selectRange(s, out, "doc_id", lo, hi),
      () => SkippingIndex.selectPoint(s, out, h)))
    val nVersions = nVersionsA.asInstanceOf[Long]
    val rSel = rSelA.asInstanceOf[Seq[Long]]
    val pSel = pSelA.asInstanceOf[Seq[Long]]
    val rangeRows = SkippingIndex.readClusters(s, out, rSel)
      .filter(col("doc_id").between(lo, hi))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("range_rows"))
    val bloomHits = SkippingIndex.readClusters(s, out, pSel)
      .filter(col("fp") === h)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("bloom_hits"))
    SkippingIndex.stats(s, out)
      .select(col("cluster").cast("long").as("cluster"), col("n_rows"),
        col("min_doc_id").as("min_id"), col("max_doc_id").as("max_id"),
        when(col("cluster").cast("long").isInCollection(rSel), 1L).otherwise(0L).as("range_read"),
        when(col("cluster").cast("long").isInCollection(pSel), 1L).otherwise(0L).as("bloom_read"))
      .join(rangeRows, Seq("cluster"), "left")
      .join(bloomHits, Seq("cluster"), "left")
      .select(col("cluster"), col("n_rows"), col("min_id"), col("max_id"),
        col("range_read"), col("bloom_read"),
        coalesce(col("range_rows"), lit(0L)).as("range_rows"),
        coalesce(col("bloom_hits"), lit(0L)).as("bloom_hits"),
        lit(nVersions).as("n_stat_versions"))
      .orderBy("cluster")
  }

  val q205Sql: String = {
    import graft.sources.SkippingIndex.{probeA1, probeB1, probeA2, probeB2, P, Words, WordBits}
    val bits = Words * WordBits
    raw"""WITH d AS (SELECT doc_id, ${QueriesDedup.polyHashSql(s"array_to_string(${QueriesText.ToksSql}, ' ')")} AS fp FROM documents),
wv AS (SELECT CAST(ceil((max(doc_id) + 1) / 64.0) AS BIGINT) AS w FROM d),
c AS (SELECT doc_id, fp, doc_id // w AS cluster FROM d CROSS JOIN wv),
st AS (SELECT cluster, count(*) AS n_rows, min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM c GROUP BY cluster),
bounds AS (SELECT 2 * w + 1 AS lo, 4 * w + w // 2 AS hi FROM wv),
pk AS (SELECT fp AS h FROM d WHERE doc_id = 41),
bloom AS (SELECT cluster, bp // $WordBits AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(bp % $WordBits AS INTEGER)) AS mask
          FROM (SELECT cluster, (((fp % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp FROM c
                UNION ALL
                SELECT cluster, (((fp % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp FROM c)
          GROUP BY cluster, word),
pb AS (SELECT (((h % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp0,
              (((h % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp1 FROM pk),
sel AS (SELECT st.cluster,
               CASE WHEN st.min_id <= b.hi AND st.max_id >= b.lo THEN 1 ELSE 0 END AS range_read,
               CASE WHEN b1.cluster IS NOT NULL AND b2.cluster IS NOT NULL THEN 1 ELSE 0 END AS bloom_read
        FROM st CROSS JOIN bounds b CROSS JOIN pb
        LEFT JOIN bloom b1 ON b1.cluster = st.cluster AND b1.word = pb.bp0 // $WordBits
          AND (b1.mask & (CAST(1 AS BIGINT) << CAST(pb.bp0 % $WordBits AS INTEGER))) <> 0
        LEFT JOIN bloom b2 ON b2.cluster = st.cluster AND b2.word = pb.bp1 // $WordBits
          AND (b2.mask & (CAST(1 AS BIGINT) << CAST(pb.bp1 % $WordBits AS INTEGER))) <> 0),
rr AS (SELECT c.cluster, count(*) AS range_rows
       FROM c JOIN sel ON sel.cluster = c.cluster AND sel.range_read = 1
       CROSS JOIN bounds b WHERE c.doc_id BETWEEN b.lo AND b.hi GROUP BY c.cluster),
bh AS (SELECT c.cluster, count(*) AS bloom_hits
       FROM c JOIN sel ON sel.cluster = c.cluster AND sel.bloom_read = 1
       CROSS JOIN pk WHERE c.fp = pk.h GROUP BY c.cluster)
SELECT st.cluster, st.n_rows, st.min_id, st.max_id,
       CAST(sel.range_read AS BIGINT) AS range_read,
       CAST(sel.bloom_read AS BIGINT) AS bloom_read,
       COALESCE(rr.range_rows, CAST(0 AS BIGINT)) AS range_rows,
       COALESCE(bh.bloom_hits, CAST(0 AS BIGINT)) AS bloom_hits,
       CAST(2 AS BIGINT) AS n_stat_versions
FROM st JOIN sel ON sel.cluster = st.cluster
LEFT JOIN rr ON rr.cluster = st.cluster
LEFT JOIN bh ON bh.cluster = st.cluster
ORDER BY st.cluster"""
  }

  /** ZERO-COPY TABLE CLONE ([[graft.operators.DeletionVectors.clone]]
    * — the lakehouse CREATE TABLE CLONE / branch): after a shared
    * delete, the table is branched by writing a manifest that points
    * at the source's immutable base files plus a copy of the
    * delete-scale sidecars — no data file is copied. The branches then
    * DIVERGE: the source takes a further quality purge, the clone
    * takes its own takedown and folds it with a LOCAL compaction.
    * Output: each branch's live count + checksum, so the gate hashes
    * both divergent states — isolation in both directions is exactly
    * that neither branch's numbers show the other's delete. At 100 TB
    * a branch costs manifest + sidecar bytes; experiments mutate the
    * clone while the source serves (the spec additionally pins that no
    * base data dir exists under the clone before its own compaction).
    */
  def q206_table_clone(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DeletionVectors
    val out = tmp("graft_q206_clone_", dir)
    graft.core.ArtifactIO.delete(s, out)
    val (src, cl) = (s"$out/src", s"$out/clone")
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      pmod(col("doc_id"), lit(8)).as("shard"))
    DeletionVectors.writeBase(d, src, Seq("doc_id"))
    DeletionVectors.deleteWhere(s, src, col("n_chars") < 150, 1L) // shared history
    DeletionVectors.clone(s, src, cl)
    DeletionVectors.deleteWhere(s, src, col("n_chars") < 250, 2L)          // source-only
    DeletionVectors.deleteWhere(s, cl, pmod(col("doc_id"), lit(3)) === 1, 2L) // clone-only
    DeletionVectors.compactApply(s, cl, 10L) // clone folds LOCALLY
    def audit(table: String, path: String) =
      DeletionVectors.read(s, path).agg(
        count(lit(1)).as("n_live"),
        sum((col("doc_id") * 31 + col("n_chars")) % 1000000007L).as("checksum"))
        .select(lit(table).as("branch"), col("n_live"), col("checksum"))
    audit("clone", cl).unionByName(audit("src", src)).orderBy("branch")
  }

  val q206Sql: String =
    raw"""WITH d AS (SELECT doc_id, n_chars FROM documents)
SELECT 'clone' AS branch, count(*) AS n_live,
       CAST(sum((doc_id * 31 + n_chars) % 1000000007) AS BIGINT) AS checksum
FROM d WHERE n_chars >= 150 AND doc_id % 3 <> 1
UNION ALL
SELECT 'src', count(*), CAST(sum((doc_id * 31 + n_chars) % 1000000007) AS BIGINT)
FROM d WHERE n_chars >= 250
ORDER BY branch"""

  /** PARTITION-SPEC EVOLUTION — the Iceberg table-evolution contract:
    * a table's partition layout can change WITHOUT rewriting history.
    * Here the corpus starts under spec 0 (16 coarse id-range clusters);
    * the table then evolves to spec 1 (64 fine clusters — 4× finer
    * pruning for the hot recent data) and the post-evolution batch
    * lands under the NEW spec while the historical files stay exactly
    * where they are. A range probe (`doc_id BETWEEN lo AND hi`) plans
    * per-spec: each spec's own |files|-row zone-map sidecar admits its
    * own clusters, each admitted set drives its own PartitionFilters
    * scan, and the union is exactly the predicate's rows — the reader
    * never knows the layout changed. The output audits every (spec,
    * cluster): zone map, admission decision, and matching rows from
    * the pruned scans, so the gate hashes both specs' skipping
    * decisions and the cross-layout union.
    *
    * Scale: spec evolution costs ZERO data movement (the alternative —
    * rewriting a 100 TB table to re-partition — is exactly what this
    * exists to avoid); the price is one manifest consultation per live
    * spec at plan time, both metadata-scale. Old specs retire
    * naturally as their files age out or compaction rewrites them
    * under the current spec.
    */
  def q213_partition_evolution(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.SkippingIndex
    val out = tmp("graft_q213_evolve_", dir)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    // 1-row driver scalar: the data-derived widths (16 coarse / 64 fine
    // clusters over the live id space — holds on sparse-id replicas too)
    val maxId = d.agg(max("doc_id")).head.getLong(0)
    val w0 = math.ceil((maxId + 1) / 16.0).toLong
    val w1 = math.ceil((maxId + 1) / 64.0).toLong
    val base = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val incoming = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    SkippingIndex.buildSpec(base.withColumn("cluster", expr(s"doc_id div $w0")),
      out, 0L, "cluster", Seq("doc_id"), "doc_id")
    SkippingIndex.buildSpec(incoming.withColumn("cluster", expr(s"doc_id div $w1")),
      out, 1L, "cluster", Seq("doc_id"), "doc_id")
    val (lo, hi) = (5 * w1 + 1, 13 * w1)
    // the production read path: per-spec pruned scans, unioned
    val matches = SkippingIndex.readRangeAcrossSpecs(s, out, "doc_id", lo, hi)
      .groupBy(col("spec_id"), col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("match_rows"))
    def audit(specId: Long): DataFrame = {
      val root = s"$out/spec=$specId"
      val sel = SkippingIndex.selectRange(s, root, "doc_id", lo, hi)
      SkippingIndex.stats(s, root)
        .select(lit(specId).as("spec_id"), col("cluster").cast("long").as("cluster"),
          col("n_rows"), col("min_doc_id").as("min_id"), col("max_doc_id").as("max_id"),
          when(col("cluster").cast("long").isInCollection(sel), 1L).otherwise(0L).as("admitted"))
    }
    audit(0L).union(audit(1L))
      .join(matches, Seq("spec_id", "cluster"), "left")
      .select(col("spec_id"), col("cluster"), col("n_rows"), col("min_id"),
        col("max_id"), col("admitted"),
        coalesce(col("match_rows"), lit(0L)).as("match_rows"))
      .orderBy("spec_id", "cluster")
  }

  val q213Sql: String =
    raw"""WITH d AS (SELECT doc_id FROM documents),
wv AS (SELECT CAST(ceil((max(doc_id) + 1) / 16.0) AS BIGINT) AS w0,
              CAST(ceil((max(doc_id) + 1) / 64.0) AS BIGINT) AS w1 FROM d),
c AS (SELECT doc_id,
             CASE WHEN doc_id % 4 <> 0 THEN 0 ELSE 1 END AS spec_id,
             CASE WHEN doc_id % 4 <> 0 THEN doc_id // w0 ELSE doc_id // w1 END AS cluster
      FROM d CROSS JOIN wv),
st AS (SELECT spec_id, cluster, count(*) AS n_rows,
              min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM c GROUP BY 1, 2),
bounds AS (SELECT 5 * w1 + 1 AS lo, 13 * w1 AS hi FROM wv),
sel AS (SELECT st.spec_id, st.cluster, st.n_rows, st.min_id, st.max_id,
               CASE WHEN st.min_id <= b.hi AND st.max_id >= b.lo THEN 1 ELSE 0 END AS admitted
        FROM st CROSS JOIN bounds b),
mr AS (SELECT c.spec_id, c.cluster, count(*) AS match_rows
       FROM c JOIN sel ON sel.spec_id = c.spec_id AND sel.cluster = c.cluster AND sel.admitted = 1
       CROSS JOIN bounds b WHERE c.doc_id BETWEEN b.lo AND b.hi
       GROUP BY 1, 2)
SELECT sel.spec_id, sel.cluster, sel.n_rows, sel.min_id, sel.max_id,
       CAST(sel.admitted AS BIGINT) AS admitted,
       COALESCE(mr.match_rows, CAST(0 AS BIGINT)) AS match_rows
FROM sel LEFT JOIN mr ON mr.spec_id = sel.spec_id AND mr.cluster = sel.cluster
ORDER BY sel.spec_id, sel.cluster"""

  /** ONE TABLE, THREE SUBSTRATES, ONE COMMIT LOG — the lakehouse
    * transaction composition ([[graft.core.CommitLog]], round 11): the
    * corpus lives as a deletion-vector table (16 id-range shards), its
    * file statistics live as a stats-ONLY skipping index over the same
    * files ([[graft.sources.SkippingIndex.buildStats]] — Iceberg's
    * metadata-over-existing-files shape, no data copy), and per-row
    * liveness is mirrored into a delta-state LWW chain whose CHANGE
    * DATA FEED exposes every mutation. The lifecycle under the hash:
    *
    *  1. TAKEDOWN of every non-canonical content duplicate, with the
    *     deletion-vector version id allocated through the commit log's
    *     atomic claim ([[graft.operators.DeletionVectors
    *     .deleteMatchingConcurrent]] — the id itself is hashed, so the
    *     allocation protocol is under the gate);
    *  2. CDF of the change (update rows flipping alive 1→0, counted and
    *     checksummed through [[graft.streaming.DeltaState
    *     .changesBetween]]);
    *  3. PRUNED MASKED READS: a zone-map range probe and a bloom point
    *     probe admit shards from the sidecars, and the data scan is the
    *     DV table's `shard IN (…)` (PartitionFilters) with the
    *     delete mask's broadcast anti-join on top — index pruning and
    *     merge-on-read composing in one plan;
    *  4. the JANITOR ([[graft.core.CommitLog.janitor]], the one
    *     compaction entry point) folds the DV sidecars into rewritten
    *     dirty shards under a log-allocated base id and folds the state
    *     chain to its retention floor — after which the same pruned
    *     reads and the same CDF must still hold (the post-fold rows).
    *
    * Scale: every audit collect is |shards|- or scalar-bounded; the
    * corpus shuffles once (position assignment at writeBase) and the
    * probes open only admitted shard directories.
    */
  def q221_lakehouse_txn(s: SparkSession, dir: String): DataFrame = {
    import graft.core.CommitLog
    import graft.operators.DeletionVectors
    import graft.sources.SkippingIndex
    import graft.streaming.DeltaState
    import graft.functions.PortableHash
    import graft.text.Text
    import s.implicits._
    val out = tmp("graft_q221_lake_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh table per run (the fold mutates state)
    // Persisted: the fingerprint projection feeds the driver scalars and
    // every substrate build below — without the cache the tokenize+hash
    // scan re-executes ~5x (guide §1.2: per-task work after shape).
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      PortableHash.asciiPolyHash(concat_ws(" ", Text.tokens(col("text")))).as("fp"))
      .persist()
    // 1-row driver scalars in ONE job: shard width targeting 16 "files"
    // (max doc_id) and the point key (doc 42's fingerprint)
    val scal = d.agg(max("doc_id"),
      max(when(col("doc_id") === 42, col("fp")))).head
    val (maxId, h) = (scal.getLong(0), scal.getLong(1))
    val w = math.ceil((maxId + 1) / 16.0).toLong
    val base = d.withColumn("shard", expr(s"doc_id div $w"))
    val (table, skip, state) = (s"$out/table", s"$out/skip", s"$out/state")
    val layout = Seq(DeltaState.Table("live", DeltaState.Lww(Seq("doc_id"))))
    // the three substrates (DV table, skipping sidecars, live state) are
    // independent builds over the cached projection — overlap them
    // (guide §2.6)
    graft.core.ArtifactIO.inParallel(Seq(
      () => DeletionVectors.writeBase(base, table, Seq("doc_id")),
      () => SkippingIndex.buildStats(base.withColumn("cluster", col("shard")), skip,
        "cluster", Seq("doc_id"), "fp"),
      () => DeltaState.writeDelta(s, state, 0L, layout,
        Seq("live" -> base.select(col("doc_id"), lit(1L).as("alive"))))))
    d.unpersist() // everything after reads the written substrates, not d
    // takedown: non-canonical duplicates by fingerprint, id from the log
    val live0 = DeletionVectors.read(s, table)
    val keepers = live0.groupBy("fp").agg(min("doc_id").as("keep_id"))
    // persisted: the takedown id set feeds BOTH the DV delete and the
    // live-state delta — without the cache the keepers join re-executes
    // per consumer; the two consumers mutate DIFFERENT substrates
    // (table vs state), so they also overlap (guide §2.6)
    val dupIds = live0.join(keepers, Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id").persist()
    val Seq(delA, _) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => DeletionVectors.deleteMatchingConcurrent(s, table, dupIds, Seq("doc_id")),
      () => DeltaState.writeDelta(s, state, 1L, layout,
        Seq("live" -> dupIds.select(col("doc_id"), lit(0L).as("alive"))))))
    val (txnId, nDel) = delA.asInstanceOf[(Long, Long)]
    def cdfAgg(): (Long, Long, Long) = {
      val r = DeltaState.changesBetween(s, state, layout.head, 0L, 1L).get.agg(
        coalesce(sum(when(col("change") === "update" &&
          col("pre_alive") === 1L && col("post_alive") === 0L, 1L)), lit(0L)).as("n_upd"),
        coalesce(sum(when(col("change") === "update", col("doc_id") % 1000000007L)), lit(0L)).as("ck"),
        coalesce(sum(when(col("change") === "insert", 1L)), lit(0L)).as("n_ins")).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // pruned masked reads: sidecar admission -> DV-table PartitionFilters scan
    val (lo, hi) = (3 * w + 1, 5 * w + w / 2)
    // three independent read-only probes over different substrates (the
    // CDF range over the state chain, range/point admission over the
    // skipping sidecars) — overlapped (guide §2.6)
    val Seq(cdf1A, rSelA, pSelA) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => cdfAgg(),
      () => SkippingIndex.selectRange(s, skip, "doc_id", lo, hi),
      () => SkippingIndex.selectPoint(s, skip, h)))
    val cdf1 = cdf1A.asInstanceOf[(Long, Long, Long)]
    val rSel = rSelA.asInstanceOf[Seq[Long]]
    val pSel = pSelA.asInstanceOf[Seq[Long]]
    def rangeAgg(): (Long, Long) = {
      val r = DeletionVectors.read(s, table)
        .filter(col("shard").isin(rSel: _*) && col("doc_id").between(lo, hi))
        .agg(count(lit(1)).as("n"),
          coalesce(sum((col("doc_id") * 31 + col("n_chars")) % 1000000007L), lit(0L)).as("ck")).head
      (r.getLong(0), r.getLong(1))
    }
    // the pruned range and point reads are independent scans of the DV
    // table — overlapped, as are the two janitor folds (different
    // substrates with separate commit logs) and the two post-fold
    // re-probes (guide §2.6)
    val Seq(r1A, pointNA) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => rangeAgg(),
      () => DeletionVectors.read(s, table)
        .filter(col("shard").isin(pSel: _*) && col("fp") === h).count()))
    val r1 = r1A.asInstanceOf[(Long, Long)]
    val pointN = pointNA.asInstanceOf[Long]
    // the ONE compaction entry point, on both mutated substrates
    val Seq(jrA, _) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => CommitLog.janitor(s, table),
      () => CommitLog.janitor(s, state)))
    val jr = jrA.asInstanceOf[CommitLog.JanitorReport]
    val Seq(r2A, cdf2A) = graft.core.ArtifactIO.inParallelMap[Any](Seq(
      () => rangeAgg(), () => cdfAgg()))
    val r2 = r2A.asInstanceOf[(Long, Long)]
    val cdf2 = cdf2A.asInstanceOf[(Long, Long, Long)]
    val rows: Seq[(String, Long, Long)] =
      rSel.map(c => ("admit_range", c, 1L)) ++
      pSel.map(c => ("admit_point", c, 1L)) ++
      Seq(
        ("takedown", 0L, txnId),
        ("takedown", 1L, nDel),
        ("cdf", 0L, cdf1._1), ("cdf", 1L, cdf1._2), ("cdf", 2L, cdf1._3),
        ("range_read", 0L, r1._1), ("range_read", 1L, r1._2),
        ("point_read", 0L, pointN),
        ("janitor", 0L, jr.removed.size.toLong),
        ("janitor", 1L, jr.removed.map(_ % 1000000007L).sum),
        ("postfold_range", 0L, r2._1), ("postfold_range", 1L, r2._2),
        ("postfold_cdf", 0L, cdf2._1))
    rows.toDF("section", "k", "v").orderBy("section", "k", "v")
  }

  val q221Sql: String = {
    import graft.sources.SkippingIndex.{probeA1, probeB1, probeA2, probeB2, P, Words, WordBits}
    val bits = Words * WordBits
    raw"""WITH d AS (SELECT doc_id, n_chars, ${QueriesDedup.polyHashSql(s"array_to_string(${QueriesText.ToksSql}, ' ')")} AS fp FROM documents),
wv AS (SELECT CAST(ceil((max(doc_id) + 1) / 16.0) AS BIGINT) AS w FROM d),
c AS (SELECT doc_id, n_chars, fp, doc_id // w AS shard FROM d CROSS JOIN wv),
keep AS (SELECT fp, min(doc_id) AS keep_id FROM c GROUP BY fp),
dup AS (SELECT c.doc_id, c.shard FROM c JOIN keep ON keep.fp = c.fp WHERE c.doc_id <> keep.keep_id),
live AS (SELECT c.* FROM c JOIN keep ON keep.fp = c.fp AND c.doc_id = keep.keep_id),
st AS (SELECT shard, min(doc_id) AS min_id, max(doc_id) AS max_id FROM c GROUP BY shard),
bounds AS (SELECT 3 * w + 1 AS lo, 5 * w + w // 2 AS hi FROM wv),
admit_r AS (SELECT st.shard FROM st CROSS JOIN bounds b
            WHERE st.min_id <= b.hi AND st.max_id >= b.lo),
pk AS (SELECT fp AS h FROM d WHERE doc_id = 42),
bloom AS (SELECT shard, bp // $WordBits AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(bp % $WordBits AS INTEGER)) AS mask
          FROM (SELECT shard, (((fp % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp FROM c
                UNION ALL
                SELECT shard, (((fp % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp FROM c)
          GROUP BY shard, word),
pb AS (SELECT (((h % $P) * $probeA1 + $probeB1) % $P) % $bits AS bp0,
              (((h % $P) * $probeA2 + $probeB2) % $P) % $bits AS bp1 FROM pk),
admit_p AS (SELECT st.shard FROM st CROSS JOIN pb
            LEFT JOIN bloom b1 ON b1.shard = st.shard AND b1.word = pb.bp0 // $WordBits
              AND (b1.mask & (CAST(1 AS BIGINT) << CAST(pb.bp0 % $WordBits AS INTEGER))) <> 0
            LEFT JOIN bloom b2 ON b2.shard = st.shard AND b2.word = pb.bp1 // $WordBits
              AND (b2.mask & (CAST(1 AS BIGINT) << CAST(pb.bp1 % $WordBits AS INTEGER))) <> 0
            WHERE b1.shard IS NOT NULL AND b2.shard IS NOT NULL),
rr AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(COALESCE(sum((live.doc_id * 31 + live.n_chars) % 1000000007), 0) AS BIGINT) AS ck
       FROM live JOIN admit_r ON admit_r.shard = live.shard
       CROSS JOIN bounds b WHERE live.doc_id BETWEEN b.lo AND b.hi),
pt AS (SELECT CAST(count(*) AS BIGINT) AS n
       FROM live JOIN admit_p ON admit_p.shard = live.shard
       CROSS JOIN pk WHERE live.fp = pk.h),
td AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(COALESCE(sum(doc_id % 1000000007), 0) AS BIGINT) AS ck FROM dup),
dsh AS (SELECT DISTINCT shard FROM dup),
dirty AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(COALESCE(sum(shard % 1000000007), 0) AS BIGINT) AS ck FROM dsh)
SELECT section, k, v FROM (
  SELECT 'admit_range' AS section, shard AS k, CAST(1 AS BIGINT) AS v FROM admit_r
  UNION ALL SELECT 'admit_point', shard, CAST(1 AS BIGINT) FROM admit_p
  UNION ALL SELECT 'takedown', CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL SELECT 'takedown', CAST(1 AS BIGINT), n FROM td
  UNION ALL SELECT 'cdf', CAST(0 AS BIGINT), n FROM td
  UNION ALL SELECT 'cdf', CAST(1 AS BIGINT), ck FROM td
  UNION ALL SELECT 'cdf', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL SELECT 'range_read', CAST(0 AS BIGINT), n FROM rr
  UNION ALL SELECT 'range_read', CAST(1 AS BIGINT), ck FROM rr
  UNION ALL SELECT 'point_read', CAST(0 AS BIGINT), n FROM pt
  UNION ALL SELECT 'janitor', CAST(0 AS BIGINT), n FROM dirty
  UNION ALL SELECT 'janitor', CAST(1 AS BIGINT), ck FROM dirty
  UNION ALL SELECT 'postfold_range', CAST(0 AS BIGINT), n FROM rr
  UNION ALL SELECT 'postfold_range', CAST(1 AS BIGINT), ck FROM rr
  UNION ALL SELECT 'postfold_cdf', CAST(0 AS BIGINT), n FROM td
) ORDER BY section, k, v"""
  }
}
