package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.PortableHash
import graft.text.Text

/** Deduplication / fingerprinting queries (SURVEY.md §2.C-D Q15–Q16 and
  * extensions Q19, Q21, Q25).
  *
  * Oracle strategy: every hash observable in output (simhash, fingerprint)
  * uses the portable polynomial hash that the DuckDB oracle recomputes
  * bit-identically; LSH/minhash internals are candidate filters only —
  * exact Jaccard (integer arithmetic, no float risk) decides membership.
  */
object QueriesDedup {
  import QueriesText.ToksSql

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  def q15_dedup_stats(s: SparkSession, dir: String): DataFrame =
    Dedup.exactKeepFirst(docs(s, dir), "text", "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .orderBy("lang")

  val q15Sql: String =
    """WITH kept AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents)
  WHERE rn = 1)
SELECT lang, count(*) AS n_docs, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM kept GROUP BY lang ORDER BY lang"""

  /** DuckDB fragment: exact n-token-shingle Jaccard pairs ≥ threshold.
    * Any pair with J > 0 shares a shingle, so the inverted-index join is
    * exact; Jaccard is a ratio of exact integers — no float drift.
    */
  private def jaccardOracle(n: Int, threshold: String, table: String = "documents"): String = {
    val last = n - 1
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM $table),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+$last], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${last - 1})) AS i FROM toks WHERE len(t) >= $n)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold
ORDER BY doc_id_a, doc_id_b"""
  }

  /** MinHash + LSH banding for candidates, exact 5-shingle Jaccard ≥ 0.8
    * for membership (128 hashes, bands of 4: miss prob ≈ 5e-8 at J=0.8).
    */
  def q16_minhash_neardup(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashNearDup(docs(s, dir), shingleN = 5, threshold = 0.8)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_id_a", "doc_id_b")

  val q16Sql: String = jaccardOracle(5, "0.8")

  /** Exact trigram Jaccard near-dup at a low threshold — the inverted-
    * index path where LSH would be too lossy.
    */
  def q19_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.1)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_id_a", "doc_id_b")

  val q19Sql: String = jaccardOracle(3, "0.1")

  /** EXACT 5-gram Jaccard at the production dedup threshold (τ=0.8, the
    * same regime as q16's MinHash), via the prefix-filtered set-
    * similarity join: the index holds only each doc's (1−τ)·n+1 RAREST
    * shingles (global df order), so candidate generation rides the rare
    * tail of the df distribution instead of every posting list — the
    * deterministic exact alternative to LSH when the tail exists (it
    * does for organic corpora and for this table's 5-grams; SCALING.md
    * discusses when it does not). Oracle = the same SQL shape as
    * q16/q19; results carry no trace of the pruning.
    */
  def q90_jaccard_prefix(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsPrefix(docs(s, dir), shingleN = 5, threshold = 0.8)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_id_a", "doc_id_b")

  val q90Sql: String = jaccardOracle(5, "0.8")

  def q21_simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(docs(s, dir)).orderBy("doc_id")

  /** DuckDB fragment: the portable polynomial hash of a string expression.
    * Mirrors PortableHash.asciiPolyHash: fold(0, h*31 + ascii) mod 1e9+7.
    */
  private[queries] def polyHashSql(strExpr: String): String =
    raw"""list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(list_filter(string_split($strExpr, ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))),
  (a, b) -> (a * 31 + b) % 1000000007)"""

  val q21Sql: String =
    raw"""WITH toks AS (SELECT DISTINCT doc_id, unnest($ToksSql) AS tok FROM documents),
h AS (SELECT doc_id, ${polyHashSql("tok")} AS hv FROM toks),
bits AS (SELECT doc_id, hv, unnest(range(0, 32)) AS bit FROM h),
sums AS (SELECT doc_id, bit, sum(CASE WHEN (hv >> CAST(bit AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
         FROM bits GROUP BY doc_id, bit)
SELECT doc_id,
       CAST(sum(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
FROM sums GROUP BY doc_id ORDER BY doc_id"""

  /** Near-duplicate CLUSTERS: connected components over the q19 pair
    * graph (trigram Jaccard ≥ 0.1), every member labeled with its
    * cluster's minimum doc_id — the representative a dedup pipeline
    * keeps. Iterative min-label propagation (one keyed join per round,
    * diameter-bounded); the oracle recomputes the same labels with a
    * recursive reachability CTE.
    */
  def q46_dup_clusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.1)
    val cc = graft.operators.ConnectedComponents.run(pairs, "doc_id_a", "doc_id_b")
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, Seq("cluster"))
      .select(col("node").as("doc_id"), col("cluster"), col("n_members"))
      .orderBy("doc_id")
  }

  val q46Sql: String =
    raw"""WITH RECURSIVE pairs AS (${jaccardOracle(3, "0.1")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM n
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, count(*) AS n_members FROM c GROUP BY cluster)
SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster) ORDER BY c.doc_id"""

  /** q46's clustering through the LOG-DEPTH connected-components variant
    * (large-star/small-star, ConnectedComponents.runAlternating) — same
    * output contract, same oracle, different round complexity: O(log² n)
    * rounds instead of graph-diameter, the variant a 100 TB pipeline
    * picks when cluster chains can run deep (e.g. transitive MinHash
    * matches across a crawl).
    */
  def q55_dup_clusters_star(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.1)
    val cc = graft.operators.ConnectedComponents.runAlternating(pairs, "doc_id_a", "doc_id_b")
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, Seq("cluster"))
      .select(col("node").as("doc_id"), col("cluster"), col("n_members"))
      .orderBy("doc_id")
  }

  val q55Sql: String = q46Sql

  /** Duplicate clustering at the PRODUCTION threshold: connected
    * components over the prefix-filtered exact τ=0.8 pair graph (q90's
    * operator) — the composition a 100 TB dedup job actually runs.
    * Unlike q46/q55/q65 (which deliberately stress the dense τ=0.1
    * graph), both the pair generation and the cluster graph here stay
    * near-linear in the corpus (SCALING.md).
    */
  def q91_dup_clusters_prefix(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairsPrefix(docs(s, dir), shingleN = 5, threshold = 0.8)
    val cc = graft.operators.ConnectedComponents.run(pairs, "doc_id_a", "doc_id_b")
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, Seq("cluster"))
      .select(col("node").as("doc_id"), col("cluster"), col("n_members"))
      .orderBy("doc_id")
  }

  /** The pair family's document-frequency CEILING (q233/q234): shingles
    * with df above this are dropped BEFORE pairing. Evidence-based with
    * the q98 headroom rule: measured max trigram-shingle df is 9 / 7 /
    * 25 at sf0.001 / sf0.01 / sf0.1 (DuckDB, round 14), so 96 gives
    * ≥3.8× headroom at every gate scale — the cap binds NOTHING there
    * and the output is hash-identical to the uncapped twin's universe —
    * while on a replica corpus (df ≈ base × factor; ~800 max at 32×) it
    * bounds per-shingle pair work at 96²/2 and total candidate pairs at
    * 48·|postings|, linear in the corpus.
    */
  val PairDfCeiling = 96

  /** df-capped Jaccard-pair oracle fragment: [[jaccardOracle]] with the
    * ceiling applied before sizes/intersections, mirroring
    * Dedup.ngramJaccardPairsCapped exactly.
    */
  private def jaccardOracleCapped(n: Int, threshold: String, maxDf: Int): String = {
    val last = n - 1
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+$last], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${last - 1})) AS i FROM toks WHERE len(t) >= $n)),
keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $maxDf),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
           FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold
ORDER BY doc_id_a, doc_id_b"""
  }

  /** q46's dense-threshold (τ=0.1) near-dup clustering behind the df
    * CEILING — the capacity-aware companion that gives the family a
    * runnable 100 TB shape (round-13 verdict item 4). q46/q55 are
    * semantically output-quadratic when duplicate families are large
    * (they're the audited 32×-sweep exclusions); this entry keeps their
    * cluster contract — CC over the τ=0.1 trigram pair graph, min-id
    * representative — but computes Jaccard over the df-capped shingle
    * universe, so pair work is bounded at [[PairDfCeiling]]·|postings|/2
    * no matter how hot a boilerplate shingle runs. At every gate scale
    * the cap binds nothing (see [[PairDfCeiling]]) and the output equals
    * q46's; the oracle replays the identical bound.
    */
  def q233_dup_clusters_capped(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairsCapped(docs(s, dir), shingleN = 3, threshold = 0.1,
      maxDf = PairDfCeiling)
    val cc = graft.operators.ConnectedComponents.run(pairs, "doc_id_a", "doc_id_b")
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, Seq("cluster"))
      .select(col("node").as("doc_id"), col("cluster"), col("n_members"))
      .orderBy("doc_id")
  }

  val q233Sql: String =
    raw"""WITH RECURSIVE pairs AS (${jaccardOracleCapped(3, "0.1", PairDfCeiling)}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM n
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, count(*) AS n_members FROM c GROUP BY cluster)
SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster) ORDER BY c.doc_id"""

  val q91Sql: String =
    raw"""WITH RECURSIVE pairs AS (${jaccardOracle(5, "0.8")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM n
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, count(*) AS n_members FROM c GROUP BY cluster)
SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster) ORDER BY c.doc_id"""

  /** Benchmark-decontamination shape: cross-SOURCE 8-token-shingle
    * overlap — the standard check that training documents don't contain
    * eval/benchmark text (here: any other source's text). Candidates
    * come from an inverted-index equi-join on the shingle (never a doc
    * pair scan), restricted to pairs from different sources. The
    * document-frequency cap is the scale guard: a shingle shared by
    * hundreds of docs is boilerplate, not contamination, and is exactly
    * the hot key that would turn the shingle self-join quadratic at
    * 100 TB — drop it BEFORE pairing (standard practice, e.g. df-capped
    * n-gram decontamination in public LLM data recipes).
    */
  def q54_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val maxDf = 25
    val sh = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(Text.shingles(Text.tokens(col("text")), 8)).as("sh"))
    // shingles are distinct per doc, so count(*) per shingle == doc frequency
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val kept = sh.join(rare, Seq("sh"), "left_semi")
    val a = kept.select(col("sh"), col("doc_id").as("doc_id_a"), col("source").as("source_a"))
    val b = kept.select(col("sh"), col("doc_id").as("doc_id_b"), col("source").as("source_b"))
    a.join(b, Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("doc_id_a", "doc_id_b", "source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id_a", "doc_id_b")
  }

  val q54Sql: String =
    raw"""WITH toks AS (SELECT doc_id, source, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, source, array_to_string(t[i:i+7], ' ') AS s
       FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - 6)) AS i FROM toks WHERE len(t) >= 8)),
rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 25),
kept AS (SELECT sh.* FROM sh JOIN rare USING (s))
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       a.source AS source_a, b.source AS source_b, count(*) AS n_shared
FROM kept a JOIN kept b ON a.s = b.s AND a.source < b.source
GROUP BY 1, 2, 3, 4 ORDER BY doc_id_a, doc_id_b"""

  /** Fuzzy key matching (record linkage), SymSpell-style: every unordered
    * pair of distinct customer names at Levenshtein distance ≤ 1 — the
    * near-key detection an entity-resolution pass runs before merging
    * records. Candidates come from the deletion neighborhood: each name
    * keys on itself plus its |w| single-character deletions, and any
    * distance-1 pair provably shares a key (substitution: both delete
    * the edited position; insert/delete: the longer name's deletion hits
    * the shorter name itself) — so pairing is an equi-join on the
    * variant, O(names × name_len) keys, never a name cross join. The
    * join can surface distance-2 collisions ("ab"/"ba" share deletion
    * "a"), so exact levenshtein verifies membership — the same
    * candidates-then-exact shape as MinHash (q16). The oracle
    * brute-forces the (sf0.01-sized) name set; at 100 TB only the
    * blocked join survives, and the blocking key count is the tunable
    * (depth-d deletions catch distance ≤ d).
    */
  def q64_typo_pairs(s: SparkSession, dir: String): DataFrame = {
    // Round-robin respread after the tiny distinct: AQE coalesces the
    // 15k-row exchange to one partition (it optimizes for shuffle BYTES,
    // blind to downstream per-row cost), which would run the ×|w|
    // deletion explode, the candidate join AND the levenshtein verify on
    // a single task (measured 5× slower end-to-end at sf0.1). Must be
    // round-robin: a repartition on the distinct key is elided as
    // redundant with the distinct's own exchange and re-coalesced.
    val words = Tables(s, dir, "customer")
      .select(col("c_name").as("word"))
      .distinct()
      .repartition(s.sparkContext.defaultParallelism)
    val keyed = words.select(col("word"), explode(expr(
      """array_union(
           transform(sequence(1, length(word)),
                     i -> concat(substring(word, 1, i - 1), substring(word, i + 1, 1000000))),
           array(word))""")).as("k"))
    keyed.as("a").join(keyed.as("b"), "k")
      .filter(col("a.word") < col("b.word"))
      .select(col("a.word").as("w1"), col("b.word").as("w2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
      .select(col("w1"), col("w2"), levenshtein(col("w1"), col("w2")).cast("long").as("dist"))
      .orderBy("w1", "w2")
  }

  val q64Sql: String =
    raw"""WITH v AS (SELECT DISTINCT c_name AS word FROM customer)
SELECT a.word AS w1, b.word AS w2, CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
FROM v a JOIN v b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 1
ORDER BY w1, w2"""

  /** Per-document triangle participation in the near-duplicate graph
    * (q19's trigram-Jaccard ≥ 0.1 edges) — the local clustering signal
    * that separates dense duplicate cliques from incidental chains.
    * Edges are already oriented (a < b), so each triangle x<y<z is
    * enumerated exactly once by two keyed self-joins ((x,y)⋈(y,z) on y,
    * then closing (x,z)) — the standard compact-forward join, never an
    * open two-path explosion against unordered edges. All joins are
    * equi-joins on node ids; at scale the orientation would be by degree
    * (low→high) to bound the join fan-out by arboricity.
    */
  def q65_triangles(s: SparkSession, dir: String): DataFrame = {
    // The edge set feeds three join branches; without materialization
    // each branch would re-run the whole shingle inverted-index pipeline
    // (3x the dominant cost — measured). The edge list itself is tiny
    // (pairs surviving J >= 0.1), so pinning it is O(edges), not O(input).
    val e = Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.1)
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
      .localCheckpoint()
    val exy = e.select(col("a").as("x"), col("b").as("y"))
    val eyz = e.select(col("a").as("y"), col("b").as("z"))
    val exz = e.select(col("a").as("x"), col("b").as("z"))
    exy.join(eyz, Seq("y")).join(exz, Seq("x", "z"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  val q65Sql: String =
    raw"""WITH pairs AS (${jaccardOracle(3, "0.1")}),
e AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
n AS (SELECT unnest([x, y, z]) AS doc_id FROM tri)
SELECT doc_id, count(*) AS n_triangles FROM n GROUP BY doc_id ORDER BY doc_id"""

  /** Asymmetric near-dup: shingle CONTAINMENT |A∩B| / |A| — the measure
    * that catches a document embedded inside a larger one, where
    * symmetric Jaccard stays low (the quote-a-whole-article case Jaccard
    * dedup misses). Same inverted-index candidate join as q19 (any pair
    * with overlap shares a shingle), emitted per ordered direction; the
    * ratio is exact-integer arithmetic.
    */
  def q72_containment(s: SparkSession, dir: String): DataFrame = {
    // Respread before shingling: the single-row-group fixture file scans
    // as ONE split, and this query fans the shingle frame into BOTH
    // sides of a self-join before any shuffle can restore parallelism
    // (measured 3.5s -> 2.0s at sf0.1; no-op on well-split inputs).
    val sh = graft.operators.Respread.ifCoarse(docs(s, dir))
      .select(col("doc_id"), explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("sh"), col("doc_id").as("doc_id_a"))
    val b = sh.select(col("sh"), col("doc_id").as("doc_id_b"))
    val common = a.join(b, Seq("sh"))
      .filter(col("doc_id_a") =!= col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_id_a"), Seq("doc_id_a"))
      .filter(col("c").cast("double") / col("n") >= 0.5)
      .select(col("doc_id_a"), col("doc_id_b"),
        round(col("c").cast("double") / col("n"), 6).as("containment"))
      .orderBy("doc_id_a", "doc_id_b")
  }

  val q72Sql: String =
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks WHERE len(t) >= 3)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b, round(CAST(c AS DOUBLE) / sa.n, 6) AS containment
FROM common JOIN sizes sa ON sa.doc_id = doc_id_a
WHERE CAST(c AS DOUBLE) / sa.n >= 0.5
ORDER BY doc_id_a, doc_id_b"""

  /** q72's containment behind the df CEILING — the capacity-aware
    * companion for the containment family (round-13 verdict item 4,
    * same treatment as q233): shingles hotter than [[PairDfCeiling]]
    * are dropped before the inverted-index pair join, and |A∩B| / |A|
    * is computed over the surviving shingle universe — both engines
    * apply the identical bound, and at every gate scale the cap binds
    * nothing (measured max df 9/7/25 vs ceiling 96), so the output
    * equals q72's. On a replica corpus the uncapped join is quadratic
    * in the hottest shingle's df; here total pair work is bounded at
    * ceiling·|postings|/2 — the shape a 100 TB embedded-document scan
    * actually runs.
    */
  def q234_containment_capped(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.operators.Respread.ifCoarse(docs(s, dir))
      .select(col("doc_id"), explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
    // shingles are distinct per doc, so count per shingle == doc frequency
    val keep = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= PairDfCeiling).select("sh")
    val kept = sh.join(keep, Seq("sh"), "left_semi").persist()
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = kept.select(col("sh"), col("doc_id").as("doc_id_a"))
    val b = kept.select(col("sh"), col("doc_id").as("doc_id_b"))
    val common = a.join(b, Seq("sh"))
      .filter(col("doc_id_a") =!= col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_id_a"), Seq("doc_id_a"))
      .filter(col("c").cast("double") / col("n") >= 0.5)
      .select(col("doc_id_a"), col("doc_id_b"),
        round(col("c").cast("double") / col("n"), 6).as("containment"))
      .orderBy("doc_id_a", "doc_id_b")
  }

  val q234Sql: String =
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks WHERE len(t) >= 3)),
keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $PairDfCeiling),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
           FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b, round(CAST(c AS DOUBLE) / sa.n, 6) AS containment
FROM common JOIN sizes sa ON sa.doc_id = doc_id_a
WHERE CAST(c AS DOUBLE) / sa.n >= 0.5
ORDER BY doc_id_a, doc_id_b"""

  /** Rolling-hash document fingerprint over the normalized token stream. */
  def q25_fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        PortableHash.asciiPolyHash(concat_ws(" ", Text.tokens(col("text")))).as("fingerprint"))
      .orderBy("doc_id")

  val q25Sql: String =
    raw"""SELECT doc_id, ${polyHashSql(s"array_to_string($ToksSql, ' ')")} AS fingerprint
FROM documents ORDER BY doc_id"""

  /** Incremental ingest dedup — the production shape of "dedup a new
    * crawl against the existing corpus": the batch (docs with
    * doc_id ≡ 3 mod 4, standing in for the new arrivals) keeps only
    * documents that are novel against BOTH the existing corpus (digest
    * anti-join) and the batch itself (min-id per digest), in one plan.
    * Everything shuffles 32-byte sha2 digests keyed by content — the
    * payload text never moves, and the existing-corpus side needs only
    * its digest column read (at 100 TB: a digest column/index scan, not
    * a corpus scan). The oracle expresses the same semantics with raw
    * text equality — digest-join vs text-equality is exactly the
    * injectivity the exact-dedup family rests on.
    */
  def q100_ingest_novel(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"),
      sha2(col("text"), 256).as("dg"), pmod(col("doc_id"), lit(4)).as("m"))
    val existing = d.filter(col("m") =!= 3).select("dg")
    val batch = d.filter(col("m") === 3)
    val novel = batch.join(existing, Seq("dg"), "left_anti")
    val keep = novel.groupBy("dg").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    novel.join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val q100Sql: String =
    """WITH b AS (SELECT doc_id, lang, n_chars, text FROM documents WHERE (doc_id % 4 + 4) % 4 = 3),
ex AS (SELECT DISTINCT text FROM documents WHERE (doc_id % 4 + 4) % 4 <> 3),
novel AS (SELECT b.* FROM b ANTI JOIN ex ON b.text = ex.text),
kept AS (SELECT doc_id, lang, n_chars,
                row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM novel)
SELECT doc_id, lang, n_chars FROM kept WHERE rn = 1 ORDER BY doc_id"""

  /** q100's NEAR-dup companion: the new batch screened against the
    * existing corpus for high-overlap (not just identical) documents,
    * via the ASYMMETRIC prefix-filter exact Jaccard join
    * (Dedup.crossJaccardPrefix) — the production ingest screen, where
    * the corpus-side prefix index is the incrementally-maintained
    * artifact and each batch only probes it. Exact (prefix filtering
    * never loses a pair; full sets verify), so the oracle recomputes
    * raw cross-side shingle Jaccard with no reference to the pruning.
    */
  def q101_ingest_neardup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("m", pmod(col("doc_id"), lit(4)))
    val existing = d.filter(col("m") =!= 3).select("doc_id", "text")
    val batch = d.filter(col("m") === 3).select("doc_id", "text")
    Dedup.crossJaccardPrefix(existing, batch, shingleN = 5, threshold = 0.5)
      .select(col("new_id"), col("existing_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("new_id", "existing_id")
  }

  val q101Sql: String =
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM toks WHERE len(t) >= 5)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS existing_id, b.doc_id AS new_id, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s
           WHERE (a.doc_id % 4 + 4) % 4 <> 3 AND (b.doc_id % 4 + 4) % 4 = 3
           GROUP BY 1, 2)
SELECT new_id, existing_id, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = existing_id
JOIN sizes sb ON sb.doc_id = new_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
ORDER BY new_id, existing_id"""

  /** q72's scale path: the same containment measure at a production
    * threshold through the ONE-SIDED prefix filter
    * (Dedup.containmentPrefix) — only the contained side probes, with
    * its rarest (1−τ)·|a|+1 shingles, while the index side stays full;
    * exact by the same pigeonhole argument as the Jaccard prefixes.
    * 5-gram shingles because prefix filtering needs a df tail to ride
    * (SCALING.md: trigrams on this vocabulary have none).
    */
  def q102_containment_prefix(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPrefix(graft.operators.Respread.ifCoarse(docs(s, dir)),
        shingleN = 5, threshold = 0.6)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("containment"), 6).as("containment"))
      .orderBy("doc_id_a", "doc_id_b")

  val q102Sql: String =
    raw"""WITH toks AS (SELECT doc_id, $ToksSql AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM toks WHERE len(t) >= 5)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b, round(CAST(c AS DOUBLE) / sa.n, 6) AS containment
FROM common JOIN sizes sa ON sa.doc_id = doc_id_a
WHERE CAST(c AS DOUBLE) / sa.n >= 0.6
ORDER BY doc_id_a, doc_id_b"""

  /** Repeated-span audit (the ExactSubstr motivation of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): for
    * every document, the fraction of its 10-token sliding windows that
    * also occur in at least one OTHER document. Docs past 20% duplicated
    * spans are flagged — the span-level signal that catches boilerplate
    * and partial copies which whole-document dedup (q15) and near-dup
    * (q16/q90) both miss.
    *
    * Scale shape: each window is hashed to one i64 BEFORE the explode
    * (the native single-pass WindowHashes expression: per-token portable
    * poly hash, then a w-token fold — the nested-HOF spelling of the
    * same arithmetic was 40× slower), so the shuffle carries
    * (doc_id, window_hash) pairs — the text never enters a join or
    * shuffle key. Window df is a hash-keyed groupBy with map-side
    * partial aggregation; the dup-window count rejoins per-doc by a
    * semi-join on the 8-byte key. At 100 TB this is the same plan with
    * more partitions; window keys share the 1e9+7 modulus, so ~n²/2M
    * windows collide spuriously (deterministic, oracle-replayed) — a
    * production audit swaps the key for a 128-bit digest, which only
    * widens the shuffle key. (ref `verify.py:1` scope: the reference
    * has no span-level operator — §2.C extension ground.)
    */
  def q131_span_dedup(s: SparkSession, dir: String): DataFrame = {
    val W = 10
    // Two-level hash: each token hashed once (portable poly hash), then
    // each window is a 10-element fold over the token hashes — W longs
    // per window instead of ~6W characters, which is what keeps the
    // interpreted HOF cost linear in tokens rather than characters.
    // Window keys share the 1e9+7 modulus, so ~n²/2M windows collide
    // spuriously (deterministically — the oracle replays the identical
    // arithmetic); a production audit at 100 TB swaps the key for a
    // 128-bit digest, which only widens the shuffle key.
    val base = docs(s, dir).select(col("doc_id"),
      org.apache.spark.sql.graft.WindowHashes.windowHashes(
        Text.tokens(col("text")), W).as("whs"))
    val win = base.select(col("doc_id"), explode(col("whs")).as("h"))
    val dupKeys = win.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val dupPerDoc = win.join(dupKeys, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
    base.select(col("doc_id"), size(col("whs")).cast("long").as("n_windows"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_windows", coalesce(col("n_dup_windows"), lit(0L)))
      .withColumn("dup_frac",
        round(when(col("n_windows") === 0, lit(0.0))
          .otherwise(col("n_dup_windows").cast("double") / col("n_windows")), 6))
      .withColumn("verdict", when(col("dup_frac") >= 0.2, lit("flag")).otherwise(lit("keep")))
      .select("doc_id", "n_windows", "n_dup_windows", "dup_frac", "verdict")
      .orderBy("doc_id")
  }

  val q131Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
th AS (SELECT doc_id, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT doc_id,
             CASE WHEN len(hh) >= 10
                  THEN list_transform(range(0, len(hh) - 10 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 10)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
e AS (SELECT doc_id, unnest(whs) AS h FROM w),
dk AS (SELECT h FROM e GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
du AS (SELECT e.doc_id, count(*) AS n_dup FROM e JOIN dk USING (h) GROUP BY e.doc_id),
tot AS (SELECT doc_id, len(whs) AS n_windows FROM w),
f AS (SELECT t.doc_id, CAST(t.n_windows AS BIGINT) AS n_windows,
             CAST(coalesce(du.n_dup, 0) AS BIGINT) AS n_dup_windows,
             round(CASE WHEN t.n_windows = 0 THEN 0.0
                        ELSE CAST(coalesce(du.n_dup, 0) AS DOUBLE) / t.n_windows END, 6) AS dup_frac
      FROM tot t LEFT JOIN du USING (doc_id))
SELECT doc_id, n_windows, n_dup_windows, dup_frac,
       CASE WHEN dup_frac >= 0.2 THEN 'flag' ELSE 'keep' END AS verdict
FROM f ORDER BY doc_id"""

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007) over the PRODUCTION near-dup pair graph (q91's τ=0.8
    * prefix-filtered edges): three fixed rounds where each node adopts
    * the most frequent label among its neighbors (ties → smallest
    * label), then a per-community size report. Beside min-label CC
    * (q46/q55/q91 — "same content" transitive closure) this is the
    * OTHER graph grouping a curation pipeline runs: density-sensitive
    * communities (template families, boilerplate clusters) rather than
    * exact-duplicate closure, converging in O(rounds), not O(diameter).
    *
    * Scale shape: the edge list is pair-graph-sized (sparse — the
    * prefix filter guarantees only true near-dup pairs), each round is
    * one keyed equi-join + two partial-aggregated groupBys, and the
    * deterministic argmax is min(struct(-cnt, lbl)) — no window over
    * node neighborhoods, no driver loop state beyond the 3-round
    * counter. Fixed rounds (not run-to-convergence) is the documented
    * production choice: LP label oscillation means convergence is not
    * guaranteed under synchronous update, so bounded rounds + the size
    * report is the honest contract.
    */
  def q144_label_prop(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairsPrefix(docs(s, dir), shingleN = 5, threshold = 0.8)
      .select(col("doc_id_a").as("s"), col("doc_id_b").as("d"))
    val e = pairs.unionByName(pairs.select(col("d").as("s"), col("s").as("d")))
      .localCheckpoint() // edge list is tiny; pinning avoids 6 re-runs of the prefix pipeline
    var labels = e.select(col("s").as("node")).distinct().withColumn("lbl", col("node"))
    (1 to 3).foreach { _ =>
      labels = e.join(labels.withColumnRenamed("node", "d"), Seq("d"))
        .groupBy(col("s"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("s"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("s").as("node"), col("m.l").as("lbl"))
        .localCheckpoint() // flat lineage per round (the CC/PageRank hygiene)
    }
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("lbl"))
      .select(col("node").as("doc_id"), col("lbl").as("community"), col("n_members"))
      .orderBy("doc_id")
  }

  /** One synchronous LP round in SQL: neighbor-label counts, then the
    * (cnt DESC, lbl) argmax — the row_number twin of the engine's
    * min(struct(-cnt, lbl)).
    */
  private def lpRoundSql(n: Int, prev: String): String =
    raw"""c$n AS (SELECT e.s, l.lbl, count(*) AS cnt FROM e JOIN $prev l ON l.node = e.d GROUP BY e.s, l.lbl),
l$n AS (SELECT s AS node, lbl FROM (
         SELECT s, lbl, row_number() OVER (PARTITION BY s ORDER BY cnt DESC, lbl) AS rn FROM c$n)
       WHERE rn = 1)"""

  val q144Sql: String =
    raw"""WITH pairs AS (${jaccardOracle(5, "0.8")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
l0 AS (SELECT DISTINCT s AS node, s AS lbl FROM e),
${lpRoundSql(1, "l0")},
${lpRoundSql(2, "l1")},
${lpRoundSql(3, "l2")},
sz AS (SELECT lbl, count(*) AS n_members FROM l3 GROUP BY lbl)
SELECT l3.node AS doc_id, l3.lbl AS community, sz.n_members
FROM l3 JOIN sz USING (lbl) ORDER BY doc_id"""

  /** Span REMOVAL — the ExactSubstr-style TRANSFORM q131 only audits
    * (Lee et al. 2022's deduplicate-the-span, not the document): every
    * 10-token window whose hash occurs anywhere else in the corpus —
    * other documents OR earlier in the same document — is a duplicate
    * span; the globally-first occurrence by (doc_id, pos) is kept,
    * every other occurrence is dropped, and the surviving token stream
    * is reconstructed deterministically (a token survives iff no
    * removed window covers it; survivors single-space-joined — the
    * operator is defined on the tokenized view, like q131). The output
    * carries the reconstructed text itself, so the gate hash-compares
    * the actual transform, not a summary.
    *
    * Scale shape: occurrence marking is the q131 shuffle (W longs per
    * window key, payload never in the key); the keep-first rule is one
    * partial-aggregated min(struct(doc_id, pos)) per hash; removal
    * starts flow back as a doc_id-keyed equi-join (AQE broadcasts the
    * removal table when small); reconstruction is per-row HOFs over
    * the already-resident token array — no token ever shuffles twice.
    * Window-key collisions share q131's 1e9+7 caveat: deterministic,
    * oracle-replayed, and a 128-bit digest at production scale.
    */
  def q149_span_removal(s: SparkSession, dir: String): DataFrame =
    Dedup.removeSpans(
      docs(s, dir).select(col("doc_id"), col("text")), w = 10)
      .orderBy("doc_id")

  /** Replays the keep-first rule exactly: row_number over (doc_id, pos)
    * per window hash — rn=1 is the kept occurrence, rn>1 occurrences
    * (which only exist for repeated hashes) mark their token range
    * removed; the indexed list_filter mirrors Spark's 0-based filter
    * HOF (DuckDB j is 1-based, hence j−1).
    */
  val q149Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
th AS (SELECT doc_id, tk, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT doc_id, tk,
             CASE WHEN len(hh) >= 10
                  THEN list_transform(range(0, len(hh) - 10 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 10)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
occ AS (SELECT doc_id, i AS pos, whs[i + 1] AS h
        FROM (SELECT doc_id, whs, unnest(range(0, len(whs))) AS i FROM w)),
rk AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       FROM occ),
rem AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
        FROM rk WHERE rn > 1 GROUP BY doc_id),
f AS (SELECT w.doc_id, w.tk, coalesce(rem.starts, CAST([] AS BIGINT[])) AS starts
      FROM w LEFT JOIN rem USING (doc_id)),
k AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             list_filter(tk, (tok, j) ->
               len(list_filter(starts, st -> st <= j - 1 AND j - 1 < st + 10)) = 0) AS kept
      FROM f)
SELECT doc_id, n_tokens, CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM k ORDER BY doc_id"""

  /** Span-level INGEST dedup — the q100 (exact) / q101 (near-dup)
    * family's third member: the new crawl batch (doc_id ≡ 3 mod 4, the
    * family's split convention) is span-cleaned against the existing
    * corpus AND itself via Dedup.removeSpansIngest — existing windows
    * always win, so appending the cleaned batch introduces no span the
    * corpus already holds; batch-internal duplicates keep first.
    * Output is the REWRITTEN batch text, gate-hashed like q149.
    */
  def q158_span_ingest(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("m", pmod(col("doc_id"), lit(4)))
    Dedup.removeSpansIngest(
      d.filter(col("m") =!= 3).select("doc_id", "text"),
      d.filter(col("m") === 3).select("doc_id", "text"), w = 10)
      .orderBy("doc_id")
  }

  /** q149's replay with a priority column: ranking per window hash is
    * (pri, doc_id, pos) with existing = pri 0, and only pri-1 (batch)
    * non-first occurrences mark removals; only batch docs reconstruct.
    */
  val q158Sql: String =
    raw"""WITH t AS (SELECT doc_id, CASE WHEN (doc_id % 4 + 4) % 4 = 3 THEN 1 ELSE 0 END AS pri,
                 $ToksSql AS tk FROM documents),
th AS (SELECT doc_id, pri, tk, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT doc_id, pri, tk,
             CASE WHEN len(hh) >= 10
                  THEN list_transform(range(0, len(hh) - 10 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 10)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
occ AS (SELECT doc_id, pri, i AS pos, whs[i + 1] AS h
        FROM (SELECT doc_id, pri, whs, unnest(range(0, len(whs))) AS i FROM w)),
rk AS (SELECT doc_id, pri, pos,
              row_number() OVER (PARTITION BY h ORDER BY pri, doc_id, pos) AS rn
       FROM occ),
rem AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
        FROM rk WHERE pri = 1 AND rn > 1 GROUP BY doc_id),
f AS (SELECT w.doc_id, w.tk, coalesce(rem.starts, CAST([] AS BIGINT[])) AS starts
      FROM w LEFT JOIN rem USING (doc_id) WHERE w.pri = 1),
k AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             list_filter(tk, (tok, j) ->
               len(list_filter(starts, st -> st <= j - 1 AND j - 1 < st + 10)) = 0) AS kept
      FROM f)
SELECT doc_id, n_tokens, CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM k ORDER BY doc_id"""

  /** BENCHMARK DECONTAMINATION against a HELD-OUT SET (the GPT-3
    * appendix-C / PaLM convention: drop any training document sharing
    * an n-gram with the evaluation set). q54 is the PAIRWISE form of
    * this family — it emits contaminated (train, train) doc pairs via
    * a df-capped shingle self-join; this entry is the other production
    * shape: one bounded EVAL fingerprint checked against the whole
    * corpus, no pair generation at all. Docs with doc_id ≡ 0 (mod 97)
    * stand in for the held-out benchmark; every other document is
    * audited for 8-token windows that also occur anywhere in the eval
    * set, and any overlap at all is a 'drop' — the any-hit rule,
    * because a single shared 8-gram of benchmark text in training data
    * is leakage, not coincidence. The report keeps every training doc
    * (hit or not): the 0-hit rows are the evidence the sweep ran over
    * the whole corpus, and hit_frac separates verbatim inclusions
    * (≈1.0) from quoted fragments.
    *
    * Scale shape: both sides hash windows to one i64 BEFORE any join
    * (the q131 native WindowHashes single-pass expression — text never
    * enters a shuffle key). The eval side is benchmark-sized by nature
    * — thousands of documents regardless of corpus scale — so its
    * distinct window-hash set BROADCASTS and the contamination check
    * is a broadcast LEFT SEMI join per window occurrence: the corpus
    * scan never shuffles at all; only the per-doc hit counts (doc_id,
    * count) move. At 100 TB this is one pass over the corpus + a
    * broadcast of the eval fingerprint — the cheapest possible shape
    * for the operator. Same 1e9+7-modulus collision caveat as q131
    * (deterministic, oracle-replayed; production swaps in a 128-bit
    * digest, which only widens the broadcast).
    */
  def q164_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val W = 8
    val base = docs(s, dir).select(col("doc_id"),
      org.apache.spark.sql.graft.WindowHashes.windowHashes(
        Text.tokens(col("text")), W).as("whs"))
    val win = base.select(col("doc_id"), explode(col("whs")).as("h"))
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val evalHashes = win.filter(isEval).select("h").distinct()
    val hits = win.filter(!isEval)
      .join(broadcast(evalHashes), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    base.filter(!isEval)
      .select(col("doc_id"), size(col("whs")).cast("long").as("n_windows"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_frac",
        round(when(col("n_windows") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_windows")), 6))
      .withColumn("verdict", when(col("n_hits") > 0, lit("drop")).otherwise(lit("keep")))
      .select("doc_id", "n_windows", "n_hits", "hit_frac", "verdict")
      .orderBy("doc_id")
  }

  /** q131's window-hash replay at W = 8 with the mod-97 eval split:
    * eval-side distinct hashes, per-training-doc hit counts, any-hit
    * verdict.
    */
  val q164Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
th AS (SELECT doc_id, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT doc_id,
             CASE WHEN len(hh) >= 8
                  THEN list_transform(range(0, len(hh) - 8 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 8)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
e AS (SELECT doc_id, unnest(whs) AS h FROM w),
ev AS (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
hits AS (SELECT e.doc_id, count(*) AS n_hits FROM e JOIN ev USING (h)
         WHERE e.doc_id % 97 <> 0 GROUP BY e.doc_id),
tot AS (SELECT doc_id, CAST(len(whs) AS BIGINT) AS n_windows FROM w WHERE doc_id % 97 <> 0)
SELECT t.doc_id, t.n_windows, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CASE WHEN t.n_windows = 0 THEN 0.0
                  ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / t.n_windows END, 6) AS hit_frac,
       CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 'drop' ELSE 'keep' END AS verdict
FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id"""

  /** MULTI-BENCHMARK decontamination with per-benchmark ATTRIBUTION —
    * the production form of q164: a training corpus is screened against
    * a SUITE of eval benchmarks at once, and a contaminated document is
    * reported per benchmark it hits (the attribution a data card /
    * contamination appendix needs: WHICH eval leaked, not just "some
    * eval"). Here the mod-97 eval docs split into 3 synthetic
    * benchmarks by (doc_id / 97) mod 3; W = 4 (vs q164's 8) because
    * the synthetic corpus has no verbatim 8-gram leakage — the
    * shorter window manufactures real cross-doc hits at every scale
    * (8 pairs at the gate, 772 at sf0.1), so the attribution
    * machinery is gated on non-trivial content.
    *
    * Scale shape: the fingerprint is the distinct (benchmark, window
    * hash) table — suite-sized (benchmarks are small by nature), so it
    * BROADCASTS like q164's single set, and the corpus-side windows
    * stream through one broadcast inner join; per-(doc, benchmark)
    * counts aggregate ONLY the hit rows (contamination-incidence-sized,
    * not corpus-sized). A doc contaminated by two benchmarks appears
    * twice — the point of attribution. Output is the contaminated-pair
    * table (bounded by incidence), ordered.
    */
  def q188_decontam_multi(s: SparkSession, dir: String): DataFrame = {
    val W = 4
    val base = docs(s, dir).select(col("doc_id"),
      org.apache.spark.sql.graft.WindowHashes.windowHashes(
        Text.tokens(col("text")), W).as("whs"))
    val win = base.select(col("doc_id"), explode(col("whs")).as("h"))
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val evalHashes = win.filter(isEval)
      .select(pmod(expr("doc_id div 97"), lit(3)).cast("int").as("benchmark"), col("h"))
      .distinct()
    val hits = win.filter(!isEval)
      .join(broadcast(evalHashes), Seq("h"))
      .groupBy("doc_id", "benchmark").agg(count(lit(1)).as("n_hits"))
    val nw = base.filter(!isEval)
      .select(col("doc_id"), size(col("whs")).cast("long").as("n_windows"))
    hits.join(nw, Seq("doc_id"))
      .select(col("doc_id"), col("benchmark"), col("n_hits"), col("n_windows"),
        round(col("n_hits").cast("double") / col("n_windows"), 6).as("hit_frac"))
      .orderBy("doc_id", "benchmark")
  }

  /** q164's window-hash replay with the benchmark id carried through:
    * distinct (benchmark, h) fingerprint, inner join, per-pair counts.
    * Integer division both sides: the engine's `doc_id div 97` is
    * DuckDB's `doc_id // 97` (Spark's bare `/` on longs would be
    * double division — avoided).
    */
  val q188Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
th AS (SELECT doc_id, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT doc_id,
             CASE WHEN len(hh) >= 4
                  THEN list_transform(range(0, len(hh) - 4 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 4)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
e AS (SELECT doc_id, unnest(whs) AS h FROM w),
ev AS (SELECT DISTINCT CAST((doc_id // 97) % 3 AS INTEGER) AS benchmark, h
       FROM e WHERE doc_id % 97 = 0),
hits AS (SELECT e.doc_id, ev.benchmark, count(*) AS n_hits
         FROM e JOIN ev USING (h)
         WHERE e.doc_id % 97 <> 0 GROUP BY e.doc_id, ev.benchmark),
tot AS (SELECT doc_id, CAST(len(whs) AS BIGINT) AS n_windows FROM w WHERE doc_id % 97 <> 0)
SELECT h.doc_id, h.benchmark, CAST(h.n_hits AS BIGINT) AS n_hits, t.n_windows,
       round(CAST(h.n_hits AS DOUBLE) / t.n_windows, 6) AS hit_frac
FROM hits h JOIN tot t USING (doc_id) ORDER BY h.doc_id, h.benchmark"""

  /** The ONLINE CURATION capstone through the GATE — q162's pattern
    * (replay a fixed streaming schedule, hash the maintained result)
    * applied to [[graft.streaming.StreamingJobs.curateStream]]: three
    * batches of the corpus (doc_id mod 3) flow through the full
    * foreachBatch body — exact-ingest dedup, delta-chained boilerplate
    * maintenance, cleaning against the accumulated view, the q179
    * repetition-battery gate, exactly-once append — then
    * [[graft.streaming.StreamingJobs.recleanCurated]] replays
    * clean+gate over the raw admission archive against the FINAL view.
    * After the re-clean, EVERY batch's curated content equals the
    * one-shot batch transform (the round-10 contract), which is
    * exactly the oracle: DuckDB computes removeBoilerplate (q173's
    * replay) over the whole corpus and gates the cleaned text with the
    * q179 battery — so the hash match certifies the streaming
    * composition end to end, not just the final batch. State lands in
    * a pid-keyed temp dir wiped at entry, so reruns are deterministic.
    *
    * FIXED 1500-doc key window (the q162 convention): the entry pins
    * the composition SEMANTICS — 3 ingest batches + 12 versioned
    * delta-state writes + the re-clean — whose cost is write-bound,
    * not data-bound; the components' full-corpus scale stories are
    * gated separately (q173 clean, q179 battery, the delta-state
    * bytes spec), so paying a corpus-sized triple-replay per bench
    * run would measure the fixture, not the operator.
    */
  def q190_curate_replay(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingJobs
    val d = docs(s, dir).select("doc_id", "text").filter(col("doc_id") < 1500)
    val out = QueriesSources.tmp("graft_q190_curate_", dir)
    graft.core.ArtifactIO.delete(s, out) // previous-run state must not leak
    val gate = QueriesText.repetitionKeep _
    (0 until 3).foreach { b =>
      StreamingJobs.curateStream(out, gate = gate)(
        d.filter(pmod(col("doc_id"), lit(3)) === b), b.toLong)
    }
    StreamingJobs.recleanCurated(s, out, gate = gate)
    StreamingJobs.curatedDocs(s, out)
      .select(col("doc_id"), col("text"), col("n_tokens"), col("n_removed"))
      .orderBy("doc_id")
  }

  /** Oracle: the one-shot pipeline — q173's boilerplate-clean replay
    * (threshold df ≥ 3 at 5-token chunks) producing the cleaned text
    * and token accounting, then the q179 repetition battery over the
    * CLEANED tokens (battery CTEs b-prefixed; thresholds decided by
    * the same integer cross-multiplication), keeping battery-pass
    * docs. Cleaned-token reuse is sound because tokens are [A-Za-z]+
    * joined by single spaces — re-tokenizing the cleaned string yields
    * the kept array verbatim.
    */
  val q190Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents WHERE doc_id < 1500),
n AS (SELECT doc_id, tk, CAST((len(tk) + 4) // 5 AS BIGINT) AS nch FROM t),
ch AS (SELECT doc_id, ci, array_to_string(list_slice(tk, ci * 5 + 1, ci * 5 + 5), ' ') AS chunk
       FROM (SELECT doc_id, tk, unnest(range(0, nch)) AS ci FROM n)),
hh AS (SELECT doc_id, ci, ${polyHashSql("chunk")} AS h FROM ch),
boiler AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM hh GROUP BY h) WHERE df >= 3),
rem AS (SELECT doc_id, list_sort(list(DISTINCT ci)) AS rem FROM hh JOIN boiler USING (h) GROUP BY doc_id),
fin AS (SELECT n.doc_id, n.tk, coalesce(rem.rem, CAST([] AS BIGINT[])) AS rem
        FROM n LEFT JOIN rem USING (doc_id)),
k AS (SELECT doc_id, tk,
             list_filter(tk, (x, i) -> NOT list_contains(rem, (i - 1) // 5)) AS kept
      FROM fin),
c AS (SELECT doc_id, kept,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
             coalesce(array_to_string(kept, ' '), '') AS text
      FROM k),
cb AS (SELECT doc_id, kept AS btk, CAST(len(kept) AS BIGINT) AS bn FROM c),
bg2 AS (SELECT doc_id, array_to_string(btk[i:i+1], ' ') AS g
        FROM (SELECT doc_id, btk, unnest(range(1, len(btk))) AS i FROM cb WHERE len(btk) >= 2)),
bgc AS (SELECT doc_id, g, count(*) AS cnt FROM bg2 GROUP BY doc_id, g),
btp AS (SELECT doc_id, cnt AS top2_cnt
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn FROM bgc)
        WHERE rn = 1),
bch AS (SELECT doc_id, ci, array_to_string(list_slice(btk, ci * 5 + 1, ci * 5 + 5), ' ') AS chunk
        FROM (SELECT doc_id, btk, unnest(range(0, CAST((len(btk) + 4) // 5 AS BIGINT))) AS ci FROM cb)),
bhh AS (SELECT doc_id, ci, ${polyHashSql("chunk")} AS h FROM bch),
bdc AS (SELECT doc_id, h FROM (SELECT doc_id, h, count(*) AS m FROM bhh GROUP BY doc_id, h) WHERE m >= 2),
bdt AS (SELECT bhh.doc_id, sum(least(5, cb.bn - bhh.ci * 5)) AS dct
        FROM bhh JOIN bdc USING (doc_id, h) JOIN cb ON cb.doc_id = bhh.doc_id GROUP BY bhh.doc_id),
bth AS (SELECT doc_id, list_transform(btk, s -> ${polyHashSql("s")}) AS hsh FROM cb),
bwp AS (SELECT doc_id, i AS wi,
               list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hsh, i + 1, i + 5)),
                           (a, x) -> (a * 31 + x) % 1000000007) AS h
        FROM (SELECT doc_id, hsh, unnest(range(0, len(hsh) - 5 + 1)) AS i FROM bth WHERE len(hsh) >= 5)),
bdw AS (SELECT doc_id, h FROM (SELECT doc_id, h, count(*) AS m FROM bwp GROUP BY doc_id, h) WHERE m >= 2),
bcov AS (SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS d5
         FROM (SELECT bwp.doc_id, unnest(range(bwp.wi, bwp.wi + 5)) AS p
               FROM bwp JOIN bdw USING (doc_id, h))
         GROUP BY doc_id),
bf AS (SELECT cb.doc_id, cb.bn,
              CAST(coalesce(btp.top2_cnt, 0) AS BIGINT) AS top2_cnt,
              CAST(coalesce(bdt.dct, 0) AS BIGINT) AS dct,
              CAST(coalesce(bcov.d5, 0) AS BIGINT) AS d5
       FROM cb LEFT JOIN btp USING (doc_id) LEFT JOIN bdt USING (doc_id) LEFT JOIN bcov USING (doc_id)),
keepd AS (SELECT doc_id FROM bf
          WHERE 10 * top2_cnt <= bn AND 10 * dct <= 3 * bn AND 20 * d5 <= 3 * bn)
SELECT c.doc_id, c.text, c.n_tokens, c.n_removed
FROM c JOIN keepd USING (doc_id) ORDER BY c.doc_id"""

  /** SOFT dedup: inverse-duplication-frequency resampling (the D4 /
    * "keep duplicates in proportion, not in full" recipe) instead of
    * the q46/q91 hard keep-one-representative rule. Every document in
    * a duplicate cluster of size m survives with probability 1/m —
    * realized DETERMINISTICALLY as admission iff
    * affineHash(doc_id) · m < P (the repo's zero-RNG sampling
    * convention, exact integer arithmetic) — so each cluster
    * contributes one member in expectation while (unlike keep-first)
    * WHICH member survives is unbiased across the cluster and heavily
    * duplicated content is downweighted rather than collapsed to a
    * single arbitrary exemplar. Singletons (m = 1) always pass:
    * 1·h < P for every h in [0, P).
    *
    * Scale shape: the pair graph is the prefix-filtered exact τ=0.8
    * generator (q90's operator — near-linear candidates), clustering
    * is the keyed-join CC, sizes are one keyed agg, and the admission
    * test is a per-row predicate: no step exceeds the q91 composition
    * this extends. Cluster sizes follow the dup-cluster join; the
    * corpus text itself is never shuffled.
    */
  def q172_soft_dedup(s: SparkSession, dir: String): DataFrame =
    Dedup.softDedup(docs(s, dir), shingleN = 5, threshold = 0.8)
      .orderBy("doc_id")

  /** Oracle: q91's recursive-CTE clusters at τ=0.8, singletons filled
    * in by a left join, then the identical integer admission test.
    */
  val q172Sql: String = {
    val (a, b) = PortableHash.minHashCoeffs(0)
    raw"""WITH RECURSIVE pairs AS (${jaccardOracle(5, "0.8")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM n
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM c GROUP BY cluster),
m AS (SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster)),
ad AS (SELECT d.doc_id, coalesce(m.cluster, d.doc_id) AS cluster,
              CAST(coalesce(m.n_members, 1) AS BIGINT) AS n_members,
              ((d.doc_id % 2147483647) * $a + $b) % 2147483647 AS h
       FROM documents d LEFT JOIN m USING (doc_id))
SELECT doc_id, cluster, n_members FROM ad
WHERE h * n_members < 2147483647 ORDER BY doc_id"""
  }

  /** Boilerplate chunk removal — the CCNet "remove duplicated lines"
    * filter at 5-token chunk granularity (this corpus has no line
    * structure): a chunk occurring in ≥ 3 DISTINCT documents is
    * template material and is removed wherever it appears; the output
    * carries the reconstructed text so the gate hashes the transform.
    * Frequency-thresholded (≥ 3 docs) is what separates this from
    * q149's span REMOVAL: q149 keeps the globally-first occurrence of
    * any duplicated span; boilerplate survives NOWHERE — a header
    * present in 300 documents should not be kept even once.
    */
  def q173_boilerplate(s: SparkSession, dir: String): DataFrame =
    Dedup.removeBoilerplate(docs(s, dir), c = 5, minDocs = 3)
      .orderBy("doc_id")

  /** Oracle: chunk cut by integer arithmetic, the portable chunk-string
    * hash, distinct-doc frequency, and index-lambda reconstruction
    * (DuckDB's list lambdas index 1-based; Spark's 0-based — the
    * (i-1)//5 below vs floor(j/5) in the operator). The q149 lesson
    * applies: array_to_string of an empty list is NULL in DuckDB, so
    * the fully-boilerplate document coalesces to ''.
    */
  val q173Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
n AS (SELECT doc_id, tk, CAST((len(tk) + 4) // 5 AS BIGINT) AS nch FROM t),
ch AS (SELECT doc_id, ci, array_to_string(list_slice(tk, ci * 5 + 1, ci * 5 + 5), ' ') AS chunk
       FROM (SELECT doc_id, tk, unnest(range(0, nch)) AS ci FROM n)),
hh AS (SELECT doc_id, ci, ${polyHashSql("chunk")} AS h FROM ch),
boiler AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM hh GROUP BY h) WHERE df >= 3),
rem AS (SELECT doc_id, list_sort(list(DISTINCT ci)) AS rem FROM hh JOIN boiler USING (h) GROUP BY doc_id),
fin AS (SELECT n.doc_id, n.tk, n.nch, coalesce(rem.rem, CAST([] AS BIGINT[])) AS rem
        FROM n LEFT JOIN rem USING (doc_id)),
k AS (SELECT doc_id, tk, nch, rem,
             list_filter(tk, (x, i) -> NOT list_contains(rem, (i - 1) // 5)) AS kept
      FROM fin)
SELECT doc_id, nch AS n_chunks, CAST(len(rem) AS BIGINT) AS n_boiler,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM k ORDER BY doc_id"""

  /** Quality-arg-max dedup: every τ=0.8 duplicate cluster keeps its
    * HIGHEST-quality member (q140's logit score z, doc_id on ties)
    * instead of an arbitrary exemplar — the RefinedWeb-style refinement
    * of keep-min-id, and the hard-dedup counterpart of q172's soft
    * resampling. Survivors are reported with their cluster, its size,
    * and the winning score.
    */
  def q174_best_exemplar(s: SparkSession, dir: String): DataFrame =
    Dedup.bestExemplar(docs(s, dir), shingleN = 5, threshold = 0.8,
        quality = QueriesText.qualityZ(docs(s, dir)))
      .orderBy("doc_id")

  /** Oracle: q91's recursive-CTE clusters, q140's spliced z CTEs, and a
    * window arg-max with the identical (z DESC, doc_id) tie order.
    */
  val q174Sql: String =
    raw"""WITH RECURSIVE pairs AS (${jaccardOracle(5, "0.8")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
nn AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM nn
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM c GROUP BY cluster),
m AS (SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster)),
${QueriesText.QualityZSql},
ad AS (SELECT d.doc_id, coalesce(m.cluster, d.doc_id) AS cluster,
              CAST(coalesce(m.n_members, 1) AS BIGINT) AS n_members
       FROM documents d LEFT JOIN m USING (doc_id)),
j AS (SELECT ad.doc_id, ad.cluster, ad.n_members, z.z FROM ad JOIN z USING (doc_id)),
k AS (SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY z DESC, doc_id) AS rn FROM j)
SELECT doc_id, cluster, n_members, z FROM k WHERE rn = 1 ORDER BY doc_id"""

  /** ROUND-9 CURATION COMPOSITION — boilerplate removal FEEDING
    * exemplar selection: the corpus is first cleaned of ≥3-doc
    * template chunks (q173's transform), then near-dup clustered and
    * quality-arg-maxed OVER THE CLEANED TEXT — clusters, quality
    * scores, and survivors are all computed on what would actually
    * train, not on the raw crawl. Ordering matters and is the point:
    * boilerplate inflates both Jaccard similarity (shared template
    * chunks create spurious pairs) and quality features, so a pipeline
    * that dedups before cleaning keeps different — worse — documents.
    *
    * Scale shape: strictly the q173 + q174 plans composed; the cleaned
    * text flows doc_id-keyed between stages and never shuffles on
    * content.
    */
  def q176_boiler_exemplar(s: SparkSession, dir: String): DataFrame = {
    // Persisted: the cleaned corpus is consumed three ways (pair
    // generation, cluster labeling, quality scoring) — at production
    // scale this stage is materialized between jobs anyway, and without
    // it the whole boilerplate chain re-executes per consumer (measured
    // 63 s → 35 s at the 8× probe, 13 s → 9 s at sf0.1).
    val cleaned = Dedup.removeBoilerplate(docs(s, dir), c = 5, minDocs = 3)
      .select(col("doc_id"), col("clean_text").as("text"),
        length(col("clean_text")).cast("long").as("n_chars"))
      .persist()
    Dedup.bestExemplar(cleaned, shingleN = 5, threshold = 0.8,
        quality = QueriesText.qualityZ(cleaned))
      .orderBy("doc_id")
  }

  /** Oracle: the q173 chain (b-prefixed CTEs) materializes the cleaned
    * table; pairs/clusters/z replay the q174 CTEs against it (the z
    * chain restated q-prefixed because its canonical fragment is bound
    * to `documents`).
    */
  val q176Sql: String =
    raw"""WITH RECURSIVE bt AS (SELECT doc_id, $ToksSql AS tk FROM documents),
bn AS (SELECT doc_id, tk, CAST((len(tk) + 4) // 5 AS BIGINT) AS nch FROM bt),
bch AS (SELECT doc_id, ci, array_to_string(list_slice(tk, ci * 5 + 1, ci * 5 + 5), ' ') AS chunk
        FROM (SELECT doc_id, tk, unnest(range(0, nch)) AS ci FROM bn)),
bhh AS (SELECT doc_id, ci, ${polyHashSql("chunk")} AS h FROM bch),
bboiler AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM bhh GROUP BY h) WHERE df >= 3),
brem AS (SELECT doc_id, list(DISTINCT ci) AS rem FROM bhh JOIN bboiler USING (h) GROUP BY doc_id),
bfin AS (SELECT bn.doc_id, bn.tk, coalesce(brem.rem, CAST([] AS BIGINT[])) AS rem
         FROM bn LEFT JOIN brem USING (doc_id)),
cd AS (SELECT doc_id,
              coalesce(array_to_string(
                list_filter(tk, (x, i) -> NOT list_contains(rem, (i - 1) // 5)), ' '), '') AS text
       FROM bfin),
cdn AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars FROM cd),
pairs AS (${jaccardOracle(5, "0.8", "cdn")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
nn AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM nn
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM c GROUP BY cluster),
m AS (SELECT c.doc_id, c.cluster, sz.n_members FROM c JOIN sz USING (cluster)),
qt AS (SELECT doc_id, n_chars,
              length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
              len($ToksSql) AS n_tokens,
              len(list_filter($ToksSql, w -> list_contains(['the', 'a', 'and', 'of', 'is'], w))) AS n_stop
       FROM cdn),
qfeat AS (SELECT doc_id,
                 CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / n_chars END AS alpha_ratio,
                 CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
                 least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / n_tokens END) / 10.0, 1.0) AS len_feat,
                 least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) AS size_feat
          FROM qt),
qz AS (SELECT doc_id, round(-2.0 + 3.0 * alpha_ratio + 2.0 * stop_ratio + 1.5 * len_feat + 0.5 * size_feat, 6) AS z FROM qfeat),
ad AS (SELECT cdn.doc_id, coalesce(m.cluster, cdn.doc_id) AS cluster,
              CAST(coalesce(m.n_members, 1) AS BIGINT) AS n_members
       FROM cdn LEFT JOIN m USING (doc_id)),
j AS (SELECT ad.doc_id, ad.cluster, ad.n_members, qz.z FROM ad JOIN qz USING (doc_id)),
k AS (SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY z DESC, doc_id) AS rn FROM j)
SELECT doc_id, cluster, n_members, z FROM k WHERE rn = 1 ORDER BY doc_id"""

  /** Intra-document chunk dedup — the within-doc "remove duplicated
    * lines in a page" half of the CCNet recipe (q173 is the cross-doc
    * half): a 5-token chunk repeating an EARLIER chunk of the same
    * document is dropped, first occurrence kept, and the output carries
    * the reconstructed text so the gate hashes the transform. For
    * corpus-typical documents the plan is per-row projections (zero
    * shuffles); documents past the inline-chunk bound divert to the
    * keyed min-index respelling so one pathological multi-million-token
    * row can't stall an executor
    * (see [[graft.dedup.Dedup.dedupChunksWithin]]).
    */
  def q178_intra_dedup(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupChunksWithin(docs(s, dir), c = 5)
      .orderBy("doc_id")

  /** Oracle: same chunk cut and portable chunk hash as q173; the
    * first-occurrence rule replayed as ci > min(ci) over (doc_id, h)
    * (set-equal to the operator's prefix-scan mask); index-lambda
    * reconstruction with the q149/q173 empty-list coalesce.
    */
  val q178Sql: String =
    raw"""WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
n AS (SELECT doc_id, tk, CAST((len(tk) + 4) // 5 AS BIGINT) AS nch FROM t),
ch AS (SELECT doc_id, ci, array_to_string(list_slice(tk, ci * 5 + 1, ci * 5 + 5), ' ') AS chunk
       FROM (SELECT doc_id, tk, unnest(range(0, nch)) AS ci FROM n)),
hh AS (SELECT doc_id, ci, ${polyHashSql("chunk")} AS h FROM ch),
mn AS (SELECT doc_id, ci, min(ci) OVER (PARTITION BY doc_id, h) AS first_ci FROM hh),
rem AS (SELECT doc_id, list_sort(list(ci)) AS rem FROM mn WHERE ci > first_ci GROUP BY doc_id),
fin AS (SELECT n.doc_id, n.tk, n.nch, coalesce(rem.rem, CAST([] AS BIGINT[])) AS rem
        FROM n LEFT JOIN rem USING (doc_id)),
k AS (SELECT doc_id, tk, nch, rem,
             list_filter(tk, (x, i) -> NOT list_contains(rem, (i - 1) // 5)) AS kept
      FROM fin)
SELECT doc_id, nch AS n_chunks, CAST(len(rem) AS BIGINT) AS n_dup_chunks,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM k ORDER BY doc_id"""

  /** Cross-SOURCE novelty — the between-dump diversity report a curation
    * run consults before paying for another crawl snapshot: for every
    * source, the number of distinct 8-token windows it contains and the
    * fraction of them found in NO other source. A source whose novelty
    * collapses toward 0 is re-crawling what the corpus already has —
    * the aggregate-level signal that q131's per-doc span flag and
    * q164's eval-set screen don't provide.
    *
    * Scale shape: windows are hashed per row by the native single-pass
    * WindowHashes (text never shuffles); the shuffle carries DISTINCT
    * (source, window_hash) pairs; source-df per hash is a keyed count
    * and the novelty join is hash-keyed. Output is |sources| rows.
    */
  def q180_source_novelty(s: SparkSession, dir: String): DataFrame = {
    val W = 8
    val win = docs(s, dir).select(col("source"),
        explode(org.apache.spark.sql.graft.WindowHashes.windowHashes(
          Text.tokens(col("text")), W)).as("h"))
      .distinct()
    val df = win.groupBy("h").agg(count(lit(1)).as("nsrc"))
    win.join(df, Seq("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_windows"), 6))
      .select("source", "n_windows", "n_novel", "novelty")
      .orderBy("source")
  }

  /** Oracle: the q131 window-hash replay at w=8, distinct pairs, and
    * the same df/novelty arithmetic (ratios of exact integers).
    */
  val q180Sql: String =
    raw"""WITH t AS (SELECT doc_id, source, $ToksSql AS tk FROM documents),
th AS (SELECT source, list_transform(tk, s -> ${polyHashSql("s")}) AS hh FROM t),
w AS (SELECT source,
             CASE WHEN len(hh) >= 8
                  THEN list_transform(range(0, len(hh) - 8 + 1),
                         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hh, i + 1, i + 8)),
                                          (a, b) -> (a * 31 + b) % 1000000007))
                  ELSE CAST([] AS BIGINT[]) END AS whs
      FROM th),
e AS (SELECT DISTINCT source, h FROM (SELECT source, unnest(whs) AS h FROM w)),
df AS (SELECT h, count(*) AS nsrc FROM e GROUP BY h),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM e JOIN df USING (h) GROUP BY source)
SELECT source, n_windows, n_novel,
       round(CAST(n_novel AS DOUBLE) / n_windows, 6) AS novelty
FROM agg ORDER BY source"""

  /** LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT — the near-dup-aware refinement
    * of q43's hash split: a naive per-document hash split places
    * near-duplicate pairs on opposite sides of the train/eval boundary
    * (the classic contamination leak), so the split key here is the
    * document's near-dup COMPONENT representative (q46's connected
    * components over the 3-shingle Jaccard >= 0.1 graph; singletons
    * represent themselves) — every member of a duplicate cluster lands
    * in the same split by construction. The output hashes the
    * per-split sizes AND both audit counters: `n_cross_component`
    * (near-dup pairs straddling splits — provably 0) against
    * `n_cross_naive` (what the per-document split would have leaked).
    * Scale: components are the O(log n)-round CC already in the
    * catalog; the split itself is one hash — no shuffle beyond q46's.
    */
  def q207_leakage_safe_split(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val (ha, hb) = PortableHash.minHashCoeffs(103)
    val P = PortableHash.MinHashP
    def bucket(c: org.apache.spark.sql.Column) = ((c % P) * ha + hb) % P % 10
    def splitOf(b: org.apache.spark.sql.Column) =
      when(b < 8, "train").when(b === 8, "val").otherwise("test")
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    // τ = 0.1 pair graph — q46's graph, reused deliberately so the
    // split guards against exactly the clusters q46 reports. This
    // family's 8x-replica behavior is documented in SCALING.md: a
    // replica corpus genuinely HAS 64x near-dup pairs, so pair volume
    // grows quadratically by SEMANTICS (not by algorithm); at a real
    // 100 TB crawl the τ-graph is sparse and the banding/prefix scale
    // paths (q16/q90) generate the same candidates sub-quadratically.
    // persisted: the pair generator (shingle join + exact verify — the
    // entry's expensive leg) is consumed by the CC run AND the cross-split
    // audit; without the cache it re-executes per consumer
    val pairs = Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.1)
      .select("doc_id_a", "doc_id_b").persist()
    val cc = graft.operators.ConnectedComponents.run(pairs, "doc_id_a", "doc_id_b")
    val keyed = d.join(cc.select(col("node").as("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"), coalesce(col("cluster"), col("doc_id")).as("rep"))
      .select(col("doc_id"), col("n_chars"),
        splitOf(bucket(col("rep"))).as("split"),
        splitOf(bucket(col("doc_id"))).as("naive_split"))
      .persist() // consumed by the per-split report and the audit join
    // both audits (component split, naive split) in ONE pass over the
    // pair⋈label join instead of two identical joins (guide §2.4)
    val cross = pairs
      .join(keyed.select(col("doc_id").as("doc_id_a"),
        col("split").as("sa"), col("naive_split").as("na")), Seq("doc_id_a"))
      .join(keyed.select(col("doc_id").as("doc_id_b"),
        col("split").as("sb"), col("naive_split").as("nb")), Seq("doc_id_b"))
      .agg(
        coalesce(sum(when(col("sa") =!= col("sb"), 1L)), lit(0L)).as("n_cross_component"),
        coalesce(sum(when(col("na") =!= col("nb"), 1L)), lit(0L)).as("n_cross_naive"))
    keyed.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .crossJoin(cross)
      .orderBy("split")
  }

  val q207Sql: String = {
    val (ha, hb) = graft.functions.PortableHash.minHashCoeffs(103)
    val P = graft.functions.PortableHash.MinHashP
    def bucket(c: String) = s"((($c % $P) * $ha + $hb) % $P) % 10"
    def splitOf(b: String) =
      s"CASE WHEN $b < 8 THEN 'train' WHEN $b = 8 THEN 'val' ELSE 'test' END"
    raw"""WITH RECURSIVE pairs AS (${jaccardOracle(3, "0.1")}),
e AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION SELECT doc_id_b, doc_id_a FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
r AS (SELECT node, node AS reach FROM n
      UNION SELECT e.s, r.reach FROM e JOIN r ON r.node = e.d),
c AS (SELECT node AS doc_id, min(reach) AS cluster FROM r GROUP BY node),
k AS (SELECT d.doc_id, d.n_chars,
             ${splitOf(bucket("COALESCE(c.cluster, d.doc_id)"))} AS split,
             ${splitOf(bucket("d.doc_id"))} AS naive_split
      FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id),
xc AS (SELECT count(*) AS n FROM pairs p
       JOIN k a ON a.doc_id = p.doc_id_a JOIN k b ON b.doc_id = p.doc_id_b
       WHERE a.split <> b.split),
xn AS (SELECT count(*) AS n FROM pairs p
       JOIN k a ON a.doc_id = p.doc_id_a JOIN k b ON b.doc_id = p.doc_id_b
       WHERE a.naive_split <> b.naive_split)
SELECT k.split, count(*) AS n_docs, CAST(sum(k.n_chars) AS BIGINT) AS sum_chars,
       CAST(xc.n AS BIGINT) AS n_cross_component, CAST(xn.n AS BIGINT) AS n_cross_naive
FROM k CROSS JOIN xc CROSS JOIN xn
GROUP BY k.split, xc.n, xn.n ORDER BY k.split"""
  }

  /** INCREMENTAL NEAR-DUP INDEX MAINTENANCE — the LSH twin of the
    * vector index's O(delta) story (q191/q216), closing the gap that
    * q16/q100/q101 recompute the EXISTING side from scratch on every
    * ingest. The banded MinHash index is persisted as a SetU delta-log
    * chain ([[graft.streaming.DeltaState]], the shared commit log): a
    * doc's band rows depend on its own text alone, so maintaining the
    * index under ingest is EXACTLY appending the batch's band rows —
    * one O(batch) shingle+signature pass, no old document re-hashed,
    * with compaction/retention/time travel inherited from the chain.
    * Serving joins the BATCH's band rows (delta-scale) against the
    * folded index on (band, band_sig) — the candidate set for "does
    * anything in this batch collide with anything ever ingested
    * (including itself)" — then verifies exact 5-shingle Jaccard ≥ 0.8
    * on the candidates (the q16 parameters: 128 hashes × bands of 4,
    * miss prob ≈ 5e-8 at τ=0.8). Oracle: exact Jaccard restricted to
    * pairs with at least one batch-side doc — so the hash also
    * certifies that the INCREMENTALLY built index finds exactly the
    * pairs a full rebuild would (band rows are per-doc, hence
    * incremental ∪ == rebuild; DedupSpec pins it structurally).
    *
    * Scale: per-ingest cost is O(batch shingles + band collisions);
    * the index fold is metadata over the chain's committed versions;
    * the exact verify touches only candidate docs' shingles.
    */
  def q223_lsh_index_maint(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.DeltaState
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val base = d.filter(pmod(col("doc_id"), lit(4)) =!= 3)
    val batch = d.filter(pmod(col("doc_id"), lit(4)) === 3)
    val out = QueriesSources.tmp("graft_q223_lsh_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh chain per run
    val layout = Seq(DeltaState.Table("bands",
      DeltaState.SetU(Seq("band", "band_sig", "doc_id"))))
    def bandRows(df: DataFrame) = Dedup.lshBandsFromArray(
      Dedup.minHashSignaturesAgg(Dedup.shingleHashes(df, 5), 128), 4)
    // the two ingest versions hash DISJOINT corpus halves — independent
    // version commits, overlapped (guide §2.6)
    graft.core.ArtifactIO.inParallel(Seq(
      () => DeltaState.writeDelta(s, out, 0L, layout, Seq("bands" -> bandRows(base))),
      () => DeltaState.writeDelta(s, out, 1L, layout, Seq("bands" -> bandRows(batch)))))
    val index = DeltaState.asOf(s, out, layout.head).get
    val nb = s.read.parquet(s"$out/${DeltaState.DeltaPrefix}1/bands")
    val cands = nb.select(col("band"), col("band_sig"), col("doc_id").as("new_id"))
      .join(index.select(col("band"), col("band_sig"), col("doc_id").as("other_id")),
        Seq("band", "band_sig"))
      .filter(col("new_id") =!= col("other_id"))
      .select(least(col("new_id"), col("other_id")).as("doc_id_a"),
        greatest(col("new_id"), col("other_id")).as("doc_id_b"))
      .distinct()
    val sh = Dedup.shingleHashes(d, 5).persist()
    Dedup.exactJaccard(cands, sh).filter(col("jaccard") >= 0.8)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** q16's exact-Jaccard oracle restricted to pairs with a batch-side
    * (doc_id ≡ 3 mod 4) member.
    */
  val q223Sql: String = {
    val base = jaccardOracle(5, "0.8")
    base.replace("ORDER BY doc_id_a, doc_id_b",
      "AND (doc_id_a % 4 = 3 OR doc_id_b % 4 = 3)\nORDER BY doc_id_a, doc_id_b")
  }

  /** NEAR-DUP INDEX TAKEDOWN (round-12 verdict item 2): q223's SetU band
    * chain is grow-only, so taken-down documents would keep serving
    * candidate pairs forever. Composed here with DV-liveness the way
    * q202 does for the vector index, through every phase:
    *
    *  1. incremental index: base delta + batch delta (q223's chain);
    *  2. TAKEDOWN: the doc store is a deletion-vector table; the
    *     takedown ids (doc_id ≡ 2 mod 7) delete through the commit
    *     log's allocated id (gated: the id itself);
    *  3. SERVE pre-fold: liveness is a runtime pre-filter — band rows
    *     semi-joined against the live set BEFORE the band self-join, so
    *     dead docs neither pair with others nor with each other;
    *  4. FOLD: SetU cannot shrink, so the takedown fold is a GENERATION
    *     ROLL (the vector-index rebase pattern): a new chain seeded with
    *     only survivors' band rows — dead rows leave STORAGE;
    *  5. SERVE post-fold from the new generation with NO liveness
    *     filter: identical pairs prove the fold itself dropped every
    *     dead band row (hashed as a separate phase).
    *
    * DedupSpec pins incremental-with-deletes == rebuild-from-survivors
    * at the band-row level. Scale: band self-join is the candidate
    * filter (never all-pairs), the liveness semi-join broadcasts
    * (delete-scale), the roll is O(index), and serving off the rolled
    * generation pays zero per-query liveness cost.
    */
  def q227_lsh_takedown(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.DeltaState
    import graft.operators.DeletionVectors
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val out = QueriesSources.tmp("graft_q227_lshtd_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh chain per run
    val (docsTable, chain, chain2) = (s"$out/docs", s"$out/bands", s"$out/bands_g2")
    val layout = Seq(DeltaState.Table("bands",
      DeltaState.SetU(Seq("band", "band_sig", "doc_id"))))
    def bandRows(df: DataFrame) = Dedup.lshBandsFromArray(
      Dedup.minHashSignaturesAgg(Dedup.shingleHashes(df, 5), 128), 4)
    // the two ingest versions (disjoint corpus halves) and the DV doc
    // store are three independent builds — overlapped (guide §2.6)
    graft.core.ArtifactIO.inParallel(Seq(
      () => DeltaState.writeDelta(s, chain, 0L, layout,
        Seq("bands" -> bandRows(d.filter(pmod(col("doc_id"), lit(4)) =!= 3)))),
      () => DeltaState.writeDelta(s, chain, 1L, layout,
        Seq("bands" -> bandRows(d.filter(pmod(col("doc_id"), lit(4)) === 3)))),
      () => DeletionVectors.writeBase(
        d.select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard")),
        docsTable, Seq("doc_id"))))
    val takedown = d.filter(pmod(col("doc_id"), lit(7)) === 2).select("doc_id")
    val (txnId, _) =
      DeletionVectors.deleteMatchingConcurrent(s, docsTable, takedown, Seq("doc_id"))
    val live = DeletionVectors.read(s, docsTable).select("doc_id")
    val sh = Dedup.shingleHashes(d, 5).persist()
    def serve(index: DataFrame): DataFrame = {
      val cands = index
        .select(col("band"), col("band_sig"), col("doc_id").as("doc_id_a"))
        .join(index.select(col("band"), col("band_sig"), col("doc_id").as("doc_id_b")),
          Seq("band", "band_sig"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select("doc_id_a", "doc_id_b").distinct()
      Dedup.exactJaccard(cands, sh).filter(col("jaccard") >= 0.8)
        .select(col("doc_id_a"), col("doc_id_b"), round(col("jaccard"), 6).as("jaccard"))
    }
    val index1 = DeltaState.asOf(s, chain, layout.head).get
    // persisted: consumed by BOTH the pre-fold serve and the generation-2
    // seed write — without the cache the chain fold + liveness semi-join
    // re-executes for each
    val survivorBands = index1.join(live, Seq("doc_id"), "left_semi").persist()
    val pre = serve(survivorBands)
    DeltaState.writeDelta(s, chain2, 0L, layout, Seq("bands" -> survivorBands))
    val post = serve(DeltaState.asOf(s, chain2, layout.head).get)
    pre.select(lit("pre_fold").as("phase"), col("doc_id_a"), col("doc_id_b"), col("jaccard"))
      .unionByName(post.select(lit("post_fold").as("phase"),
        col("doc_id_a"), col("doc_id_b"), col("jaccard")))
      .unionByName(takedown.select(lit("takedown").as("phase"),
        col("doc_id").as("doc_id_a"), lit(txnId).as("doc_id_b"), lit(0.0).as("jaccard")))
      .orderBy("phase", "doc_id_a", "doc_id_b")
  }

  /** Survivor-pair oracle (both ids ≢ 2 mod 7), replayed for both
    * serving phases, plus the takedown rows with the deterministic
    * log-allocated transaction id (1 on a fresh table).
    */
  val q227Sql: String = {
    val survivors = jaccardOracle(5, "0.8")
      .replace("WHERE CAST(c AS DOUBLE)",
        "WHERE doc_id_a % 7 <> 2 AND doc_id_b % 7 <> 2 AND CAST(c AS DOUBLE)")
      .replace("ORDER BY doc_id_a, doc_id_b", "")
    raw"""WITH pairs AS ($survivors),
phases AS (SELECT 'pre_fold' AS phase UNION ALL SELECT 'post_fold')
SELECT phase, doc_id_a, doc_id_b, jaccard FROM phases, pairs
UNION ALL
SELECT 'takedown' AS phase, doc_id AS doc_id_a, CAST(1 AS BIGINT) AS doc_id_b,
       CAST(0.0 AS DOUBLE) AS jaccard
FROM documents WHERE doc_id % 7 = 2
ORDER BY phase, doc_id_a, doc_id_b"""
  }
}
