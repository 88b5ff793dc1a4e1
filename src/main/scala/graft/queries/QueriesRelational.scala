package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational queries over the star schema + events (SURVEY.md §2.D
  * Q7–Q14) and the event-analytics extensions (Q29–Q30).
  *
  * Scale notes: every join below either broadcasts its small side
  * (dimension tables — nation is 25 rows at any SF) or shuffles on the
  * join key with AQE free to re-plan; filters are plain column
  * predicates so Catalyst pushes them into the parquet scan.
  */
object QueriesRelational {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def ntz(ts: String) = expr(s"to_timestamp_ntz('$ts')")

  /** TPC-H Q1 shape: pricing summary. The shipdate predicate is pushed to
    * the parquet scan; aggregation is partial (map-side) + final.
    */
  def q07_pricing_summary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ntz("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q07Sql: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  /** Multi-way equi-join; nation broadcast (25 rows), fact-fact joins
    * shuffle on the key.
    */
  def q08_nation_revenue(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val n = t(s, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q08Sql: String =
    """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name"""

  def q09_top_customers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sum("o_totalprice").as("total_spent"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name, sum(o_totalprice) AS total_spent
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name ORDER BY total_spent DESC, c_custkey LIMIT 10"""

  def q10_orders_by_priority(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= ntz("1996-03-01 00:00:00")
        && col("o_orderdate") < ntz("1996-04-01 00:00:00"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total_price"))
      .orderBy("o_orderpriority")

  val q10Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  def q11_part_rank(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("price_rank",
        rank().over(Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)).cast("long"))
      .orderBy("p_brand", "price_rank", "p_partkey")

  val q11Sql: String =
    """SELECT p_brand, p_partkey, p_retailprice,
       rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank
FROM part ORDER BY p_brand, price_rank, p_partkey"""

  /** Window frame (rowsBetween) — running sums are order-deterministic
    * because the frame orders on a unique key suffix.
    */
  def q12_running_total(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      // round-6 per the catalog convention: engines associate running
      // float sums differently (Spark accumulates sequentially, DuckDB
      // uses a segment tree), and on long-enough partitions the ulp
      // drift becomes visible in unrounded output — seen at the 8×
      // perf corpus, where customers carry 8× the orders.
      .withColumn("running_spend", round(sum("o_totalprice").over(w), 6))
      .drop("o_totalprice")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_spend
FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""

  /** Set operations. Spark `union` is UNION ALL; `.distinct()` restores
    * SQL UNION semantics, `.except` is already EXCEPT DISTINCT.
    */
  def q13_setops(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").select(col("r_name").as("name"))
    val firstNations = t(s, dir, "nation").filter(col("n_nationkey") < 5).select(col("n_name").as("name"))
    val otherNations = t(s, dir, "nation").filter(col("n_nationkey") >= 5).select(col("n_name").as("name"))
    region.union(firstNations).distinct().except(otherNations).orderBy("name")
  }

  val q13Sql: String =
    """SELECT name FROM (
  (SELECT r_name AS name FROM region
   UNION
   SELECT n_name AS name FROM nation WHERE n_nationkey < 5)
  EXCEPT
  SELECT n_name AS name FROM nation WHERE n_nationkey >= 5)
ORDER BY name"""

  /** Tumbling 1-hour windows via Spark's `window()`; epoch-aligned 1-hour
    * tumbling ≡ date_trunc('hour') in the oracle.
    */
  def q14_hourly_events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  val q14Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events, sum(value) AS total_value
FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type"""

  /** Sessionization (30-minute inactivity gap) — the batch shape of the
    * stateful-streaming operator in graft.streaming.
    */
  def q29_user_sessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts") > col("prev") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q29Sql: String =
    """WITH e AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM e GROUP BY user_id ORDER BY user_id"""

  /** Semi/anti joins: orders that do / don't contain a bulk line item
    * (l_quantity >= 45). left_semi/left_anti shuffle only the key column
    * of the filtered right side.
    */
  def q31_semi_anti(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val bulk = t(s, dir, "lineitem").filter(col("l_quantity") >= 45).select("l_orderkey")
    val withBulk = o.join(bulk, o("o_orderkey") === bulk("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_with_bulk"))
    val withoutBulk = o.join(bulk, o("o_orderkey") === bulk("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_without_bulk"))
    o.select("o_orderpriority").distinct()
      .join(withBulk, Seq("o_orderpriority"), "left")
      .join(withoutBulk, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"),
        coalesce(col("n_with_bulk"), lit(0L)).as("n_with_bulk"),
        coalesce(col("n_without_bulk"), lit(0L)).as("n_without_bulk"))
      .orderBy("o_orderpriority")
  }

  val q31Sql: String =
    """SELECT o_orderpriority,
       count(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)) AS n_with_bulk,
       count(*) FILTER (WHERE NOT EXISTS (
         SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)) AS n_without_bulk
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** ROLLUP over (priority, status). Subtotal rows are coalesced to 'ALL'
    * on both sides, which also sidesteps engine NULL-ordering defaults.
    */
  def q32_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_price"))
      .orderBy("priority", "status")

  val q32Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority, coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus) ORDER BY priority, status"""

  /** PIVOT: per user-id bucket, event counts spread across one column
    * per event type (explicit value list so the output schema is static
    * — the scale-correct pivot; an unlisted-values pivot needs a
    * distinct-values collect first). Absent cells coalesce to 0 to match
    * SQL's FILTER counts.
    */
  def q48_pivot_events(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .select(pmod(col("user_id"), lit(10)).cast("long").as("user_bucket"), col("event_type"))
      .groupBy("user_bucket")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_bucket") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_bucket")
  }

  // (user_id % 10 + 10) % 10 mirrors Spark's pmod for negative ids too —
  // DuckDB's % keeps the dividend's sign, so a bare % 10 would diverge
  // on negative user_id even though current test data is non-negative.
  val q48Sql: String =
    """SELECT (user_id % 10 + 10) % 10 AS user_bucket,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_bucket ORDER BY user_bucket"""

  /** CUBE over (priority, status) — all four grouping sets, with
    * per-column grouping flags (portable across engines, unlike the
    * grouping_id bitmask whose bit order is engine-defined) and q32's
    * 'ALL' coalescing so the sort never compares SQL NULLs.
    */
  def q49_cube_orders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total_price"),
        grouping(col("o_orderpriority")).cast("long").as("gp"),
        grouping(col("o_orderstatus")).cast("long").as("gs"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gp"), col("gs"), col("n_orders"), col("total_price"))
      .orderBy("priority", "status")

  val q49Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority, coalesce(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS gp, CAST(GROUPING(o_orderstatus) AS BIGINT) AS gs,
       count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) ORDER BY priority, status"""

  /** Exact interpolated percentiles per event type (both engines use the
    * (n-1)*p linear-interpolation definition) + exact distinct users.
    * Sort-based and sum-free, so values are cross-engine deterministic.
    */
  def q35_event_quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_value"),
        round(expr("percentile(value, 0.9)"), 6).as("p90_value"))
      .orderBy("event_type")

  val q35Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
       round(quantile_cont(value, 0.5), 6) AS p50_value,
       round(quantile_cont(value, 0.9), 6) AS p90_value
FROM events GROUP BY event_type ORDER BY event_type"""

  /** Scalar-function showcase: date parts (ISO), math, string ops — each
    * chosen for identical cross-engine semantics (NB: Spark's dayofweek()
    * is 1=Sunday vs DuckDB dow 0=Sunday; both agree on isodow).
    */
  def q36_scalar_functions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        expr("extract(dayofweek_iso FROM o_orderdate)").cast("long").as("o_isodow"),
        floor(log10(col("o_totalprice"))).cast("long").as("price_magnitude"),
        round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
        concat_ws("/", col("o_orderpriority"), col("o_orderstatus")).as("prio_status"),
        substring(col("o_orderpriority"), 1, 1).as("prio_digit"),
        length(col("o_orderpriority")).cast("long").as("prio_len"))
      .orderBy("o_orderkey")
      .limit(1000)

  val q36Sql: String =
    """SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(isodow(o_orderdate) AS BIGINT) AS o_isodow,
       CAST(floor(log10(o_totalprice)) AS BIGINT) AS price_magnitude,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       concat_ws('/', o_orderpriority, o_orderstatus) AS prio_status,
       substring(o_orderpriority, 1, 1) AS prio_digit,
       CAST(length(o_orderpriority) AS BIGINT) AS prio_len
FROM orders ORDER BY o_orderkey LIMIT 1000"""

  /** Correlated scalar subquery (Catalyst decorrelates it into a join):
    * orders priced above their own customer's average. Expressed through
    * spark.sql — the DataFrame API has no correlated-subquery surface.
    */
  def q37_above_avg_orders(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderpriority, count(*) AS n_above
      FROM orders o
      WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  val q37Sql: String =
    """SELECT o_orderpriority, count(*) AS n_above
FROM orders o
WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** JSON extraction from the events props column. */
  def q30_event_props_json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"), avg("k").as("avg_k"))
      .orderBy("event_type")

  val q30Sql: String =
    """SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type"""

  /** As-of attribution: every purchase matched to the same user's most
    * recent prior-or-simultaneous view (graft.operators.AsOf — one
    * shuffle on user_id, union+running-last, no interval-join pair
    * explosion). Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q38_asof_attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    // event_id tie-break: (user_id, ts) is unique in this data, but the
    // operator stays deterministic even if a source ever emits duplicate
    // same-user timestamps.
    graft.operators.AsOf
      .asOfJoinBackward(purchases, views, "user_id", "ts", "ts", rightPrefix = "view_",
        rightTieBreak = Some("event_id"))
      .orderBy("event_id")
  }

  val q38Sql: String =
    """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view')
SELECT p.user_id, p.event_id, p.ts, v.ts AS view_ts, v.event_id AS view_event_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id"""

  /** Forward as-of: every purchase matched to the same user's NEXT view
    * at-or-after the purchase (time-to-next-touch attribution) — the
    * mirror of q38, same single-shuffle union+running-last plan in
    * descending time order. Oracle: DuckDB ASOF with the <= comparison.
    */
  def q42_asof_forward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    graft.operators.AsOf
      .asOfJoinForward(purchases, views, "user_id", "ts", "ts", rightPrefix = "next_",
        rightTieBreak = Some("event_id"))
      .orderBy("event_id")
  }

  val q42Sql: String =
    """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view')
SELECT p.user_id, p.event_id, p.ts, v.ts AS next_ts, v.event_id AS next_event_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
ORDER BY p.event_id"""

  /** Interval self-join (range join): every same-user follow-up event
    * within 30 minutes — the batch twin of the streaming stream-stream
    * join (StreamingJobs.followUpPairs). Via the BUCKETED interval join
    * (graft.operators.IntervalJoin): the equi key is (user_id, 30-min
    * time bucket), so the SMJ only ever pairs rows within a bucket —
    * O(events × per-bucket density) — instead of enumerating all
    * O(Σᵤ nᵤ²) same-user pairs before the range residual.
    */
  def q39_event_followups(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "ts", "event_id")
    val a = ev.select(col("user_id"), col("ts").as("ts_a"), col("event_id").as("id_a"))
    val b = ev.select(col("user_id").as("user_b"), col("ts").as("ts_b"), col("event_id").as("id_b"))
    graft.operators.IntervalJoin
      .followUpsWithin(a, b, "user_id", "user_b", "ts_a", "ts_b", windowSeconds = 1800L)
      .select(col("user_id"), col("id_a"), col("id_b"),
        // floor-of-seconds difference on both engines (cast-to-long and
        // date_diff both count whole-second boundaries) — integer exact.
        // NTZ has no direct long cast; the session is pinned UTC so the
        // timestamp hop is value-preserving.
        (col("ts_b").cast("timestamp").cast("long") -
          col("ts_a").cast("timestamp").cast("long")).as("gap_s"))
      .orderBy("id_a", "id_b")
  }

  val q39Sql: String =
    """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
ORDER BY id_a, id_b"""

  /** Hot-key-safe fact-to-dim join via explicit salting
    * (graft.operators.Skew.saltedJoin): the fact side's join key gets a
    * salt in [0, 8), the dim side is replicated 8×, so one hot user's
    * rows spread over 8 shuffle partitions instead of one straggler
    * task. The salt only changes PARTITIONING — results are identical to
    * the plain join, which is exactly what the oracle runs. AQE's skew
    * split covers sort-merge joins at runtime; explicit salting is the
    * static tool when a known key dominates (e.g. the null/default user
    * of an event stream) or when the engine's runtime split is off.
    */
  def q50_salted_join(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "value")
    val cust = t(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(ev, cust, "user_id", saltBuckets = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .orderBy("c_mktsegment")
  }

  val q50Sql: String =
    """SELECT c_mktsegment, count(*) AS n_events, sum(value) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Trailing time-RANGE window: per event, how many events (and how
    * much value) the same user produced in the preceding hour, computed
    * with a value-based frame over epoch seconds — one shuffle on
    * user_id, sorted scan per partition, state bounded by the frame.
    * RANGE (not ROWS) so ties at the same second are always whole — the
    * result is deterministic even when ts_sec collides. NTZ has no
    * direct long cast in Spark 4; the session is pinned UTC so the
    * timestamp hop is value-preserving (floor division, matching
    * DuckDB's floor(epoch(ts))).
    */
  def q51_trailing_window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3599L, 0L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").cast("long").as("ts_sec"), col("value"))
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        count(lit(1)).over(w).as("n_events_1h"),
        sum("value").over(w).as("sum_value_1h"))
      .orderBy("event_id")
  }

  val q51Sql: String =
    """SELECT event_id, user_id, ts_sec,
       count(*) OVER w AS n_events_1h,
       sum(value) OVER w AS sum_value_1h
FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
ORDER BY event_id"""

  /** Exact decimal money math: prices recast to DECIMAL(12,2) and summed
    * without any floating-point involvement — the accounting-correct
    * aggregation (bit-exact, associative, order-independent), so the
    * oracle comparison is string equality on decimals, not a 6-digit
    * float tolerance. The double→decimal cast rounds to the nearest
    * cent identically on both engines (binary doubles never land exactly
    * on a half-cent tie). The AGGREGATION is exact decimal throughout;
    * only the final presentation is pinned: Spark widens
    * sum(DECIMAL(12,2)) to DECIMAL(22,2) while DuckDB widens to
    * DECIMAL(38,2), and downstream canonicalizers (pandas dtype-sensitive
    * hashers) can render the "same" number differently per decimal width.
    * Casting the pinned DECIMAL(18,2) result to STRING on BOTH engines
    * makes the output byte-identical by construction — '1234.50' is
    * '1234.50' everywhere — which is the portable contract for exact
    * money values crossing an engine boundary.
    */
  def q60_decimal_money(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price_dec"),
        col("l_quantity").cast("decimal(12,2)").as("qty_dec"))
      .groupBy("l_returnflag")
      .agg(sum("price_dec").cast("decimal(18,2)").cast("string").as("sum_price_dec"),
        sum("qty_dec").cast("decimal(18,2)").cast("string").as("sum_qty_dec"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val q60Sql: String =
    """SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price_dec,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty_dec, count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of silently dropping — still a hash-partitioned
    * equi-join (NULL hashes like any value under null-safe equality),
    * not a nested loop. The NULL group is materialized via nullif, and
    * the sort pins NULLS FIRST explicitly because Spark and DuckDB
    * default opposite null orders.
    */
  def q61_null_safe_join(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(nullif(col("event_type"), lit("error")).as("et"))
    val counts = e.groupBy("et").agg(count(lit(1)).as("n"))
      .withColumnRenamed("et", "et_r")
    e.join(counts, col("et") <=> col("et_r"))
      .groupBy("et_r")
      .agg(first("n").as("n"), count(lit(1)).as("n_joined"))
      .select(col("et_r").as("et"), col("n"), col("n_joined"))
      .orderBy(asc_nulls_first("et"))
  }

  val q61Sql: String =
    """WITH e AS (SELECT nullif(event_type, 'error') AS et FROM events),
c AS (SELECT et, count(*) AS n FROM e GROUP BY et)
SELECT c.et AS et, c.n AS n, count(*) AS n_joined
FROM e JOIN c ON e.et IS NOT DISTINCT FROM c.et
GROUP BY c.et, c.n ORDER BY et NULLS FIRST"""

  /** Multiset set-ops (q13 covers the DISTINCT forms): INTERSECT ALL
    * keeps min(countA, countB) copies per value, EXCEPT ALL keeps
    * max(countA − countB, 0) — both implemented by Spark as a keyed
    * count-compare aggregation, never a row-pairing join, so the shuffle
    * carries one (value, count) per distinct key per side. Counted per
    * type here so the multiset cardinalities are the observable.
    */
  def q59_setops_all(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(pmod(col("user_id"), lit(2)).as("par"), col("event_type"))
    val a = ev.filter(col("par") === 0).select("event_type")
    val b = ev.filter(col("par") === 1).select("event_type")
    val ia = a.intersectAll(b).groupBy("event_type")
      .agg(count(lit(1)).as("n_intersect_all"))
    val ea = a.exceptAll(b).groupBy("event_type")
      .agg(count(lit(1)).as("n_except_all"))
    ia.join(ea, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
      .orderBy("event_type")
  }

  val q59Sql: String =
    """WITH a AS (SELECT event_type FROM events WHERE (user_id % 2 + 2) % 2 = 0),
b AS (SELECT event_type FROM events WHERE (user_id % 2 + 2) % 2 = 1),
ia AS (SELECT event_type, count(*) AS n_intersect_all
       FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY event_type),
ea AS (SELECT event_type, count(*) AS n_except_all
       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY event_type)
SELECT coalesce(ia.event_type, ea.event_type) AS event_type,
       coalesce(n_intersect_all, 0) AS n_intersect_all,
       coalesce(n_except_all, 0) AS n_except_all
FROM ia FULL JOIN ea ON ia.event_type = ea.event_type
ORDER BY event_type"""

  /** Explicit GROUPING SETS — the general grouping-lattice form that
    * rollup (q32) and cube (q49) are sugar for: here only the two
    * single-column marginals, NOT their combination, so one pass
    * computes what would otherwise be two separate groupBys unioned.
    * q32/q49's 'ALL' coalescing keeps the sort free of SQL NULLs.
    */
  def q56_grouping_sets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_price"))
      .orderBy("priority", "status")

  val q56Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority, coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)) ORDER BY priority, status"""

  /** Collection aggregation: the sorted distinct event-type set per
    * user. collect_set keeps the shuffle carrying at most |event_types|
    * strings per user (partial sets merge map-side); array_sort makes
    * the value deterministic and array_join presents it as one scalar
    * string — the gate's hasher (and most downstream stores) want
    * primitive columns, and a canonical comma-joined form is the
    * portable presentation of a set-valued feature.
    */
  def q57_user_event_types(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
        countDistinct("event_type").as("n_types"))
      .orderBy("user_id")

  val q57Sql: String =
    """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id"""

  /** Window-function surface sweep: positional (lag/lead), distribution
    * (ntile, percent_rank) and frame-anchored (first) functions over one
    * totally-ordered per-user window — all six share a single shuffle +
    * sort. (user_id, ts) is unique in this table, and event_id breaks
    * any hypothetical tie, so every function is deterministic.
    */
  def q58_window_zoo(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").cast("long").as("ts_sec"), col("value"))
      .select(col("event_id"), col("user_id"),
        first("ts_sec").over(w).as("first_ts"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"))
      .orderBy("event_id")
  }

  val q58Sql: String =
    """SELECT event_id, user_id,
       first_value(ts_sec) OVER w AS first_ts,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pr
FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
ORDER BY event_id"""

  /** UNPIVOT (wide→long melt): the four lineitem measures become
    * (measure, val) rows — the relational dual of q48's PIVOT. Spark's
    * unpivot is a zero-shuffle Expand node (each input row emits one row
    * per measure in place), so the only shuffle is the final keyed
    * aggregation; at 100 TB the melt itself costs no data movement.
    */
  def q62_unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "val")
      .groupBy("l_returnflag", "measure")
      .agg(sum("val").as("total"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "measure")

  val q62Sql: String =
    """WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
SELECT l_returnflag, measure, sum(val) AS total, count(*) AS n
FROM long GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure"""

  /** Time-series gap filling: the dense (hour × event_type) grid over the
    * table's observed hour range, zero-filled where no events landed —
    * the shape every downstream forecasting/rate job needs. The calendar
    * is generated (sequence + explode from one min/max row), never
    * materialized as input, and both generated sides are broadcast-sized
    * (hours × types, independent of row count), so the only per-row work
    * is the keyed count — gap filling stays O(events) at any scale.
    */
  def q63_gapfill_hours(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(floor(col("ts").cast("timestamp").cast("long").cast("double") / 3600)
        .cast("long").as("hour"), col("event_type"))
    val bounds = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
    val hours = bounds.select(explode(sequence(col("lo"), col("hi"))).as("hour"))
    val types = ev.select("event_type").distinct()
    val counts = ev.groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
    hours.crossJoin(types)
      .join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour", "event_type")
  }

  val q63Sql: String =
    """WITH ev AS (SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hour, event_type FROM events),
b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
hours AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
types AS (SELECT DISTINCT event_type FROM ev),
c AS (SELECT hour, event_type, count(*) AS n FROM ev GROUP BY hour, event_type)
SELECT h.hour AS hour, t.event_type AS event_type, coalesce(c.n, 0) AS n
FROM hours h CROSS JOIN types t
LEFT JOIN c ON c.hour = h.hour AND c.event_type = t.event_type
ORDER BY h.hour, t.event_type"""

  /** Per-user daily-volume anomalies: z-score of each (user, day) event
    * count against that user's own distribution. Variance comes from the
    * integer moments (Σn, Σn²) — counts are exact integers, so both
    * engines evaluate the identical double formula bit-for-bit (no
    * Welford-order drift). One groupBy for the day counts, one for the
    * per-user moments, one broadcast-able join back — three narrow
    * passes, no window over unbounded partitions.
    */
  def q67_daily_zscore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .select(col("user_id"),
        floor(col("ts").cast("timestamp").cast("long").cast("double") / 86400)
          .cast("long").as("day"))
    val counts = d.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val stats = counts.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"), sum("n").as("s"), sum(col("n") * col("n")).as("sq"))
      .filter(col("n_days") >= 3)
    val mean = col("s").cast("double") / col("n_days")
    val variance = (col("sq").cast("double") - col("s").cast("double") * col("s") / col("n_days")) /
      (col("n_days") - 1)
    counts.join(stats, Seq("user_id"))
      .filter(variance > 0)
      .select(col("user_id"), col("day"), col("n"),
        round((col("n") - mean) / sqrt(variance), 6).as("z"),
        (abs(col("n") - mean) / sqrt(variance) >= 2.0).as("is_anomaly"))
      .orderBy("user_id", "day")
  }

  val q67Sql: String =
    """WITH counts AS (
  SELECT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day, count(*) AS n
  FROM events GROUP BY user_id, day),
stats AS (
  SELECT user_id, count(*) AS n_days, sum(n) AS s, sum(n * n) AS sq
  FROM counts GROUP BY user_id HAVING count(*) >= 3)
SELECT c.user_id, c.day, c.n,
       round((c.n - CAST(s AS DOUBLE) / n_days)
             / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) / (n_days - 1)), 6) AS z,
       abs(c.n - CAST(s AS DOUBLE) / n_days)
         / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) / (n_days - 1)) >= 2.0 AS is_anomaly
FROM counts c JOIN stats st ON c.user_id = st.user_id
WHERE (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) / (n_days - 1) > 0
ORDER BY c.user_id, c.day"""

  /** Equi-width histogram of order totals: 20 buckets over the observed
    * [min, max], per-bucket count and exact min/max — the data-profiling
    * pass every ingest pipeline runs. The one-row bounds frame is
    * broadcast; bucketing is a per-row projection with the identical
    * double expression on both engines (min/max/floor are exact, no
    * accumulation), so bucket edges agree bit-for-bit.
    */
  def q68_price_histogram(s: SparkSession, dir: String): DataFrame = {
    val bounds = t(s, dir, "orders").agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val width = (col("hi") - col("lo")) / 20
    t(s, dir, "orders").select("o_totalprice")
      .crossJoin(broadcast(bounds))
      .select(least(floor((col("o_totalprice") - col("lo")) / width), lit(19.0))
        .cast("long").as("bucket"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("lo_price"), max("o_totalprice").as("hi_price"))
      .orderBy("bucket")

  }

  val q68Sql: String =
    """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19.0) AS BIGINT) AS bucket,
       count(*) AS n, min(o_totalprice) AS lo_price, max(o_totalprice) AS hi_price
FROM orders, b GROUP BY bucket ORDER BY bucket"""

  /** Calendar-function sweep: month truncation, year/quarter extraction,
    * day-of-month and weekday classification in one monthly revenue
    * rollup. Weekday parity trap: Spark's weekday() is Monday=0 while
    * DuckDB's dayofweek() is Sunday=0 — the oracle uses isodow()-1 to
    * match. All date parts are exact integers; only the revenue sum is
    * floating point. One partial-aggregated groupBy on the month — the
    * standard reporting rollup at any scale.
    */
  def q69_date_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        dayofmonth(col("o_orderdate")).as("dom"),
        weekday(col("o_orderdate")).as("wd"),
        col("o_totalprice"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum("o_totalprice").as("revenue"),
        round(avg(col("dom")), 6).as("avg_day_of_month"),
        sum(when(col("wd") >= 5, 1L).otherwise(0L)).as("n_weekend"))
      .select(col("month"),
        year(col("month")).cast("long").as("yr"),
        quarter(col("month")).cast("long").as("qtr"),
        col("n_orders"), col("revenue"), col("avg_day_of_month"), col("n_weekend"))
      .orderBy("month")

  val q69Sql: String =
    """WITH o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       day(o_orderdate) AS dom, isodow(o_orderdate) - 1 AS wd, o_totalprice FROM orders)
SELECT month, CAST(year(month) AS BIGINT) AS yr, CAST(quarter(month) AS BIGINT) AS qtr,
       count(*) AS n_orders, sum(o_totalprice) AS revenue,
       round(avg(dom), 6) AS avg_day_of_month,
       CAST(sum(CASE WHEN wd >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
FROM o GROUP BY month ORDER BY month"""

  /** Schema-full JSON parsing: from_json materializes the props struct
    * (q30's get_json_object is the schema-less path-extraction twin),
    * then the typed field feeds a decile histogram. Parsing is a narrow
    * per-row projection; a malformed document yields a NULL struct
    * (PERMISSIVE), never a task failure — the ingest-safety contract.
    */
  def q70_json_struct(s: SparkSession, dir: String): DataFrame = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
    Tables.events(s, dir)
      .select(col("event_type"), from_json(col("props"), schema).as("p"))
      .select(col("event_type"), floor(col("p.k").cast("double") / 10).cast("long").as("k_decile"))
      .groupBy("event_type", "k_decile")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "k_decile")
  }

  val q70Sql: String =
    """SELECT event_type,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_decile,
       count(*) AS n
FROM events GROUP BY event_type, k_decile ORDER BY event_type, k_decile"""

  /** Per-group Pearson correlation (quantity vs discounted price)
    * assembled from the five moment sums instead of a black-box corr()
    * — both engines evaluate the identical closed formula over the same
    * partial-aggregated sums, so there is no accumulator-algorithm
    * (Welford vs textbook) divergence to leak past the rounding. The
    * moment sums are the associative map-side-combinable shape that
    * scales; corr() itself is spec-checked against this formulation.
    */
  def q71_price_correlation(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val moments = t(s, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val cov = col("sxy") - col("sx") * col("sy") / n
    val vx = col("sxx") - col("sx") * col("sx") / n
    val vy = col("syy") - col("sy") * col("sy") / n
    moments
      .select(col("l_returnflag"), col("n"),
        round(cov / sqrt(vx * vy), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val q71Sql: String =
    """WITH m AS (
  SELECT l_returnflag, count(*) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice * (1 - l_discount)) AS sy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * (1 - l_discount) * l_extendedprice * (1 - l_discount)) AS syy,
         sum(l_quantity * l_extendedprice * (1 - l_discount)) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
FROM m ORDER BY l_returnflag"""

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click strictly after it, the first purchase
    * strictly after that — order-dependent (a click before the first
    * view does not count), which is what separates a funnel from three
    * independent counts. Three keyed aggregations chained by keyed
    * joins on user_id; each stage's frame shrinks, so at scale the
    * chain costs one shuffle per stage over ever-smaller keyed sets.
    */
  def q74_funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").cast("long").as("sec"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("sec") > col("t_view"))
      .groupBy("user_id").agg(min("sec").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("sec") > col("t_click"))
      .groupBy("user_id").agg(min("sec").as("t_purchase"))
    v.select(lit(1L).as("stage"), lit("view").as("stage_name"), col("user_id"))
      .union(c.select(lit(2L), lit("click_after_view"), col("user_id")))
      .union(p.select(lit(3L), lit("purchase_after_click"), col("user_id")))
      .groupBy("stage", "stage_name")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("stage")
  }

  val q74Sql: String =
    """WITH ev AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
v AS (SELECT user_id, min(sec) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, min(sec) AS t_click FROM ev JOIN v ON ev.user_id = v.user_id
      WHERE event_type = 'click' AND sec > t_view GROUP BY ev.user_id),
p AS (SELECT ev.user_id, min(sec) AS t_purchase FROM ev JOIN c ON ev.user_id = c.user_id
      WHERE event_type = 'purchase' AND sec > t_click GROUP BY ev.user_id),
stages AS (
  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name, user_id FROM v
  UNION ALL SELECT 2, 'click_after_view', user_id FROM c
  UNION ALL SELECT 3, 'purchase_after_click', user_id FROM p)
SELECT stage, stage_name, count(DISTINCT user_id) AS n_users
FROM stages GROUP BY stage, stage_name ORDER BY stage"""

  /** Weekly retention cohorts: users bucketed by first-activity week,
    * counted per (cohort, weeks-since-cohort) — the classic retention
    * triangle. Two keyed aggregations (first week per user; distinct
    * active weeks per user) and one join on user_id; the cohort grid is
    * tiny regardless of event volume, and nothing ever pairs events
    * with events.
    */
  def q75_retention(s: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(s, dir)
      .select(col("user_id"),
        floor(floor(col("ts").cast("timestamp").cast("long").cast("double") / 86400) / 7)
          .cast("long").as("week"))
      .distinct()
    val first = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.join(first, Seq("user_id"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"), col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val q75Sql: String =
    """WITH weeks AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(floor(epoch(ts)) / 86400) / 7) AS BIGINT) AS week
  FROM events),
first AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset, count(DISTINCT w.user_id) AS n_active
FROM weeks w JOIN first f ON w.user_id = f.user_id
GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"""

  /** Within-session event-type transition counts (the Markov edge list
    * behind "what do users do next?"): consecutive same-user events at
    * most 30 minutes apart, keyed by (from, to) type. One shuffle on
    * user_id for the lag window, then a low-cardinality keyed count —
    * the transition matrix is |types|² regardless of event volume.
    * (user_id, sec, event_id) is a total order, so `prev` is
    * deterministic under same-second ties.
    */
  def q76_transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("timestamp").cast("long").as("sec"))
      .select(col("event_type").as("to_type"),
        lag("event_type", 1).over(w).as("from_type"),
        (col("sec") - lag("sec", 1).over(w)).as("gap"))
      .filter(col("from_type").isNotNull && col("gap") <= 1800)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  val q76Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
t AS (SELECT event_type AS to_type,
             lag(event_type, 1) OVER w AS from_type,
             sec - lag(sec, 1) OVER w AS gap
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
SELECT from_type, to_type, count(*) AS n
FROM t WHERE from_type IS NOT NULL AND gap <= 1800
GROUP BY from_type, to_type ORDER BY from_type, to_type"""

  /** Per-user inter-event cadence: gap count, mean gap (exact-integer
    * sum / count) and max gap in seconds. The lag window shares the
    * (user_id, sec, event_id) shuffle+sort shape of q76; all outputs
    * derive from integer seconds so the cross-engine hash is exact.
    */
  def q77_event_gaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("sec"))
      .select(col("user_id"), (col("sec") - lag("sec", 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        round(sum("gap").cast("double") / count(lit(1)), 6).as("avg_gap_sec"),
        max("gap").as("max_gap_sec"))
      .orderBy("user_id")
  }

  /** ANSI-mode safe arithmetic surface: Spark 4 runs with ANSI on, so a
    * division by zero or a bad cast in a raw expression is a JOB
    * FAILURE — the ingest-safe form is try_divide/try_cast, which yield
    * NULL exactly where DuckDB's double division and TRY_CAST do, so
    * the null-accounting aggregate is cross-engine exact. k=0 rows
    * exist in the data; 'event_type' never parses as a number — both
    * failure paths are exercised, and the query completes where the
    * unguarded form would throw.
    */
  def q92_try_functions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("value"),
        expr("try_cast(get_json_object(props, '$.k') as bigint)").as("k"))
      .select(col("event_type"),
        expr("try_divide(value, k)").as("ratio"),
        expr("try_cast(event_type as bigint)").as("numeric_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("ratio").isNull.cast("long")).as("n_null_ratio"),
        round(sum(coalesce(col("ratio"), lit(0.0))), 6).as("ratio_sum"),
        count(col("numeric_type")).as("n_numeric"))
      .orderBy("event_type")

  val q92Sql: String =
    """WITH e AS (SELECT event_type, value,
                TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
r AS (SELECT event_type, CAST(value AS DOUBLE) / k AS ratio,
             TRY_CAST(event_type AS BIGINT) AS numeric_type FROM e)
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ratio,
       round(sum(coalesce(ratio, 0.0)), 6) AS ratio_sum,
       CAST(count(numeric_type) AS BIGINT) AS n_numeric
FROM r GROUP BY event_type ORDER BY event_type"""

  /** TPC-H Q6 shape (revenue-change forecast): a pure scan → filter →
    * global agg. Every predicate (date range, discount band, quantity
    * cap) is a plain column comparison, so ALL of them push into the
    * parquet scan as PushedFilters and the plan never materializes a
    * non-qualifying row — the canonical pushdown showcase. No shuffle
    * at all beyond the single-row final aggregate.
    */
  def q88_forecast_revenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ntz("1996-01-01 00:00:00") &&
        col("l_shipdate") < ntz("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_lines"))

  val q88Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue, count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * open orders ⋈ late-shipping lineitems, top 10 open orders by
    * accumulated revenue. The date/segment filters push to each scan
    * BEFORE the joins; customers broadcast after their segment filter;
    * the revenue ranking is a keyed aggregation + bounded sort-limit
    * (TakeOrderedAndProject), never a global materialized sort.
    */
  def q89_shipping_priority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = ntz("1999-03-15 00:00:00")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("order_sec"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q89Sql: String =
    """SELECT l_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_sec, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15' AND l_shipdate > TIMESTAMP '1999-03-15'
GROUP BY l_orderkey, order_sec, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  val q77Sql: String =
    """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
g AS (SELECT user_id, sec - lag(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap FROM e)
SELECT user_id, count(*) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS avg_gap_sec,
       max(gap) AS max_gap_sec
FROM g WHERE gap IS NOT NULL
GROUP BY user_id ORDER BY user_id"""

  /** MERGE INTO semantics as a declarative plan — the DML surface Spark
    * core lacks (Delta/Iceberg provide it as a table op): a target state
    * (newest value per user before 2024-01-15) merged with a source
    * batch (newest value per user after), each key classified
    * insert / update / unchanged / carry with old and new values. The
    * batch face of the streaming cdcUpsertSink, and the audit a lake
    * MERGE emits as its operation metrics.
    *
    * Scale shape: both "newest per key" sides are user-partitioned
    * windows (the q84 LOCF shape — the key is the partition, never a
    * global sort), and the merge itself is ONE full-outer join on the
    * key, the q96 snapshot-diff plan. At 100 TB the target side is the
    * materialized state table read, not a recomputation.
    */
  def q145_merge_upsert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cut = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    def newest(df: DataFrame, as: String): DataFrame =
      df.withColumn("__rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("__rn") === 1)
        .select(col("user_id"), round(col("value"), 6).as(as))
    val ev = Tables.events(s, dir)
    val target = newest(ev.filter(col("ts") < cut), "old_value")
    val source = newest(ev.filter(col("ts") >= cut), "new_value")
    target.join(source, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("old_value").isNull, "insert")
          .when(col("new_value").isNull, "carry")
          .when(col("old_value") =!= col("new_value"), "update")
          .otherwise("unchanged").as("action"),
        coalesce(col("old_value"), lit(0.0)).as("old_value"),
        coalesce(col("new_value"), col("old_value")).as("new_value"))
      .orderBy("user_id")
  }

  val q145Sql: String =
    raw"""WITH t AS (SELECT user_id, round(value, 6) AS old_value FROM (
         SELECT user_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
s AS (SELECT user_id, round(value, 6) AS new_value FROM (
         SELECT user_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1)
SELECT coalesce(t.user_id, s.user_id) AS user_id,
       CASE WHEN t.old_value IS NULL THEN 'insert'
            WHEN s.new_value IS NULL THEN 'carry'
            WHEN t.old_value <> s.new_value THEN 'update'
            ELSE 'unchanged' END AS action,
       coalesce(t.old_value, 0.0) AS old_value,
       coalesce(s.new_value, t.old_value) AS new_value
FROM t FULL OUTER JOIN s ON s.user_id = t.user_id
ORDER BY user_id"""
}
