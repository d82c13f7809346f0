package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Num._

/** Group B — relational query surface (SURVEY.md §2.3).
  *
  * The reference (`/root/reference/src/parquet_stream_writer/writer.py`)
  * has no query surface of its own; its correctness contract is "a
  * standard engine can query what it wrote" (`tests/tests.py:45-47`).
  * These queries exercise that contract with pure Spark built-ins so
  * Catalyst handles pushdown/pruning/join-strategy selection.
  *
  * Scale notes (100 TB stance):
  *  - dimension tables (region/nation/customer/part/supplier) are tiny
  *    relative to fact tables at every TPC-H-ish scale → explicit
  *    `broadcast()` hints keep the fact-table joins shuffle-free;
  *  - aggregates are partial+final (map-side combine) automatically;
  *  - every filter is a plain column predicate so it pushes into the
  *    parquet scan (verified via .explain PushedFilters);
  *  - decimal aggregation (see [[Num]]) keeps results deterministic
  *    regardless of task/partition ordering.
  */
object Relational {

  // per-call temp-view name suffix for the SQL-only queries (LATERAL,
  // GROUPING SETS): session-global fixed names are not reentrant
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** TPC-H Q1-style pricing summary: scan-side filter, 2-key hash agg. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val disc  = (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
      .cast(DecimalType(18, 4)) // exact: 2-dec × 2-dec has ≤4 decimals
    val charge = (disc * (lit(1) + dec($"l_tax")))
      .cast(DecimalType(18, 6)) // exact: ≤4-dec × 2-dec has ≤6 decimals
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Multi-way equi-join: orders ⋈ customer ⋈ nation, revenue per
    * nation, top-10. customer/nation broadcast (shuffle-free at scale).
    */
  def joinOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"revenue".desc, $"n_name")
      .limit(10)
  }

  val joinOrdersSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name
      |LIMIT 10""".stripMargin

  /** Semi/anti joins: customers with vs without orders, one tagged DF. */
  def semiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val semi = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", lit("has_orders").as("tag"))
    val anti = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", lit("no_orders").as("tag"))
    semi.unionAll(anti).orderBy($"c_custkey", $"tag")
  }

  val semiAntiSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, 'has_orders' AS tag FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS tag FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |) ORDER BY c_custkey, tag""".stripMargin

  /** Window function: top-2 orders per customer by total price.
    * Deterministic tiebreak on o_orderkey. Partition-local sort only —
    * no global sort until the final presentation ORDER BY.
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  val windowRankSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  /** Set operations over part slices: UNION (distinct), INTERSECT, EXCEPT. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables(s, dir, "part")
    val small = p.filter($"p_size" < 25).select($"p_partkey", $"p_brand")
    val pricey = p.filter($"p_retailprice" > 1200.0).select($"p_partkey", $"p_brand")
    small.union(pricey).distinct()
      .except(small.intersect(pricey))
      .orderBy($"p_partkey", $"p_brand")
  }

  val setOpsSql: String =
    """(SELECT p_partkey, p_brand FROM part WHERE p_size < 25
      | UNION
      | SELECT p_partkey, p_brand FROM part WHERE p_retailprice > 1200.0)
      |EXCEPT
      |(SELECT p_partkey, p_brand FROM part WHERE p_size < 25
      | INTERSECT
      | SELECT p_partkey, p_brand FROM part WHERE p_retailprice > 1200.0)
      |ORDER BY p_partkey, p_brand""".stripMargin

  /** Event-time tumbling windows (1 h) per event type. Uses Spark's
    * `window()` operator; oracle expresses the same bucketing with
    * date_trunc. The events `ts` is ns in parquet — Spark truncates to
    * µs, which is invisible at 1-hour granularity.
    */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  val eventsTumblingSql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Weekly cohort-retention matrix over the event stream — the
    * classic product-analytics capstone: each cohort = the ISO week of a
    * user's FIRST event, each cell = distinct cohort users active
    * `week_offset` weeks later, with exact integer retention ppm
    * against the cohort's own offset-0 size (every cohort member is
    * active at offset 0 by construction, so the base is the cell
    * itself).
    *
    * Scale shape — the whole per-user story is ONE user-keyed
    * exchange over a SINGLE events scan: `groupBy(user_id).agg(min
    * (ts), collect_set(week))` computes the cohort and the deduped
    * activity weeks together (both aggregates combine map-side, so
    * the shuffle carries one compact row per user per map task, never
    * raw events), and exploding the week set replaces the
    * activity⋈firsts join entirely. The textbook two-pass form
    * (first-event aggregate + (user, week) distinct + join back) was
    * measured to scan events TWICE and re-shuffle the dedup output
    * user-keyed for the join at scale — this form halves the fact
    * I/O and drops the join. After the explode each user contributes
    * at most one row per (cohort, offset) — weeks are week-truncated,
    * so distinct weeks map to distinct offsets — which turns
    * COUNT(DISTINCT user) into a plain map-side-combinable COUNT(*).
    * The retention window then runs over the cohort×offset AGGREGATE
    * (weeks² rows, never events). PlanSpec pins all of it: one
    * events scan, no join, and exactly the four exchanges this story
    * needs (user, cohort×offset, cohort window, output range sort).
    * The `user_id IS NOT NULL` filter keeps the old join-form
    * semantics (a join on user_id drops nulls; a groupBy would keep
    * them). `ts IS NOT NULL` is filtered EXPLICITLY in both engines:
    * the single-scan form's `collect_set` silently drops a NULL week
    * where the old distinct+join form emitted a NULL week_offset cell
    * — rather than leaning on the fixture's non-null ts, the filter
    * pins one semantics ("an event without a timestamp is not
    * activity") so the two forms cannot diverge on a corpus with
    * corrupt rows.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir, "events")
      .where($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", $"ts", date_trunc("week", $"ts").as("week"))
      .groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"),
        collect_set($"week").as("weeks"))
      .select($"user_id", $"cohort_week", explode($"weeks").as("week"))
      .groupBy($"cohort_week",
        expr("datediff(week, cohort_week) div 7").cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_size",
        max(when($"week_offset" === 0, $"n_users"))
          .over(Window.partitionBy($"cohort_week")))
      .select($"cohort_week", $"week_offset", $"n_users",
        expr("(n_users * 1000000) div cohort_size").as("retained_ppm"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val retentionCohortsSql: String =
    """WITH e AS (
      |  SELECT user_id, ts FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |f AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      |  FROM e GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      |  FROM e),
      |g AS (
      |  SELECT cohort_week,
      |    CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
      |    COUNT(DISTINCT a.user_id) AS n_users
      |  FROM a JOIN f USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_users,
      |  CAST(n_users * 1000000 // MAX(CASE WHEN week_offset = 0 THEN n_users END)
      |    OVER (PARTITION BY cohort_week) AS BIGINT) AS retained_ppm
      |FROM g ORDER BY cohort_week, week_offset""".stripMargin

  /** Scalar string/math function battery over part. */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select(
        $"p_partkey",
        upper(substring($"p_name", 1, 8)).as("name8"),
        length($"p_name").as("name_len"),
        ($"p_partkey" % 7).as("key_mod7"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        regexp_replace($"p_type", "a", "_").as("type_sub"),
        abs($"p_size" - 25).as("size_dist"),
        (dec($"p_retailprice") * 2).cast("double").as("double_price"))
      .orderBy($"p_partkey")
  }

  val scalarFuncsSql: String =
    """SELECT p_partkey,
      |  UPPER(SUBSTRING(p_name, 1, 8)) AS name8,
      |  LENGTH(p_name) AS name_len,
      |  p_partkey % 7 AS key_mod7,
      |  CONCAT(p_brand, '#', p_type) AS brand_type,
      |  REGEXP_REPLACE(p_type, 'a', '_', 'g') AS type_sub,
      |  ABS(p_size - 25) AS size_dist,
      |  CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 2 AS DOUBLE) AS double_price
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time function battery over orders. */
  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"),
        date_add($"o_orderdate".cast("date"), 30).as("due_date"))
      .orderBy($"o_orderkey")
  }

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(YEAR(o_orderdate) AS INT) AS y,
      |  CAST(MONTH(o_orderdate) AS INT) AS m,
      |  CAST(DAY(o_orderdate) AS INT) AS d,
      |  CAST(QUARTER(o_orderdate) AS INT) AS q,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Rollup (grouping sets) over orders: per (status, priority), per
    * status, and grand total. GROUPING() flags disambiguate subtotal
    * rows from genuine NULL group keys — with bare coalesce a real
    * NULL priority and the per-status subtotal both rendered as
    * (status, 'ALL') and collided under identical sort keys.
    */
  def rollupOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      // grouping() is only resolvable inside the grouping aggregate
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
        grouping($"o_orderstatus").cast("long").as("g_status"),
        grouping($"o_orderpriority").cast("long").as("g_priority"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_status", $"g_priority", $"n", $"total")
      .orderBy($"g_status", $"g_priority", $"status", $"priority")
  }

  val rollupOrdersSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Global top-k: most expensive lineitems (sort + limit → Spark
    * TakeOrderedAndProject, no full global sort at scale).
    */
  def topK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(25)
  }

  val topKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  /** Full cube over part (brand × ptype): all four grouping-set
    * combinations; GROUPING() flags disambiguate genuine NULLs from
    * subtotal rows.
    */
  def cubeParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .cube($"p_brand", $"p_type")
      .agg(
        // grouping() is only valid inside the cube's aggregate list
        grouping($"p_brand").cast("long").as("g_brand"),
        grouping($"p_type").cast("long").as("g_ptype"),
        count(lit(1)).as("n"), Num.dsum($"p_retailprice").as("total_price"))
      .select(
        coalesce($"p_brand", lit("ALL")).as("brand"),
        coalesce($"p_type", lit("ALL")).as("ptype"),
        $"g_brand", $"g_ptype", $"n", $"total_price")
      .orderBy($"brand", $"ptype", $"g_brand", $"g_ptype")
  }

  val cubePartsSql: String =
    """SELECT COALESCE(p_brand, 'ALL') AS brand,
      |  COALESCE(p_type, 'ALL') AS ptype,
      |  CAST(GROUPING(p_brand) AS BIGINT) AS g_brand,
      |  CAST(GROUPING(p_type) AS BIGINT) AS g_ptype,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM part
      |GROUP BY CUBE (p_brand, p_type)
      |ORDER BY brand, ptype, g_brand, g_ptype""".stripMargin

  /** JSON scalar functions over the events `props` column. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"),
        ((get_json_object($"props", "$.k").cast("long") % 10) === 0).as("k_mod10"))
      .orderBy($"event_id")
  }

  val jsonFuncsSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0 AS k_mod10
      |FROM events ORDER BY event_id""".stripMargin

  /** TPC-H Q5-style local-supplier volume: 6-way join across every
    * fixture dimension (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    * nation ⋈ region), revenue per nation where supplier and customer
    * share the nation, one region. Shape at scale: the two fact
    * tables join on their natural keys (shuffle), every dimension
    * broadcasts, the region filter prunes nation rows before the
    * broadcast — Catalyst orders it all from the declarative plan.
    */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val revenue = (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
      .cast(DecimalType(18, 4))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "supplier")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
      |        * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Left outer join keeping empty groups: every customer with their
    * order count and revenue, zero-order customers included. The agg
    * runs BEFORE the join (aggregate the fact table, then join the
    * dimension) so the join input is one row per customer, not one
    * per order — at scale this is the difference between joining 1.5M
    * rows and joining 15 B.
    */
  def outerJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("rev"))
    Tables(s, dir, "customer")
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select($"c_custkey",
        coalesce($"cnt", lit(0L)).as("n_orders"),
        coalesce($"rev", lit(0.0)).as("revenue"))
      .orderBy($"c_custkey")
  }

  val outerJoinSql: String =
    """SELECT c_custkey,
      |  COALESCE(cnt, 0) AS n_orders,
      |  COALESCE(rev, 0.0) AS revenue
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, COUNT(*) AS cnt,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Scalar subquery: orders priced above the global average. The
    * 1-row aggregate broadcasts; decimal-exact average keeps the
    * threshold bit-identical across engines.
    */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    val avgPrice = o.agg(davg($"o_totalprice").as("avg_price"))
    o.crossJoin(broadcast(avgPrice))
      .filter($"o_totalprice" > $"avg_price")
      .select($"o_orderkey", $"o_totalprice", $"avg_price")
      .orderBy($"o_orderkey")
  }

  val scalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |   FROM orders) AS avg_price
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |                      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** LATERAL correlated top-n per group — the one per-group-top-k
    * formulation the window queries don't exercise: Catalyst
    * decorrelates the LIMIT-ed lateral subquery into a per-key join +
    * local top-k instead of a global window, a planner path
    * (DomainJoin rewrite) worth pinning in the inventory because SQL
    * users write exactly this shape. Dimension side is tiny (nation),
    * so the decorrelated join broadcasts; ties break on c_name for
    * engine-stable output.
    */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    // per-call view names + drop-after-analysis: fixed names made two
    // concurrent/interleaved calls against different dirs silently
    // read each other's corpus (s.sql resolves views eagerly, so
    // dropping right after keeps the returned frame valid)
    val tag = viewSeq.incrementAndGet()
    val (nv, cv) = (s"graft_nation_$tag", s"graft_customer_$tag")
    Tables(s, dir, "nation").createOrReplaceTempView(nv)
    Tables(s, dir, "customer").createOrReplaceTempView(cv)
    try s.sql(
      s"""SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM $nv n, LATERAL (
        |  SELECT c_name, c_acctbal FROM $cv c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    finally { s.catalog.dropTempView(nv); s.catalog.dropTempView(cv) }
  }

  val lateralTopNSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  /** TPC-H Q17's semantics — per brand, the lineitems ordering LESS
    * than 20% of their part's average quantity (the small-order
    * fringe Q17 prices out) — shipped as the explicit single
    * per-partkey aggregate + join. The textbook correlated-subquery
    * form (two correlated scalar aggregates; kept verbatim as the
    * DuckDB oracle, [[correlatedAggSql]]) decorrelates in Spark 4.1
    * to TWO per-partkey aggregates over lineitem — three fact-table
    * scans, two fact-keyed shuffles; MergeScalarSubqueries does not
    * merge the decorrelated pair (verified on the physical plan). At
    * 100× that duplicated lineitem aggregate is the whole cost of the
    * query, so the explicit form computes COUNT and SUM in ONE
    * per-partkey pass and joins it back — PlanSpec pins ≤2 lineitem
    * scans, and the green oracle hash proves explicit ≡ correlated
    * on every row. RelationalEdgeSpec additionally pins the
    * correlated form itself against this plan on a seeded corpus, so
    * the decorrelation path stays exercised. The 20%-of-average cut
    * is expressed EXACTLY as `qty·5·cnt(part) < sum(part)` — all
    * decimal/integer arithmetic, algebraically identical to
    * `qty < 0.2·avg` — so the predicate boundary never rides a
    * double and both engines agree on every edge row. (An inner join
    * to the aggregate is equivalent to the subqueries: every outer
    * row is itself a lineitem of its part, so the per-part group is
    * never empty.)
    */
  def correlatedAgg(s: SparkSession, dir: String): DataFrame = {
    val tag = viewSeq.incrementAndGet()
    val (lv, pv) = (s"graft_lineitem_$tag", s"graft_part_$tag")
    Tables(s, dir, "lineitem").createOrReplaceTempView(lv)
    Tables(s, dir, "part").createOrReplaceTempView(pv)
    try s.sql(
      s"""WITH a AS (
        |  SELECT l_partkey AS pk, COUNT(*) AS cnt,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_sum
        |  FROM $lv GROUP BY l_partkey)
        |SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS small_revenue
        |FROM $lv l JOIN $pv ON p_partkey = l_partkey
        |JOIN a ON a.pk = l.l_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * a.cnt < a.qty_sum
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
    finally { s.catalog.dropTempView(lv); s.catalog.dropTempView(pv) }
  }

  /** The textbook correlated-subquery form of [[correlatedAgg]] —
    * same text as the DuckDB oracle. Never on the registry path; kept
    * so RelationalEdgeSpec can pin explicit ≡ correlated inside Spark
    * (the decorrelation path stays exercised even though the shipped
    * plan avoids it).
    */
  private[graft] def correlatedAggSubqueryForm(
      s: SparkSession, dir: String): DataFrame = {
    val tag = viewSeq.incrementAndGet()
    val (lv, pv) = (s"graft_lineitem_$tag", s"graft_part_$tag")
    Tables(s, dir, "lineitem").createOrReplaceTempView(lv)
    Tables(s, dir, "part").createOrReplaceTempView(pv)
    try s.sql(
      s"""SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS small_revenue
        |FROM $lv l JOIN $pv ON p_partkey = l_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 *
        |    (SELECT COUNT(*) FROM $lv l2 WHERE l2.l_partkey = l.l_partkey) <
        |  (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,4))) FROM $lv l3
        |   WHERE l3.l_partkey = l.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
    finally { s.catalog.dropTempView(lv); s.catalog.dropTempView(pv) }
  }

  val correlatedAggSql: String =
    """SELECT p_brand, COUNT(*) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |    AS small_revenue
      |FROM lineitem l JOIN part ON p_partkey = l_partkey
      |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 *
      |    (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) <
      |  (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,4))) FROM lineitem l3
      |   WHERE l3.l_partkey = l.l_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Explicit GROUPING SETS — the general form `rollup`/`cube`
    * specialize: an arbitrary, non-hierarchical set list ((status,
    * priority), (priority), ()) that neither of those can express.
    * Same single-pass Expand-based plan as rollup/cube; GROUPING()
    * flags disambiguate subtotal rows from genuine values.
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    // per-call view name, same reentrancy contract as lateralTopN
    val ov = s"graft_orders_${viewSeq.incrementAndGet()}"
    Tables(s, dir, "orders").createOrReplaceTempView(ov)
    try s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM $ov
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin)
    finally s.catalog.dropTempView(ov)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())
      |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin

  /** Pivot: order counts per status, priorities as columns. The pivot
    * value list is EXPLICIT — Spark otherwise runs an extra distinct
    * job to discover it, and column order would depend on data.
    */
  def pivotOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L, priorities)
      .select($"o_orderstatus" +: priorities.map(p => col(s"`$p`").as(p)): _*)
      .orderBy($"o_orderstatus")
  }

  val pivotOrdersSql: String =
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
      |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
      |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
      |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
      |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Range (non-equi) join: every lineitem matched to its price band
    * — the interval-lookup shape (rate tables, SLA tiers, histogram
    * binning) equi-joins can't express. The band table is a handful
    * of rows, so the right plan is a BROADCAST nested-loop with the
    * BETWEEN predicate evaluated stream-side — each lineitem scans k
    * bands in memory, the fact table never shuffles. (With both sides
    * large this becomes the classic range-join problem — bin the
    * interval space and equi-join on bin, the [[graft.queries.Pipeline]]
    * blocking pattern; at k bands the broadcast NLJ is strictly
    * better.) Aggregation after the join keys on the band's fixed
    * domain. The top band is OPEN-ENDED (`hi` = NULL = unbounded): a
    * closed top band would silently drop any row above it from the
    * report with no signal, so the band table's contract is total
    * coverage of the non-negative price domain by construction.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (1L, 0L, Some(10000L)), (2L, 10000L, Some(25000L)),
      (3L, 25000L, Some(50000L)), (4L, 50000L, None: Option[Long]))
      .toDF("band_id", "lo", "hi")
    Tables(s, dir, "lineitem")
      .join(broadcast(bands),
        $"l_extendedprice" >= $"lo" &&
          ($"hi".isNull || $"l_extendedprice" < $"hi"))
      .groupBy($"band_id", $"lo", $"hi")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"band_id")
  }

  val rangeJoinSql: String =
    """WITH bands(band_id, lo, hi) AS (
      |  VALUES (1, 0, 10000), (2, 10000, 25000), (3, 25000, 50000),
      |         (4, 50000, CAST(NULL AS INTEGER)))
      |SELECT CAST(band_id AS BIGINT) AS band_id, CAST(lo AS BIGINT) AS lo,
      |  CAST(hi AS BIGINT) AS hi, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN bands
      |  ON l_extendedprice >= lo AND (hi IS NULL OR l_extendedprice < hi)
      |GROUP BY band_id, lo, hi ORDER BY band_id""".stripMargin

  /** Salt fan-out for the skewed-join demo: each dim row is
    * replicated SALT_N ways, each fact row picks one replica by id
    * hash — the hot key's rows spread across SALT_N shuffle
    * partitions instead of one straggler task.
    */
  private val SALT_N = 8

  /** Skewed equi-join with explicit salting — the classic 100 TB
    * failure mode demonstrated and mitigated: `documents.lang` is a
    * hot key (the fixture's `en` holds ~44% of all rows; a web corpus
    * is worse), so a plain shuffle join on `lang` sends nearly half
    * the fact table through ONE reducer. The mitigation pattern when
    * the dim side is too large to broadcast: replicate the dim
    * [[SALT_N]] ways, salt the fact side by a uniform id hash, and
    * join on (key, salt) — the hot key's rows now land on [[SALT_N]]
    * reducers. Salting is pure plumbing: the oracle is the PLAIN
    * join, which is what makes this a correctness-checked demo and
    * not a benchmark trick. The merge hints pin a SortMergeJoin so
    * the salted shuffle shape is what actually runs (AQE would
    * otherwise broadcast this fixture-sized dim; its own skew-join
    * split only engages past the 256 MB partition threshold —
    * unreachable at test SF, which is why the demo salts explicitly).
    * Output is integer-exact (share in ppm by integer division) so
    * the hash check is engine-stable.
    */
  def skewJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val dim = docs.groupBy($"lang")
      .agg(count(lit(1)).as("lang_docs"), sum($"n_chars").as("lang_chars"))
      .withColumn("salt", explode(sequence(lit(0), lit(SALT_N - 1))))
    val fact = docs.select($"doc_id", $"lang", $"n_chars")
      .withColumn("salt", pmod(xxhash64($"doc_id"), lit(SALT_N.toLong)).cast("int"))
    fact.hint("merge")
      .join(dim.hint("merge"), Seq("lang", "salt"))
      .select($"doc_id", $"lang", $"lang_docs",
        // nullif for the zero-sum lang group: engine-parity on division
        expr("n_chars * 1000000 div nullif(lang_chars, 0)").as("share_ppm"))
      .orderBy($"doc_id")
  }

  val skewJoinSql: String =
    """WITH dim AS (
      |  SELECT lang, COUNT(*) AS lang_docs, SUM(n_chars) AS lang_chars
      |  FROM documents GROUP BY 1)
      |SELECT doc_id, d.lang, lang_docs,
      |  CAST(n_chars * 1000000 // NULLIF(lang_chars, 0) AS BIGINT) AS share_ppm
      |FROM documents d JOIN dim USING (lang)
      |ORDER BY doc_id""".stripMargin

  /** UNPIVOT — [[pivotOrders]]'s inverse: the per-returnflag metric
    * columns melted into (metric, value) rows, the wide→long reshape
    * reporting layers ask of an engine. Native `Dataset.unpivot`
    * (Catalyst `Expand` under the hood — one pass, no join); sums are
    * exact decimal before the single presentation cast, so the melted
    * doubles hash identically cross-engine.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_discount").as("sum_disc"))
      .unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"sum_base_price", $"sum_disc"),
        "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  val unpivotMetricsSql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
      |UNION ALL SELECT l_returnflag, 'sum_base_price', sum_base_price FROM a
      |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
      |ORDER BY l_returnflag, metric""".stripMargin

  /** RANGE-frame window: trailing-7-day order count and revenue per
    * customer, anchored on each order. The frame is defined on event
    * time (seconds), not row position — a different frame engine than
    * the ROWS frames used elsewhere.
    */
  def movingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-7L * 24 * 3600, 0L)
    Tables(s, dir, "orders")
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("rev_7d", sum(dec($"o_totalprice")).over(w).cast("double"))
      .select($"o_orderkey", $"o_custkey", $"n_7d", $"rev_7d")
      .orderBy($"o_orderkey")
  }

  val movingWindowSql: String =
    """SELECT o_orderkey, o_custkey,
      |  COUNT(*) OVER w AS n_7d,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS rev_7d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
      |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** Sequential-conversion funnel over the event stream — the
    * behavioral-analytics shape plain joins/windows don't directly
    * express: how many users progressed view → click → purchase, in
    * that order, with first-touch semantics (stage k's clock starts at
    * the FIRST time the user reached stage k-1; same-instant events
    * count as progress — `>=`, deterministic under ties because every
    * stage time is a min). Built as chained per-user min-aggregations
    * + user_id-keyed joins, never a window sort over a user's whole
    * event history: each stage is one exchange on user_id (partial
    * aggs map-side), so a power user with a billion events costs a
    * mergeable min, not an in-task sort. Output is 3 rows; conversion
    * is exact integer ppm vs stage 1.
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" >= $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" >= $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    def stage(df: DataFrame, k: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(k).as("stage"), lit(name).as("event_type"), $"n_users")
    stage(v, 1, "view")
      .union(stage(c, 2, "click"))
      .union(stage(p, 3, "purchase"))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("nv"))))
      .select($"stage", $"event_type", $"n_users",
        // nullif: an empty stage-1 cohort must read as NULL in BOTH
        // engines (DuckDB's // raises on zero where Spark's div nulls)
        expr("(n_users * 1000000) div nullif(nv, 0)").as("conv_ppm"))
      .orderBy($"stage")
  }

  val eventFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1),
      |stages AS (
      |  SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM v
      |  UNION ALL SELECT 2, 'click', COUNT(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p)
      |SELECT stage, event_type, n_users,
      |  CAST((n_users * 1000000) // NULLIF(nv, 0) AS BIGINT) AS conv_ppm
      |FROM stages, (SELECT COUNT(*) AS nv FROM v)
      |ORDER BY stage""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_funnel"    -> eventFunnel _,
    "q_pivot"           -> pivotOrders _,
    "q_moving_window"   -> movingWindow _,
    "q_local_supplier"  -> localSupplierVolume _,
    "q_outer_join"      -> outerJoin _,
    "q_scalar_subquery" -> scalarSubquery _,
    "q_cube"            -> cubeParts _,
    "q_json_funcs"      -> jsonFuncs _,
    "q_pricing_summary" -> pricingSummary _,
    "q_join_orders"     -> joinOrders _,
    "q_semi_anti"       -> semiAnti _,
    "q_window_rank"     -> windowRank _,
    "q_setops"          -> setOps _,
    "q_events_tumbling" -> eventsTumbling _,
    "q_retention_cohorts" -> retentionCohorts _,
    "q_scalar_funcs"    -> scalarFuncs _,
    "q_date_funcs"      -> dateFuncs _,
    "q_rollup"          -> rollupOrders _,
    "q_topk"            -> topK _,
    "q_lateral_topn"    -> lateralTopN _,
    "q_correlated_agg"  -> correlatedAgg _,
    "q_grouping_sets"   -> groupingSets _,
    "q_unpivot"         -> unpivotMetrics _,
    "q_range_join"      -> rangeJoin _,
    "q_skew_join"       -> skewJoin _)

  val oracle: Map[String, String] = Map(
    "q_event_funnel"    -> eventFunnelSql,
    "q_pivot"           -> pivotOrdersSql,
    "q_moving_window"   -> movingWindowSql,
    "q_local_supplier"  -> localSupplierVolumeSql,
    "q_outer_join"      -> outerJoinSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_cube"            -> cubePartsSql,
    "q_json_funcs"      -> jsonFuncsSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_join_orders"     -> joinOrdersSql,
    "q_semi_anti"       -> semiAntiSql,
    "q_window_rank"     -> windowRankSql,
    "q_setops"          -> setOpsSql,
    "q_events_tumbling" -> eventsTumblingSql,
    "q_retention_cohorts" -> retentionCohortsSql,
    "q_scalar_funcs"    -> scalarFuncsSql,
    "q_date_funcs"      -> dateFuncsSql,
    "q_rollup"          -> rollupOrdersSql,
    "q_topk"            -> topKSql,
    "q_lateral_topn"    -> lateralTopNSql,
    "q_correlated_agg"  -> correlatedAggSql,
    "q_grouping_sets"   -> groupingSetsSql,
    "q_unpivot"         -> unpivotMetricsSql,
    "q_range_join"      -> rangeJoinSql,
    "q_skew_join"       -> skewJoinSql)
}
