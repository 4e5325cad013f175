package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator inventory (SURVEY §2.3 "delegated" categories).
  *
  * The reference delegates scans/filters/joins/aggregates/windows/sorts/
  * set-ops/scalar functions to DataFusion unchanged; the Spark-native
  * equivalent is the stock DataFrame API, declared here so Catalyst keeps
  * full pushdown/pruning/codegen. Each query is written scale-first:
  *  - aggregation uses partial (map-side) combine automatically;
  *  - small dimension tables are `broadcast(...)` so the fact table never
  *    shuffles for the join;
  *  - sums over binary doubles go through DECIMAL so results are exact and
  *    shuffle-order-independent (a 1000-executor sum must not depend on
  *    reduction order);
  *  - top-k uses sort+limit which Spark executes as TakeOrderedAndProject
  *    (per-partition top-k then merge — no global sort at scale);
  *  - ties are always broken by a unique key so results are deterministic
  *    under any parallelism.
  */
object Inventory {
  import Tables._

  // oracle-parity decimal-sum rendering: shared home in queries.Render
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    Render.dsum(c, scale)
  private def dsumd(c: org.apache.spark.sql.Column, scale: Int = 2) =
    Render.dsumd(c, scale)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation: hash agg, partial+final, multiple fns (TPC-H Q1 shape)
    "q_agg_pricing" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
    }),
    // ---- aggregation: exact distinct
    "q_agg_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("distinct_orders"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("cnt"))
    }),
    // ---- join: broadcast dim -> fact, 3-way, then agg
    "q_join_revenue" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      val l = lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          dsumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    // ---- join: left semi (EXISTS)
    "q_join_semi" -> ((s, d) => {
      val o = orders(s, d)
      val l = lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),
    // ---- join: left anti (NOT EXISTS)
    "q_join_anti" -> ((s, d) => {
      val c = customer(s, d)
      val big = orders(s, d).filter(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    // ---- join: left outer with null-side aggregation
    "q_join_outer" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),
    // ---- window: ranking within partition, deterministic tie-break
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),
    // ---- window: analytic (running sum / lag) over unique ordering
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("run_cnt",
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
        .select("o_custkey", "o_orderkey", "run_cnt", "prev_order")
    }),
    // ---- window: RANGE frame over event-time (30-day trailing sum)
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("epoch_s"))
        .rangeBetween(-2592000L, Window.currentRow)
      orders(s, d)
        .withColumn("epoch_s",
          unix_timestamp(col("o_orderdate").cast("timestamp")))
        .withColumn("sum30d",
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w)
            .cast(org.apache.spark.sql.types.DecimalType(38, 2))
            .cast("double"))
        .select("o_orderkey", "sum30d")
    }),
    // ---- Z-order key: Morton interleave of two 16-bit codes, pure
    // bitwise built-ins (whole-stage codegen) — the clustering key
    // behind Layouts.writeZOrdered, recomputed bit-for-bit in DuckDB
    "q_zorder_key" -> ((s, d) => {
      import graft.functions.ZOrder
      orders(s, d).select(
        col("o_orderkey"),
        ZOrder.interleave16(
          col("o_custkey").bitwiseAND(lit(65535L)),
          datediff(to_date(col("o_orderdate")),
            lit("1992-01-01").cast("date")).cast("long")
            .bitwiseAND(lit(65535L))).as("zkey"))
    }),
    // ---- scalar functions: array family
    "q_scalar_array" -> ((s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        element_at(words, 1).as("w1"),
        element_at(words, 5).as("w5"),
        array_contains(split(lower(col("text")), " "), "spark").as("has_spark"),
        size(array_distinct(words)).as("n_distinct"))
    }),
    // ---- sort + limit = distributed top-k (TakeOrderedAndProject)
    "q_topk_orders" -> ((s, d) => {
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),
    // ---- set ops: union all + distinct-agg
    "q_set_union" -> ((s, d) => {
      val a = orders(s, d).select(col("o_custkey").as("custkey"))
      val b = customer(s, d).select(col("c_custkey").as("custkey"))
      a.unionByName(b).groupBy("custkey").agg(count(lit(1)).as("n"))
    }),
    // ---- set ops: except (distinct semantics)
    "q_set_except" -> ((s, d) => {
      val bigSpenders = orders(s, d).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey"))
      customer(s, d).select(col("c_custkey").as("custkey"))
        .except(bigSpenders)
    }),
    // ---- scalar functions: string family
    "q_scalar_string" -> ((s, d) => {
      customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 5).as("prefix"),
        concat_ws("_", col("c_mktsegment"), col("c_name")).as("tagged"))
    }),
    // ---- scalar functions: date + math family
    "q_scalar_datemath" -> ((s, d) => {
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        abs(col("o_totalprice") - lit(100000.0)).as("dist"))
    }),
    // ---- aggregate + HAVING + ORDER BY chain
    "q_agg_having" -> ((s, d) => {
      orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          dsumd(col("o_totalprice")).as("total_spend"))
        .filter(col("n_orders") >= 12)
        .orderBy(col("total_spend").desc, col("o_custkey").asc)
    }),
    // ---- IN-subquery (Catalyst plans it as a left-semi join)
    "q_subquery_in" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders_v
               WHERE o_custkey IN (SELECT c_custkey FROM customer_v
                                   WHERE c_mktsegment = 'BUILDING')""")
    }),
    // ---- window: equi-depth quartiles per group (ntile)
    "q_window_ntile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))).as("quartile"))
    }),
    // ---- recursive CTE (Spark 4.x WITH RECURSIVE): per-customer order
    // STREAKS — walk the next-order pointer while the gap stays <= 30
    // days. Linked-list recursion (one successor per row) so UNION ALL
    // terminates at the streak length (max 24 orders/customer at sf0.1,
    // streaks <= ~5 — far under the recursion limit); each step is an
    // equi-join Spark shuffles on (cust), no driver loop. NOTE: the
    // recursive term only supports UNION ALL (UNION-dedup raises
    // UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so cyclic closures need the
    // iterative operators (Dedup.clusters) — recursion is for DAG/chain
    // walks like this one.
    "q_recursive_chain" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        WITH RECURSIVE seq AS (
          SELECT o_custkey AS cust, o_orderdate AS d,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders_v),
        chain(cust, rn, d, depth) AS (
          SELECT cust, rn, d, CAST(1 AS BIGINT) AS depth
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT c.cust, s.rn, s.d, c.depth + 1
          FROM chain c JOIN seq s ON c.cust = s.cust AND s.rn = c.rn + 1
          WHERE s.d <= c.d + INTERVAL 30 DAY)
        SELECT cust AS o_custkey, CAST(max(depth) AS BIGINT) AS streak_len
        FROM chain GROUP BY cust""")
    }),
    // ---- pivot (conditional aggregation to columns)
    "q_agg_pivot" -> ((s, d) => {
      events(s, d).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map(
          "click" -> "n_click", "view" -> "n_view", "purchase" -> "n_purchase"))
    }),
    // ---- set ops: intersect (distinct semantics)
    "q_set_intersect" -> ((s, d) => {
      val buyers = orders(s, d).filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey").as("custkey"))
      val eventUsers = events(s, d).select(col("user_id").as("custkey"))
      buyers.intersect(eventUsers)
    }),
    // ---- grouping sets (rollup)
    "q_agg_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
         min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS cnt
         FROM lineitem GROUP BY 1, 2""",
    "q_agg_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS distinct_orders,
         count(DISTINCT l_suppkey) AS distinct_supps,
         count(*) AS cnt
         FROM lineitem GROUP BY 1""",
    "q_join_revenue" ->
      """SELECT c_mktsegment,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",
    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45)""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 300000.0)""",
    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt,
           lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_order
         FROM orders""",
    "q_window_range" ->
      """SELECT o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum30d
         FROM orders""",
    // the five shift/mask spread steps, both dimensions in lockstep;
    // masks are 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
    "q_zorder_key" ->
      """WITH s0 AS (
           SELECT o_orderkey,
             CAST(o_custkey AS BIGINT) & 65535 AS a,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) & 65535 AS b
           FROM orders),
         s1 AS (SELECT o_orderkey, (a | (a << 8)) & 16711935 AS a,
                       (b | (b << 8)) & 16711935 AS b FROM s0),
         s2 AS (SELECT o_orderkey, (a | (a << 4)) & 252645135 AS a,
                       (b | (b << 4)) & 252645135 AS b FROM s1),
         s3 AS (SELECT o_orderkey, (a | (a << 2)) & 858993459 AS a,
                       (b | (b << 2)) & 858993459 AS b FROM s2),
         s4 AS (SELECT o_orderkey, (a | (a << 1)) & 1431655765 AS a,
                       (b | (b << 1)) & 1431655765 AS b FROM s3)
         SELECT o_orderkey, a | (b << 1) AS zkey FROM s4""",
    "q_scalar_array" ->
      """SELECT doc_id,
           string_split(text, ' ')[1] AS w1,
           string_split(text, ' ')[5] AS w5,
           list_contains(string_split(lower(text), ' '), 'spark') AS has_spark,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct
         FROM documents""",
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_set_union" ->
      """SELECT custkey, count(*) AS n FROM (
           SELECT o_custkey AS custkey FROM orders
           UNION ALL
           SELECT c_custkey AS custkey FROM customer) t
         GROUP BY 1""",
    "q_set_except" ->
      """SELECT c_custkey AS custkey FROM customer
         EXCEPT
         SELECT o_custkey AS custkey FROM orders
         WHERE o_totalprice > 250000.0""",
    "q_scalar_string" ->
      """SELECT c_custkey,
           upper(c_name) AS uname,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substr(c_name, 1, 5) AS prefix,
           concat_ws('_', c_mktsegment, c_name) AS tagged
         FROM customer""",
    "q_scalar_datemath" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           abs(o_totalprice - 100000.0) AS dist
         FROM orders""",
    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
         FROM orders GROUP BY 1
         HAVING count(*) >= 12""",
    "q_subquery_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')""",
    // deterministic ntile: total order via the orderkey tiebreak
    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER (PARTITION BY o_orderstatus
             ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
         FROM orders""",
    // identical recursive SQL modulo the view name — both engines walk
    // the same next-pointer chain; output carries no timestamps so the
    // NTZ seam never reaches the compare
    "q_recursive_chain" ->
      """WITH RECURSIVE seq AS (
           SELECT o_custkey AS cust, o_orderdate AS d,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders),
         chain(cust, rn, d, depth) AS (
           SELECT cust, rn, d, CAST(1 AS BIGINT) AS depth
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT c.cust, s.rn, s.d, c.depth + 1
           FROM chain c JOIN seq s ON c.cust = s.cust AND s.rn = c.rn + 1
           WHERE s.d <= c.d + INTERVAL 30 DAY)
         SELECT cust AS o_custkey, CAST(max(depth) AS BIGINT) AS streak_len
         FROM chain GROUP BY cust""",
    "q_agg_pivot" ->
      """SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
         FROM events GROUP BY 1""",
    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
         INTERSECT
         SELECT user_id AS custkey FROM events""",
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
  )
}
