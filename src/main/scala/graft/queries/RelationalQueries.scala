package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The batch relational operator surface (SURVEY §2.2): projection, cast,
  * filter, joins of every flavor, hash aggregation, rollup/cube/grouping
  * sets, window functions, sort/limit/top-k, set ops, scalar
  * string/date/math/json functions, distinct aggregation, and the
  * last-writer-wins upsert kernel expressed batch-side.
  *
  * Every query reads the driver parquet testdata and is paired with a
  * DuckDB oracle (see [[QuerySpec]] for the determinism contract).
  *
  * Scale notes are per-query; the common ones:
  *  - filters/projections sit directly on the parquet scan → pushdown +
  *    column pruning (verified via `.explain("formatted")`);
  *  - dimension joins broadcast the small side explicitly;
  *  - aggregations are partial (map-side combine) by construction;
  *  - window queries shuffle once on the partition key — the same shuffle
  *    a 1000-executor cluster would need, no extra exchanges.
  */
object RelationalQueries {
  import QuerySpec.{MoneyAddend, MoneyResult}

  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(MoneyAddend)).cast(MoneyResult)

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    QuerySpec(
      "q01_agg_pricing_summary",
      """TPC-H-Q1-style hash aggregation over lineitem: filter → partial
        |agg → final agg. Flagship query. At 100 TB: one shuffle on the
        |(tiny) group key space; map-side combine reduces 100 TB to KBs
        |before the exchange.""".stripMargin,
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            moneySum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base_price"),
            moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            (sum(col("l_quantity").cast(MoneyAddend)).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
             | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             | CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_qty,
             | count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q02_project_cast",
      """Projection + cast + alias (reference ops P1/P2, SURVEY §2.1):
        |narrow select with int→string and double→bigint casts. The scan
        |must read only 4 of lineitem's 11 columns (column pruning).""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_orderkey").cast("string").as("okey_str"),
          floor(col("l_quantity")).cast("long").as("qty_long"),
          lower(col("l_returnflag")).as("flag_lower")),
      Some("""SELECT l_orderkey, l_linenumber,
             | CAST(l_orderkey AS VARCHAR) AS okey_str,
             | CAST(floor(l_quantity) AS BIGINT) AS qty_long,
             | lower(l_returnflag) AS flag_lower
             |FROM lineitem WHERE l_orderkey < 1000""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q03_filter_pushdown",
      """Predicate + projection pushdown: both filters land in the parquet
        |scan's PushedFilters; ReadSchema is 5 columns. At 100 TB with
        |date-partitioned layout this becomes partition pruning.""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
          lit(java.sql.Timestamp.valueOf("1996-12-31 00:00:00"))) &&
          col("l_quantity") >= 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
             |  AND l_quantity >= 30""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q04_join_revenue_by_nation",
      """3-way join fact⋈dim: lineitem⋈orders⋈customer⋈nation with the two
        |dims broadcast. Only one real shuffle survives (lineitem⋈orders on
        |orderkey); customer and nation ride along as broadcast hash joins —
        |exactly the plan wanted at 1000 executors.""".stripMargin,
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        val n  = Tables.nation(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             | count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q05_semi_join",
      """LEFT SEMI join (EXISTS): orders having at least one high-quantity
        |lineitem. Semi joins stream the probe side and never duplicate
        |rows — cheaper than join+distinct at scale.""".stripMargin,
      (s, d) => {
        val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 48).select("l_orderkey")
        Tables.orders(s, d)
          .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q06_anti_join",
      """LEFT ANTI join (NOT EXISTS): customers who never placed a
        |high-value (>300k) order.""".stripMargin,
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q07_outer_join_agg",
      """LEFT OUTER join + aggregation: per-customer order count and spend,
        |keeping order-less customers (count 0, spend 0). One shuffle on
        |custkey; at scale the orders side pre-aggregates before the join
        |via partial aggregation.""".stripMargin,
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(MoneyAddend)), lit(0)).cast(MoneyResult).as("spend")),
      Some("""SELECT c_custkey, c_name,
             | count(o_orderkey) AS n_orders,
             | CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS spend
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q08_window_topk_per_group",
      """row_number() window: top-3 orders per customer by totalprice with a
        |unique-key tiebreak. Single shuffle on o_custkey. At 100 TB prefer
        |this over global sorts: per-group state is O(k).""".stripMargin,
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q09_window_running_sum",
      """Running-total window: cumulative spend per customer in order-date
        |order. Exact decimal accumulation so the running values are
        |engine-independent.""".stripMargin,
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(col("o_totalprice").cast(MoneyAddend)).over(w).cast(MoneyResult).as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             |   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q10_topk_orders",
      """Global top-k: ORDER BY ... LIMIT with unique tiebreak. Spark plans
        |TakeOrderedAndProject — O(k) per partition + O(k·parts) at the
        |driver; no global sort materialization at any scale.""".stripMargin,
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q11_distinct",
      """DISTINCT projection — hash aggregate without aggregates.""",
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q12_set_ops",
      """Set operations UNION (distinct) then EXCEPT: big spenders plus
        |BUILDING-segment customers, minus customers holding an open ('O')
        |order.""".stripMargin,
      (s, d) => {
        val big  = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("custkey"))
        val bld  = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        big.union(bld).distinct().except(open)
      },
      Some("""SELECT custkey FROM (
             |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
             |  UNION
             |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q13_rollup",
      """GROUP BY ROLLUP(l_returnflag, l_linestatus): subtotal + grand-total
        |rows with NULL group markers.""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             | count(*) AS n_rows
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q14_cube",
      """GROUP BY CUBE(o_orderstatus, o_orderpriority): all 4 grouping
        |combinations.""".stripMargin,
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("spend")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q15_grouping_sets",
      """Explicit GROUPING SETS ((flag),(status),()) via SQL over the
        |registered views — the Athena-parity SQL entry path (SURVEY §1.5).""".stripMargin,
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                |  count(*) AS n_rows
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             | count(*) AS n_rows
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q16_string_funcs",
      """Scalar string functions: upper/substr/length/replace/concat/LIKE.
        |All codegen'd Catalyst expressions — no UDFs (SURVEY §7.5).""".stripMargin,
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_clean"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        when(col("p_type").like("%BRASS%"), 1L).otherwise(0L).as("has_brass")),
      Some("""SELECT p_partkey,
             | upper(p_name) AS name_upper,
             | substr(p_name, 1, 12) AS name_pfx,
             | CAST(length(p_name) AS BIGINT) AS name_len,
             | replace(p_brand, '#', '_') AS brand_clean,
             | concat(p_brand, ':', p_type) AS brand_type,
             | CAST(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS BIGINT) AS has_brass
             |FROM part""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q17_date_funcs",
      """Scalar date functions: year/month/day/quarter, date_trunc,
        |datediff. DuckDB's extractors return BIGINT and its date_trunc
        |returns DATE — both sides cast to BIGINT/TIMESTAMP.""".stripMargin,
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit(java.sql.Timestamp.valueOf("2002-01-01 00:00:00")), col("o_orderdate"))
          .cast("long").as("days_to_ref")),
      Some("""SELECT o_orderkey,
             | CAST(year(o_orderdate) AS BIGINT) AS o_year,
             | CAST(month(o_orderdate) AS BIGINT) AS o_month,
             | CAST(day(o_orderdate) AS BIGINT) AS o_day,
             | CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
             | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             | CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_ref
             |FROM orders""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q18_math_case",
      """Scalar math + CASE WHEN: per-row double arithmetic (deterministic —
        |no cross-row accumulation), abs, sqrt, conditional buckets.
        |tax_amt stays a PLAIN double product: one IEEE op, bitwise
        |identical in both engines — a decimal(18,6) cast here could
        |actually round (the product's binary value is not a 6-decimal
        |number) and Java rounds the shortest-string repr while DuckDB
        |rounds the exact binary value, so a near-midpoint product could
        |diverge by 1 ulp.""".stripMargin,
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * col("l_tax")).as("tax_amt"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        when(col("l_discount") > 0.05, "HI").otherwise("LO").as("disc_bucket")),
      Some("""SELECT l_orderkey, l_linenumber,
             | l_extendedprice * l_tax AS tax_amt,
             | abs(l_discount - 0.05) AS disc_dev,
             | sqrt(l_quantity) AS qty_sqrt,
             | CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_bucket
             |FROM lineitem""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q19_json_extract",
      """JSON scalar extraction (reference op P3 batch-side, SURVEY §2.1):
        |events.props carries a JSON object; pull `$.k` as BIGINT. Catalyst
        |GetJsonObject — codegen'd, no UDF.""".stripMargin,
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")),
      Some("""SELECT event_id, event_type,
             | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q20_upsert_lww",
      """The reference's one nontrivial operator (K2, SURVEY §2.1): keyed
        |last-writer-wins precombine — Hudi upsert semantics — expressed
        |batch-side over events: per user_id keep the latest (ts, event_id)
        |row. Same kernel the streaming UpsertWriter uses. One shuffle on
        |the key; at 100 TB this is the canonical dedup-merge shape.""".stripMargin,
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "ts", "event_type", "value")
      },
      Some("""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |  FROM events) t WHERE rn = 1""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q21_scan_limit",
      """Plain scan + deterministic LIMIT (reference op Q1: Athena
        |`select * ... limit 100`), totally ordered by the unique key pair
        |so the 100 rows are engine-independent.""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100),
      Some("""SELECT * FROM lineitem
             |ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    QuerySpec(
      "q22_count_distinct",
      """Distinct aggregation: per-status distinct customers + exact counts
        |and raw double min/max (exact parquet values, no arithmetic).""".stripMargin,
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             | count(DISTINCT o_custkey) AS n_cust,
             | count(*) AS n_orders,
             | min(o_totalprice) AS min_price,
             | max(o_totalprice) AS max_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
