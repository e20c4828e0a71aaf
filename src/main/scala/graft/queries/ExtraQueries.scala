package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity

/** Second-ring relational coverage: correlated scalar subqueries
  * (Catalyst decorrelation), pivot, lateral explode, window offset
  * functions, exact median, regexp extraction, array functions. */
object ExtraQueries {

  /** Correlated scalar subquery text — identical ANSI SQL runs on both
    * engines (the avg is an exact-decimal sum ÷ count so the comparison
    * threshold is bitwise identical). */
  private val ScalarSubquerySql =
    """SELECT p_partkey, p_brand, p_retailprice FROM part p
      |WHERE p_retailprice > (
      |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
      |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q36_scalar_subquery",
      """Correlated scalar subquery: parts priced above their brand's
        |average. Catalyst decorrelates to an aggregate + join — no
        |per-row subquery execution at any scale.""".stripMargin,
      (s, d) => { Tables.registerAll(s, d); s.sql(ScalarSubquerySql) },
      Some(ScalarSubquerySql)),

    QuerySpec(
      "q37_pivot",
      """Pivot: per-user event counts spread across event-type columns
        |(explicit value list → single-pass conditional aggregation, no
        |value-discovery job).""".stripMargin,
      (s, d) => Tables.events(s, d)
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .count()
        .na.fill(0L, EventTypes),
      Some("""SELECT user_id,
             | count(*) FILTER (WHERE event_type = 'click') AS click,
             | count(*) FILTER (WHERE event_type = 'error') AS error,
             | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             | count(*) FILTER (WHERE event_type = 'signup') AS signup,
             | count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events WHERE user_id < 50 GROUP BY user_id""".stripMargin)),

    QuerySpec(
      "q38_explode_tokens",
      """Lateral explode (UDTF shape): token frequency top-20 with a
        |deterministic tiebreak. Generator → partial agg → top-k; the
        |shuffle carries only (token, partial count).""".stripMargin,
      (s, d) => Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
             |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents)
             |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin)),

    QuerySpec(
      "q39_window_offsets",
      """Window offset functions: lag/lead prices and first order date per
        |customer (default cumulative frame, identical in both
        |engines).""".stripMargin,
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderdate")).over(w).as("first_date"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             | lag(o_totalprice, 1) OVER w AS prev_price,
             | lead(o_totalprice, 1) OVER w AS next_price,
             | first_value(o_orderdate) OVER w AS first_date
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin)),

    QuerySpec(
      "q40_median",
      """Exact interpolated median (percentile 0.5) per group — integral
        |inputs make the interpolation arithmetic engine-exact.""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | quantile_cont(l_quantity, 0.5) AS median_qty,
             | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q41_regexp_extract",
      """Regexp extraction: last whitespace-free word of p_type (pattern
        |kept in the Java∩RE2 common subset).""".stripMargin,
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"), col("p_type"),
        regexp_extract(col("p_type"), "(\\S+)$", 1).as("type_last")),
      Some("""SELECT p_partkey, p_type,
             | regexp_extract(p_type, '(\S+)$', 1) AS type_last
             |FROM part""".stripMargin)),

    QuerySpec(
      "q43_full_outer_join",
      """FULL OUTER join: per-nation customer vs supplier counts, keeping
        |nations present on either side only.""".stripMargin,
      (s, d) => {
        val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(p, Seq("nationkey"), "full_outer")
          .select(
            coalesce(col("nationkey"), lit(-1)).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      },
      Some("""SELECT COALESCE(nationkey, -1) AS nationkey,
             | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |      FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |      FROM supplier GROUP BY 1) s USING (nationkey)""".stripMargin)),

    QuerySpec(
      "q44_intersect",
      """INTERSECT (distinct): nations that have both customers with
        |positive balances and suppliers.""".stripMargin,
      (s, d) => Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin)),

    QuerySpec(
      "q42_array_funcs",
      """Array functions over embeddings: size, element access, L2 norm
        |via the native dot expression (sqrt ∘ graft_dot — bitwise equal
        |to sqrt ∘ list_dot_product on DOUBLE[]).""".stripMargin,
      (s, d) => {
        graft.GraftSession.ensureConfs(s)
        Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_dim"),
          sqrt(Similarity.dot(col("embedding").cast("array<double>"),
            col("embedding").cast("array<double>"))).as("l2_norm"))
      },
      Some("""SELECT vec_id,
             | CAST(len(embedding) AS BIGINT) AS dim,
             | CAST(embedding[1] AS DOUBLE) AS first_dim,
             | sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
             |FROM embeddings""".stripMargin))
  )
}
