"""Second relational batch: SQL-API entry path, subqueries, HAVING,
unpivot, ordered-set/argmax aggregates, lag/lead, ntile, grouping
sets, and two more TPC-H-shaped join/agg benchmarks.

Same parity discipline as relational.py: exact decimal money sums
(FLOOR-cents), integer-derived doubles, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.functions.portable import dsum
from apache_iceberg_tables_migration_tool_spark.queries.registry import query
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

_REV_ORACLE = "CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) * 100) AS BIGINT) / 100.0"


def _rev_col() -> F.Column:
    return dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6)


@query(
    "sql_api_top_spenders",
    tags=("sql", "subquery", "having"),
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, n.n_name
HAVING SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) >
       (SELECT 2 * SUM(CAST(o_totalprice AS DECIMAL(28,2))) / COUNT(DISTINCT o_custkey)
        FROM orders)
""",
)
def sql_api_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry path (the reference drives everything
    through SQL strings too): HAVING over a scalar subquery —
    customers spending > 2× the mean per-customer spend. Decimal
    comparison on both sides keeps the boundary exact."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend
        FROM v_customer c
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        JOIN v_orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name, n.n_name
        HAVING SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) >
               (SELECT 2 * SUM(CAST(o_totalprice AS DECIMAL(28,2))) / COUNT(DISTINCT o_custkey)
                FROM v_orders)
        """
    )


@query(
    "correlated_exists_late_orders",
    tags=("subquery", "semi"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def correlated_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS decorrelated by Catalyst into
    a semi-join — count of orders with any lineitem shipped after the
    order date, per priority."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM v_orders o
        WHERE EXISTS (SELECT 1 FROM v_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "having_popular_parts",
    tags=("agg", "having"),
    oracle="""
SELECT l_partkey, COUNT(*) AS n_lines
FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 40
""",
)
def having_popular_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .where(F.col("n_lines") > 40)
    )


@query(
    "unpivot_lineitem_metrics",
    tags=("unpivot",),
    oracle="""
SELECT 'sum_qty' AS metric, CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT 'sum_price' AS metric, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT 'n_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM lineitem
""",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack() (the SQL-standard UNPIVOT
    shape)."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.selectExpr(
        "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, 'n_rows', n_rows) "
        "AS (metric, value)"
    )


@query(
    "argmax_customer_per_nation",
    tags=("agg", "argmax"),
    oracle="""
SELECT c_nationkey, c_custkey AS top_custkey, c_name AS top_name
FROM (
  SELECT c_nationkey, c_custkey, c_name,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
  FROM customer
) WHERE rn = 1
""",
)
def argmax_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a struct tie-break — the distributed argmax the
    reference computed driver-side (A3/O2,
    2_collect_database_schema_info.py:51-52)."""
    cust = load(spark, sf_dir, "customer")
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", key).alias("top_custkey"),
        F.max_by("c_name", key).alias("top_name"),
    )


@query(
    "lag_order_gap_days",
    tags=("window", "lag"),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over per-customer order history: days between
    consecutive orders (NULL for the first)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
    )


@query(
    "ntile_price_quartiles",
    tags=("window", "ntile"),
    oracle="""
SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
""",
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("quartile"),
    )


@query(
    "grouping_sets_flags",
    tags=("agg", "groupingsets", "sql"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() marker columns via the SQL
    API (disambiguates real NULLs from subtotal rows — the report
    shape the reference builds by hand)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n_items
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "median_value_by_type",
    tags=("agg", "quantile", "window"),
    oracle="""
SELECT event_type, value AS median_value
FROM (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
) WHERE rn = (n + 1) // 2
""",
)
def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median per group via window rank selection —
    chosen over percentile()/quantile_cont because interpolation
    float-op order differs across engines; element *selection* is
    bit-exact by construction."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("median_value"))
    )


@query(
    "returned_revenue_by_customer",
    headline=True,
    tags=("join", "agg", "topk"),
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {_REV_ORACLE} AS lost_revenue
FROM customer
JOIN nation   ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: revenue lost to returns, top-20 customers.
    Fact-side filter first; revenue is aggregated down to O(customers)
    rows on the bare custkey BEFORE the dimension joins (c_custkey is
    unique, so grouping by it alone is equivalent to grouping with the
    name columns carried through), then customer/nation join onto the
    aggregate — at scale the dims join thousands of aggregated rows
    instead of riding every lineitem through the agg shuffle. Only the
    fixed-25-row nation carries an explicit broadcast hint; customer is
    SF-proportional, so the threshold/AQE decides its join strategy."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(_rev_col().alias("lost_revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "lost_revenue")
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "promo_revenue_share",
    tags=("join", "agg", "conditional"),
    oracle="""
SELECT CAST(FLOOR(SUM(CAST(CASE WHEN p_type = 'SMALL'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) * 100) AS BIGINT)
       AS small_cents,
       CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) * 100) AS BIGINT)
       AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional aggregation over a fact⨝dim join.
    part is SF-proportional, so no explicit broadcast hint — stats/AQE
    pick broadcast while it fits and shuffle when it doesn't. Emits
    exact cent numerators so the share is derivable without a float
    division in the compared output."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    small = F.when(F.col("p_type") == "SMALL", rev).otherwise(F.lit(0))
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        F.floor(F.sum(small.cast("decimal(28,6)")) * 100).cast("long").alias("small_cents"),
        F.floor(F.sum(rev.cast("decimal(28,6)")) * 100).cast("long").alias("total_cents"),
    )


@query(
    "year_over_year_orders",
    tags=("agg", "time"),
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price,
       COUNT(CASE WHEN o_totalprice >= 300000 THEN 1 END) AS n_large
FROM orders GROUP BY 1
""",
)
def year_over_year_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("total_price"),
        F.count(F.when(F.col("o_totalprice") >= 300000, 1)).alias("n_large"),
    )


@query(
    "min_price_item_per_order",
    tags=("sql", "subquery", "decorrelation"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem l
WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_orderkey = l.l_orderkey)
  AND l_orderkey % 10 = 0
""",
)
def min_price_item_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17's shape): cheapest line
    item(s) within each order. Catalyst decorrelates the subquery
    into a per-orderkey MIN aggregate + equi-join — one shuffle on
    the correlation key, no per-row re-execution. MIN compare is
    exact (no float arithmetic), so the boundary is deterministic."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM v_li l
        WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM v_li l2
                                 WHERE l2.l_orderkey = l.l_orderkey)
          AND l_orderkey % 10 = 0
        """
    )


@query(
    "churned_buyers_1998",
    tags=("sql", "subquery", "antijoin"),
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01')
""",
)
def churned_buyers_1998(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS in one predicate (churn cohort): planned
    as a semi-join chained with an anti-join on the same key — two
    pushdown-friendly hash joins, no distinct, no count subquery."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_cust")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_ord")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_cust c
        WHERE EXISTS (SELECT 1 FROM v_ord o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
                      AND o.o_orderdate <  TIMESTAMP '1998-01-01')
          AND NOT EXISTS (SELECT 1 FROM v_ord o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        """
    )


@query(
    "nation_customer_share",
    tags=("sql", "subquery", "scalar"),
    oracle="""
SELECT n_name, COUNT(*) AS n_customers,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM customer) AS share
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def nation_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery feeding a projection: per-nation
    customer share of the global total. The total is one extra
    scalar job reused across rows (broadcast as a literal), and
    int÷int division is a single IEEE op — bit-deterministic."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_cust2")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nat2")
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM v_cust2) AS share
        FROM v_cust2 JOIN v_nat2 ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "window_rank_metrics",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best,
       FIRST_VALUE(o_orderkey) OVER w AS best,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth on one shuffle: percent_rank,
    cume_dist, nth_value, first/last_value share a single
    (o_custkey)-partitioned sort — Spark plans ONE Window operator for
    the ordered frames plus one for the full-frame values, no extra
    exchanges. Ties broken by orderkey so ranks are deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_best"),
        F.first("o_orderkey").over(w).alias("best"),
        F.last("o_orderkey").over(wf).alias("worst"),
    )


@query(
    "vector_sql_arith",
    tags=("vector", "higher-order"),
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(len(list_filter(embedding, x -> x < 0))) AS BIGINT) AS neg_components,
       CAST(FLOOR(SUM(CAST(sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS DECIMAL(28,8))) * 100000000) AS BIGINT) / 100000000.0
         AS norm_sum
FROM embeddings GROUP BY label
""",
)
def vector_sql_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math WITHOUT Python: higher-order functions (transform/
    aggregate/filter) run element loops inside codegen, so per-row L2
    norms and component predicates cost no Arrow transfer at all — the
    fast path for cheap vector features; mapInPandas is reserved for
    the matmul-shaped work (`similarity.py`). Per-element math is
    float→double cast BEFORE multiply and summed sequentially in both
    engines; the cross-row sum goes through exact decimal (scale 8)."""
    emb = load(spark, sf_dir, "embeddings")
    sq = F.expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    norm = F.sqrt(sq)
    negs = F.size(F.expr("filter(embedding, x -> x < 0)"))
    per_row = emb.select("label", norm.alias("__norm"), negs.alias("__negs"))
    norm_sum = (
        F.floor(F.sum(F.col("__norm").cast("decimal(28,8)")) * 100_000_000).cast("long")
        / F.lit(100_000_000.0)
    )
    return per_row.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("__negs").cast("bigint")).alias("neg_components"),
        norm_sum.alias("norm_sum"),
    )
