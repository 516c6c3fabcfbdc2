"""Relational operator surface (SURVEY §2.1–2.7) as oracle-checked queries.

Each query re-expresses one (or a composition) of the reference's
operators over the driver fixtures: scans with pushdown, projections,
filters, equi/semi/anti joins, hash aggregates, rollup/cube/pivot,
windows, sorts/top-k, set ops, scalar functions, as-of resolution,
and the integrity-check shapes (counts + order-insensitive
fingerprints) from ``6_verify_data_integrity.py:74-81``.

All aggregates over monetary doubles run through exact DECIMAL
(functions.portable) so values are bit-identical to the DuckDB
oracle regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.functions.portable import davg, dsum
from apache_iceberg_tables_migration_tool_spark.queries.registry import query
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import TABLES, load

# --------------------------------------------------------------------------
# Flagship: TPC-H-Q3-shaped top-k revenue (scan→filter→join→agg→sort→limit).
# Mirrors the reference's "read at snapshot, aggregate, report" shape at
# query granularity; broadcast of the dimension side is explicit.
# --------------------------------------------------------------------------

_CUTOFF = "1998-06-01"


@query(
    "flagship_topk_revenue",
    headline=True,
    tags=("join", "agg", "topk"),
    oracle=f"""
SELECT o_orderkey,
       CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) * 100) AS BIGINT) / 100.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_CUTOFF}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def flagship_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(_CUTOFF).cast("timestamp"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is SF-proportional, so no explicit broadcast hint: an
        # explicit hint is honored regardless of size (AQE never demotes
        # it) and would OOM at 100×. Below the autoBroadcastJoinThreshold
        # Spark still picks BroadcastHashJoin from stats; above it, AQE's
        # runtime stats decide — the plan that survives scale-up.
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "pricing_summary",
    headline=True,
    tags=("agg",),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
       CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) * 100) AS BIGINT) / 100.0 AS sum_disc_price,
       CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) * 100) AS BIGINT) / 100.0 AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity)      AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_discount)      AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1 shape: one wide hash aggregate, map-side partials do
    nearly all the work — the canonical 100 TB-safe aggregation."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_base_price"),
        dsum(disc_price, 6).alias("sum_disc_price"),
        dsum(charge, 8).alias("sum_charge"),
        davg("l_quantity", 2).alias("avg_qty"),
        davg("l_extendedprice", 2).alias("avg_price"),
        davg("l_discount", 2).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "filter_sum_revenue",
    tags=("filter", "agg", "pushdown"),
    oracle="""
SELECT CAST(FLOOR(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) * 100) AS BIGINT) / 100.0 AS promo_revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def filter_sum_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: all predicates push to the parquet scan
    (verify with .explain → PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "local_supply_revenue",
    headline=True,
    tags=("join", "agg"),
    oracle="""
SELECT n_name,
       CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) * 100) AS BIGINT) / 100.0 AS revenue,
       COUNT(*) AS n_lineitems
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
""",
)
def local_supply_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-table join. nation⨝region (fixed 25/5 rows)
    carries an explicit broadcast hint; customer/supplier joins are left
    to the threshold + AQE so they broadcast while small but degrade to
    shuffle joins instead of OOMing at 100× — the plan that survives
    scale-up."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    # Hints only on fixed-cardinality dims (nation=25, region=5 rows).
    # customer/supplier are SF-proportional: no explicit hint — the
    # threshold/AQE picks broadcast while they fit and falls back to a
    # shuffle join when they don't (an explicit hint would be honored
    # unconditionally and die on the 8 GB broadcast limit at 100×).
    # Dims join stepwise onto the fact (not as a pre-joined composite:
    # a join's static size estimate is the product of its children, so
    # a composite would look too big to broadcast and plan an SMJ even
    # at small SF); the ASIA-filtered region inner join prunes
    # nations → customer rows exactly like a pre-filtered dim chain.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(supp,
              (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey))
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# --------------------------------------------------------------------------
# Counts + integrity fingerprints (reference stage 6; SURVEY §2 A1/A2/A5)
# --------------------------------------------------------------------------

@query(
    "table_counts",
    tags=("count", "metadata"),
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLES
    ),
)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table record counts (A1). With parquet aggregate pushdown
    these are footer-only scans — the reference instead ran a full
    ``df.count()`` before every copy (5_migrate_tables_data.py:76)."""
    parts = [
        load(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"), "n_rows"
        )
        for t in TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


_FP_KEY_LI = (
    "(l_orderkey % 1000003) * 97 + (l_partkey % 1000003) * 31 "
    "+ (l_suppkey % 1000003) * 7 + l_linenumber "
    "+ CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) % 1000003"
)
_FP_KEY_ORD = (
    "(o_orderkey % 1000003) * 97 + (o_custkey % 1000003) * 31 "
    "+ CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) % 1000003"
)


@query(
    "integrity_fingerprint",
    headline=True,
    tags=("integrity", "agg"),
    oracle=f"""
SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM({_FP_KEY_LI}) AS BIGINT) AS fp_sum,
       CAST(BIT_XOR({_FP_KEY_LI}) AS BIGINT) AS fp_xor
FROM lineitem
UNION ALL
SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM({_FP_KEY_ORD}) AS BIGINT) AS fp_sum,
       CAST(BIT_XOR({_FP_KEY_ORD}) AS BIGINT) AS fp_xor
FROM orders
""",
)
def integrity_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint — the portable twin of the
    reference's ``sum(hash(*))`` checksum (6_verify_data_integrity.py:79-81,
    gap G5): bounded arithmetic key per row, SUM + BIT_XOR combine.
    The engine-internal (non-portable) version uses xxhash64 over all
    columns — see operators.integrity.table_checksum."""
    li = load(spark, sf_dir, "lineitem").selectExpr(f"{_FP_KEY_LI} AS k")
    od = load(spark, sf_dir, "orders").selectExpr(f"{_FP_KEY_ORD} AS k")

    def fp(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("fp_sum"),
            F.bit_xor("k").alias("fp_xor"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "fp_sum", "fp_xor")

    return fp(li, "lineitem").unionAll(fp(od, "orders"))


@query(
    "distinct_counts",
    tags=("agg", "distinct"),
    oracle="""
SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey)  AS n_parts,
       COUNT(DISTINCT l_suppkey)  AS n_supps
FROM lineitem
""",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# Joins: anti / semi (reference J1 schema-diff shape, P4 existence)
# --------------------------------------------------------------------------

@query(
    "antijoin_orders_without_items",
    tags=("join", "anti"),
    oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def antijoin_orders_without_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the distributed form of the reference's
    schema set-difference (4_verify_table_creation.py:86-97, J1)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "semijoin_customers_with_open_orders",
    tags=("join", "semi"),
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def semijoin_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — existence predicate (P4) without materializing
    the probe side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# As-of resolution + as-of join (reference A3/J4: latest snapshot ≤ T)
# --------------------------------------------------------------------------

_ASOF_T = "2024-01-15 00:00:00"


@query(
    "asof_snapshot_resolution",
    tags=("asof", "window"),
    oracle=f"""
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_ASOF_T}'
) WHERE rn = 1
""",
)
def asof_snapshot_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest state ≤ T per key' — exactly the reference's snapshot
    resolution (2_collect_database_schema_info.py:34-55) rebuilt as a
    distributed window top-1 instead of a driver-side ``max()``."""
    ev = load(spark, sf_dir, "events").where(F.col("ts") <= F.lit(_ASOF_T).cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@query(
    "asof_join_click_purchase",
    headline=True,
    tags=("asof", "join"),
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""",
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General as-of join (J4): for each click, the user's most recent
    purchase at-or-before it. Implemented with the union+window
    sort-merge pattern (operators.asof.asof_join) — one shuffle on the
    key, no range-explosion; survives 100 TB event logs."""
    from apache_iceberg_tables_migration_tool_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("purchase_id")
    )
    out = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", how="inner")
    return out.select("click_id", "purchase_id")


# --------------------------------------------------------------------------
# Grouped report rollups (reference W5/A4 report aggregation, relationally)
# --------------------------------------------------------------------------

@query(
    "rollup_order_stats",
    tags=("agg", "rollup"),
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference renders per-database subtotal + grand-total
    reports in driver Python loops (5_migrate_tables_data.py:124-163);
    ROLLUP computes the same lattice in one distributed pass (A4)."""
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("total_price"),
    )


@query(
    "cube_lineitem_flags",
    tags=("agg", "cube"),
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity", 2).alias("sum_qty"),
    )


@query(
    "pivot_status_priority",
    tags=("agg", "pivot"),
    oracle="""
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# --------------------------------------------------------------------------
# Windows / sorts / top-k
# --------------------------------------------------------------------------

@query(
    "window_topk_orders_per_customer",
    tags=("window", "topk"),
    oracle="""
SELECT o_custkey, o_orderkey, rk
FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 2
""",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "rk")
    )


@query(
    "running_total_per_customer",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
FROM orders
""",
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double").alias("cum_spend"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "intersect_active_users",
    tags=("setop",),
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def intersect_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(purchases)


@query(
    "except_en_not_es_texts",
    tags=("setop",),
    oracle="""
SELECT text FROM documents WHERE lang = 'en'
EXCEPT
SELECT text FROM documents WHERE lang = 'es'
""",
)
def except_en_not_es_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en").select("text")
    es = docs.where(F.col("lang") == "es").select("text")
    return en.subtract(es)  # EXCEPT (distinct) semantics


# --------------------------------------------------------------------------
# Scalar function surface (reference F2–F5: formatting, splitting,
# concatenation, regex, conditional banding)
# --------------------------------------------------------------------------

@query(
    "scalar_functions_showcase",
    tags=("scalar",),
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS order_ym,
       string_split(o_orderpriority, '-')[1] AS prio_num,
       concat_ws('|', o_orderstatus, o_orderpriority) AS label,
       regexp_extract(o_orderpriority, '[A-Z]+') AS prio_word,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 150000 THEN 'mid'
            ELSE 'low' END AS price_band,
       upper(substr(o_orderstatus, 1, 1)) AS status_u
FROM orders
""",
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function parity set: date formatting (F2), identifier
    assembly (F3/F5 shapes), string split/regex parse (F4) — all
    JVM-side expressions inside whole-stage codegen."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio_num"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("label"),
        F.regexp_extract(F.col("o_orderpriority"), "[A-Z]+", 0).alias("prio_word"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.upper(F.substring("o_orderstatus", 1, 1)).alias("status_u"),
    )


@query(
    "json_extract_events",
    tags=("scalar", "json", "agg"),
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON path extraction stays JVM-side
    (get_json_object), aggregated per event type."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )
