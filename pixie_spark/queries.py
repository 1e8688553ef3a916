"""Query registry backing ``__spark_entry__.py``.

One entry per implemented operator/function-family from SURVEY.md §2 —
each with a Spark implementation (``fn(spark, sf_dir) -> DataFrame``) and,
where SQL-expressible, an equivalent ANSI-SQL oracle for DuckDB.

Conventions that make the driver's order-insensitive value-hash stable:
- every computed DOUBLE column is rounded via the engine-independent
  ``floor(x*10^n + 0.5)/10^n`` (``dround`` here, the same spelled-out form
  in the SQL oracles) — Spark's and DuckDB's ``round()`` disagree on
  half-way doubles;
- float folds (cosine, fingerprints) use identical left-fold order in
  both engines so the doubles are bit-identical before rounding;
- every computed column carries the SAME alias on both sides;
- queries that need a deterministic row SET (limit/top-n) sort with a
  unique-key tiebreak.

DuckDB dialect notes encoded in the oracles: natural log is ``ln`` (DuckDB
``log`` is base-10), ``strpos`` ≈ Spark ``instr``, ``string_split_regex``
≈ ``split``, ``epoch_us`` ≈ ``unix_micros``, ``json_extract_string`` ≈
``get_json_object``; events.ts is normalized by ``load_table`` to long ns
(TIME64NS convention) whatever the physical parquet type (nanos or
timestamp[us]/NTZ); DuckDB sees µs, so event times are always compared
at µs via exact integer division.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixie_spark.operators import dedup as dd
from pixie_spark.operators import similarity as sim
from pixie_spark.operators import text as tx
from pixie_spark.sources import load_table
from pixie_spark.materialize import materialize


def dround(col: Column | str, n: int) -> Column:
    """Engine-deterministic rounding: floor(x*10^n + 0.5)/10^n."""
    if isinstance(col, str):
        col = F.col(col)
    s = float(10**n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    # Rows-only queries normally must return ≥1 row (a 0-row result is
    # indistinguishable from a silently-broken query); set for queries
    # whose CONTRACT is zero rows (EmptySource).
    allow_empty: bool = False
    # DuckDB SQL verified LOCALLY (tools/check_oracle.py + CI) for
    # deterministic queries the driver's 50-row gate window has no room
    # for. NEVER exposed via __spark_entry__.oracle_sql(), so
    # gate_ordered()'s ≤50 invariant is untouched. May use the
    # spark_xxhash64* DuckDB UDFs check_oracle registers
    # (tools/spark_hash.py — bit-for-bit Spark xxhash64 replicas).
    local_oracle: Optional[str] = None


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    allow_empty: bool = False,
    local_oracle: Optional[str] = None,
):
    def deco(fn):
        QUERIES[name] = QuerySpec(
            fn=fn,
            oracle=oracle,
            doc=doc,
            allow_empty=allow_empty,
            local_oracle=local_oracle,
        )
        return fn

    return deco


# =============================================================================
# Physical operators (SURVEY §2.1)
# =============================================================================


@query(
    "memory_source_scan",
    """
    SELECT event_id, epoch_us(ts) AS ts_us, event_type,
           floor(value * 1e4 + 0.5) / 1e4 AS value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
    doc="MemorySource: time-range scan + column projection "
    "(ref: src/carnot/exec/memory_source_node.cc). Projection and the time "
    "predicate reach the parquet reader via Catalyst pushdown; at scale the "
    "table is partitioned by a time bucket so the range prunes partitions.",
)
def q_memory_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = 1_704_412_800 * 1_000_000_000  # 2024-01-05 UTC
    hi = 1_705_708_800 * 1_000_000_000  # 2024-01-20 UTC
    # range applied on the physical column inside load_table → PushedFilters
    ev = load_table(spark, sf_dir, "events", time_range_ns=(lo, hi))  # ts: long ns
    return ev.select(
        "event_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_type",
        dround("value", 4).alias("value"),
    )


@query(
    "map_project",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5) / 1e4 AS net_price,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e4 + 0.5) / 1e4 AS charged,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
    doc="Map: N scalar expressions → N columns (ref: src/carnot/exec/map_node.cc).",
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net, 4).alias("net_price"),
        dround(net * (1 + F.col("l_tax")), 4).alias("charged"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@query(
    "filter_compound",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           floor(l_quantity * 1e4 + 0.5) / 1e4 AS l_quantity
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R' AND l_discount BETWEEN 0.02 AND 0.08
    """,
    doc="Filter: boolean scalar expression (ref: src/carnot/exec/filter_node.cc).",
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30)
        & (F.col("l_returnflag") == "R")
        & F.col("l_discount").between(0.02, 0.08)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", dround("l_quantity", 4).alias("l_quantity"))


@query(
    "agg_groupby",
    """
    SELECT l_returnflag, l_linestatus,
           floor(sum(l_quantity) * 1e4 + 0.5) / 1e4 AS sum_qty,
           floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS sum_base_price,
           floor(sum(l_extendedprice * (1 - l_discount)) * 1e2 + 0.5) / 1e2 AS sum_disc_price,
           floor(avg(l_quantity) * 1e6 + 0.5) / 1e6 AS avg_qty,
           floor(min(l_extendedprice) * 1e4 + 0.5) / 1e4 AS min_price,
           floor(max(l_extendedprice) * 1e4 + 0.5) / 1e4 AS max_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Aggregate (hash agg, grouped) — the flagship TPC-H-Q1-shaped query "
    "(ref: src/carnot/exec/agg_node.cc). Catalyst emits partial+final "
    "HashAggregate — the Spark analogue of the reference's PEM/Kelvin "
    "partial/finalize split (plan.proto:244-266).",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        # timestamp_ntz literal: parquet timestamps are NTZ; an LTZ cast would
        # shift the boundary under a non-UTC driver session timezone
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 4).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            dround(F.avg("l_quantity"), 6).alias("avg_qty"),
            dround(F.min("l_extendedprice"), 4).alias("min_price"),
            dround(F.max("l_extendedprice"), 4).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_global",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS total_price,
           floor(avg(l_discount) * 1e6 + 0.5) / 1e6 AS avg_discount
    FROM lineitem
    """,
    doc="Aggregate, group-by-none path (ref: src/carnot/exec/agg_node.h:77).",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dround(F.sum("l_extendedprice"), 2).alias("total_price"),
        dround(F.avg("l_discount"), 6).alias("avg_discount"),
    )


@query(
    "limit_topn",
    """
    SELECT o_orderkey, o_custkey, floor(o_totalprice * 1e4 + 0.5) / 1e4 AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Limit with deterministic order (ref: src/carnot/exec/limit_node.cc; "
    "Spark short-circuits via TakeOrderedAndProject — the analogue of the "
    "reference's source-abort on satisfied limit, limit_node.cc:91-96).",
)
def q_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", dround("o_totalprice", 4).alias("o_totalprice"))
    )


@query(
    "union_append",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_quantity * 1e4 + 0.5) / 1e4 AS l_quantity, 'low' AS bucket
    FROM lineitem WHERE l_quantity < 3
    UNION ALL
    SELECT l_orderkey, l_linenumber,
           floor(l_quantity * 1e4 + 0.5) / 1e4 AS l_quantity, 'high' AS bucket
    FROM lineitem WHERE l_quantity > 48
    """,
    doc="Union (df.append) with per-input column alignment "
    "(ref: src/carnot/exec/union_node.cc; unionByName handles reordering).",
)
def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    low = li.where(F.col("l_quantity") < 3).select(
        "l_orderkey",
        "l_linenumber",
        dround("l_quantity", 4).alias("l_quantity"),
        F.lit("low").alias("bucket"),
    )
    high = li.where(F.col("l_quantity") > 48).select(
        "l_orderkey",
        "l_linenumber",
        dround("l_quantity", 4).alias("l_quantity"),
        F.lit("high").alias("bucket"),
    )
    return low.unionByName(high)


@query(
    "join_inner",
    """
    SELECT n.n_name, floor(sum(o.o_totalprice) * 1e2 + 0.5) / 1e2 AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Equijoin INNER (ref: src/carnot/exec/equijoin_node.cc). customer and "
    "nation are dimension-sized → broadcast joins; the fact side never "
    "shuffles for the join on a cluster.",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            dround(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           floor(coalesce(sum(o.o_totalprice), 0) * 1e2 + 0.5) / 1e2 AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Equijoin LEFT_OUTER (ref: plan.proto:314-325; RIGHT_OUTER is "
    "rewritten to LEFT by the reference compiler — Catalyst does the same).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(od, od.o_custkey == cu.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    """
    WITH c AS (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           coalesce(c.n_customers, 0) AS n_customers,
           coalesce(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey
    """,
    doc="Equijoin FULL_OUTER (ref: plan.proto:314-325).",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    c = cu.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    s = su.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi_anti",
    """
    SELECT c_custkey, c_name,
           CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'active' ELSE 'inactive' END AS status
    FROM customer c
    """,
    doc="Semi/anti join surface — absent from the reference algebra "
    "(SURVEY §2.3); Spark left_semi/left_anti.",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").select("o_custkey")
    active = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("active"))
    )
    inactive = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("inactive"))
    )
    return active.unionByName(inactive)


@query(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="Distinct — absent from the reference algebra (SURVEY §2.3), native "
    "in Spark.",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "rolling_time_bin",
    """
    SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
           event_type,
           count(*) AS n_events,
           floor(sum(value) * 1e4 + 0.5) / 1e4 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Rolling/tumbling window as time-bin groupBy (ref: "
    "src/carnot/planner/ir/rolling_ir.h:44-57; bin UDF "
    "src/carnot/funcs/builtins/math_ops.cc:209-216). 10-minute windows; "
    "streaming equivalent is groupBy(window('time_', ...)) — see "
    "pixie_spark.streaming.",
)
def q_rolling_time_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win_us = 600_000_000
    return (
        ev.withColumn("ts_us", F.expr("ts DIV 1000"))
        .withColumn("window_start_us", F.expr(f"(ts_us DIV {win_us}) * {win_us}"))
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "window_rank_topn_per_group",
    """
    SELECT c_custkey, o_orderkey, floor(o_totalprice * 1e4 + 0.5) / 1e4 AS o_totalprice, rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ) t
    WHERE rn <= 3
    """,
    doc="Ranking window function (absent from the reference — SURVEY §2.3; "
    "the PxL idiom is agg → client sort → head). Top-3 orders per customer.",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        cu.join(od, od.o_custkey == cu.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", dround("o_totalprice", 4).alias("o_totalprice"), "rn")
    )


# =============================================================================
# Scalar function families (SURVEY §2.4)
# =============================================================================


@query(
    "math_ops",
    """
    SELECT l_orderkey, l_linenumber,
           floor(ln(l_extendedprice) * 1e6 + 0.5) / 1e6 AS ln_price,
           floor(log(l_extendedprice) * 1e6 + 0.5) / 1e6 AS log10_price,
           floor(pow(l_discount, 2) * 1e6 + 0.5) / 1e6 AS disc_sq,
           floor(sqrt(l_quantity) * 1e6 + 0.5) / 1e6 AS sqrt_qty,
           abs(CAST(l_partkey AS BIGINT) - 100) AS abs_diff,
           ceil(l_quantity) AS ceil_qty,
           floor(l_quantity) AS floor_qty,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7,
           floor(l_extendedprice / 1000) * 1000 AS price_bin
    FROM lineitem
    """,
    doc="Math UDFs → native functions (ref: src/carnot/funcs/builtins/"
    "math_ops.cc:58-225). bin(x,w) = floor(x/w)*w (math_ops.cc:209-216).",
)
def q_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.log("l_extendedprice"), 6).alias("ln_price"),
        dround(F.log10("l_extendedprice"), 6).alias("log10_price"),
        dround(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        dround(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.abs(F.col("l_partkey").cast("long") - 100).alias("abs_diff"),
        # DuckDB ceil/floor return DOUBLE; Spark's return LongType. Cast to
        # double so the driver's value-hash (dtype-sensitive) agrees.
        F.ceil("l_quantity").cast("double").alias("ceil_qty"),
        F.floor("l_quantity").cast("double").alias("floor_qty"),
        (F.col("l_orderkey") % 7).cast("long").alias("mod7"),
        (F.floor(F.col("l_extendedprice") / 1000) * 1000)
        .cast("double")
        .alias("price_bin"),
    )


@query(
    "string_ops",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name_prefix,
           contains(p_name, 'widget') AS has_widget,
           strpos(p_name, 'bolt') AS bolt_pos,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short
    FROM part
    """,
    doc="String UDFs → native functions (ref: src/carnot/funcs/builtins/"
    "string_ops.cc:33-44): contains, length, find→instr, substring, "
    "tolower, toupper, trim.",
)
def q_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.contains("p_name", F.lit("widget")).alias("has_widget"),
        F.instr("p_name", "bolt").alias("bolt_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.replace("p_type", F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
    )


@query(
    "json_ops",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    doc="JSON UDFs: pluck/pluck_int64 → get_json_object "
    "(ref: src/carnot/funcs/builtins/json_ops.cc:30-69).",
)
def q_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k_val"), (k % 10).alias("k_mod")).where(
        F.col("k_val") > 50
    )


@query(
    "regex_ops",
    """
    SELECT p_partkey, p_type,
           regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
    doc="Regex UDFs: regex_match → rlike, regex_replace → regexp_replace "
    "(ref: src/carnot/funcs/builtins/regex_ops.cc:33-35). DuckDB "
    "regexp_replace needs the 'g' flag to match Spark's replace-all.",
)
def q_regex_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        "p_type",
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@query(
    "conditionals",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished
    FROM orders
    """,
    doc="Conditional UDFs: select(cond,a,b) → when/otherwise "
    "(ref: src/carnot/funcs/builtins/conditionals.cc:27-31).",
)
def q_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_finished"),
    )


@query(
    "quantiles",
    """
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS p50,
           floor(quantile_cont(value, 0.9) * 1e6 + 0.5) / 1e6 AS p90,
           floor(quantile_cont(value, 0.99) * 1e6 + 0.5) / 1e6 AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="quantiles UDA (t-digest sketch in the reference, "
    "src/carnot/funcs/builtins/math_sketches.h:92-129). Exact interpolated "
    "percentile here for oracle parity; the 100 TB path is "
    "approx_percentile (mergeable sketch — same partial/finalize shape as "
    "the reference's serialized t-digest state).",
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        dround(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        dround(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        dround(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# =============================================================================
# Training-data pipeline operators (BASELINE.json north star)
# =============================================================================


@query(
    "text_stats",
    """
    WITH base AS (
        SELECT doc_id, text,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_words,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
               len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                   / len(text) AS praw,
               len(regexp_extract_all(lower(text),
                   '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS n_stop,
               len(regexp_replace(text, '\\s+', '', 'g')) AS n_chars_nospace
        FROM documents
    )
    SELECT doc_id, n_words, n_tokens,
           floor(praw * 1e6 + 0.5) / 1e6 AS punct_ratio,
           floor((n_stop::DOUBLE / n_words) * 1e6 + 0.5) / 1e6 AS stopword_ratio,
           floor((n_chars_nospace::DOUBLE / n_words) * 1e6 + 0.5) / 1e6 AS mean_word_len
    FROM base
    """,
    doc="Text analysis: token counting (BPE-ish regex), word/punct/stopword "
    "stats — all native column expressions, zero-shuffle map stage.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return doc.select(
        "doc_id",
        tx.word_count(t).alias("n_words"),
        tx.token_count(t).alias("n_tokens"),
        dround(tx.punct_ratio(t), 6).alias("punct_ratio"),
        dround(tx.stopword_ratio(t), 6).alias("stopword_ratio"),
        dround(tx.mean_word_length(t), 6).alias("mean_word_len"),
    )


@query(
    "lang_id",
    """
    WITH scores AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los)\\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\\b(le|la|les|des|est)\\b')) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scores
    """,
    doc="Language-ID heuristic: marker-word argmax with deterministic "
    "tie-break (en > es > de > fr). Native regexp counts, no UDF.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", "lang", tx.lang_id(F.col("text")).alias("lang_pred"))


@query(
    "fingerprint",
    """
    SELECT doc_id,
           list_reduce(
               list_concat([0::BIGINT],
                           list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprinting: polynomial rolling hash fold((acc*31 + "
    "codepoint) mod 1e9+7) — identical left-fold in both engines, pure "
    "integer arithmetic.",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", tx.fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "dedup_exact",
    """
    SELECT min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents
    GROUP BY text
    """,
    doc="Exact deduplication: hash-groupBy on content. The Spark side "
    "shuffles an 8-byte xxhash64 of the text, never the text itself — the "
    "100 TB-friendly form; the oracle groups by raw text (same result "
    "absent hash collisions).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(doc, "doc_id", ["text"]).select("keep_id", "dup_count")


@query(
    "dedup_ngram_jaccard",
    """
    WITH w AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS shingle
        FROM w
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           floor((n_common::DOUBLE / (x.sz + y.sz - n_common)) * 1e6 + 0.5) / 1e6 AS jaccard
    FROM inter
    JOIN sz x ON inter.doc_a = x.doc_id
    JOIN sz y ON inter.doc_b = y.doc_id
    WHERE n_common::DOUBLE / (x.sz + y.sz - n_common) >= 0.5
    """,
    doc="Near-dup detection: exact word-5-gram Jaccard via PPJoin-style "
    "prefix filtering (rarity-first global shingle order; lossless). "
    "5-gram shingles keep posting lists selective; the LSH variant "
    "(dedup_minhash_lsh) is the 100 TB path.",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(doc, "doc_id", "text", n=5, threshold=0.5)
    return pairs.select("doc_a", "doc_b", dround("jaccard", 6).alias("jaccard"))


@query(
    "dedup_minhash_lsh",
    """
    WITH w AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS shingle
        FROM w
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           floor((n_common::DOUBLE / (x.sz + y.sz - n_common)) * 1e6 + 0.5) / 1e6 AS jaccard
    FROM inter
    JOIN sz x ON inter.doc_a = x.doc_id
    JOIN sz y ON inter.doc_b = y.doc_id
    WHERE n_common::DOUBLE / (x.sz + y.sz - n_common) >= 0.5
    """,
    doc="Near-dup detection via MinHash + banded LSH + exact verify: "
    "docs only meet inside a (band, bucket) posting list, exact Jaccard "
    "runs on candidates only — the 100 TB recall/verify shape. Gate "
    "config rows_per_band=1 → a true ≥0.5 pair is missed only if all 64 "
    "minwise values disagree (P ≤ 6e-20), so the output equals the exact "
    "all-pairs oracle. Production banding (16 bands × 4 rows) trades "
    "that recall for fewer candidates; est-Jaccard path in "
    "tests/test_dedup_extra.py.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_verified_pairs(
        doc, "doc_id", "text", n=5, num_hashes=64, bands=64, threshold=0.5
    )
    return pairs.select("doc_a", "doc_b", dround("jaccard", 6).alias("jaccard"))


def _simhash_oracle() -> str:
    """DuckDB oracle for the portable SimHash: the IDENTICAL digit/sum/
    assembly fragments the Spark side executes (simhash_md5_fragments),
    over the same words (regexp whitespace split, empties dropped)."""
    digits, sums, assemble = dd.simhash_md5_fragments()
    dsql = ", ".join(digits)
    ssql = ", ".join(f"{e} AS {a}" for e, a in sums)
    return f"""
    WITH words AS (
        SELECT doc_id AS doc, unnest(regexp_split_to_array(text, '\\s+')) AS word
        FROM documents
    ),
    w AS (SELECT doc, md5(word) AS h FROM words WHERE word <> ''),
    d AS (SELECT doc, {dsql} FROM w),
    b AS (SELECT doc, {ssql} FROM d GROUP BY doc)
    SELECT doc, {assemble} AS simhash FROM b
    """


@query(
    "dedup_simhash",
    _simhash_oracle(),
    doc="64-bit SimHash signatures (sign-sum of word-hash bits, 64 "
    "integer aggregates, one shuffle on doc_id). Gate runs the PORTABLE "
    "md5-bit variant so DuckDB replicates signatures bit-for-bit "
    "(hash-matched oracle); the xxhash64 production variant "
    "(operators/dedup.py:simhash) computes the same sign-majority "
    "algorithm ~2× cheaper and is verified by the hamming-closeness "
    "test on planted near-dups.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dd.simhash_md5(doc, "doc_id", "text")


@query(
    "dedup_substring",
    # Rows-only IN THE DRIVER GATE solely because the 50-entry gate
    # window is full of hash-matched rows; hash-checked locally via
    # local_oracle below (the same independent DuckDB implementation as
    # tests/test_dedup_extra.py::test_duplicate_spans_matches_duckdb_oracle).
    None,
    local_oracle="""
    WITH w AS (
        SELECT doc_id AS doc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    full_wins AS (
        SELECT doc, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) - 1 AS pos,
               unnest(list_transform(
                   range(1, greatest(len(ws) - 7, 0) + 1),
                   i -> array_to_string(ws[i:i+7], ' '))) AS wstr
        FROM w
    ),
    dup AS (
        SELECT wstr FROM full_wins GROUP BY wstr HAVING count(DISTINCT doc) >= 2
    ),
    hits AS (SELECT doc, pos FROM full_wins JOIN dup USING (wstr)),
    lagd AS (
        SELECT doc, pos, lag(pos) OVER (PARTITION BY doc ORDER BY pos) AS prev
        FROM hits
    ),
    isl AS (
        SELECT doc, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc ORDER BY pos) AS island
        FROM lagd
    )
    SELECT doc, CAST(MIN(pos) AS INT) AS span_start,
           CAST(MAX(pos) + 8 AS INT) AS span_end,
           COUNT(*) AS n_windows
    FROM isl GROUP BY doc, island ORDER BY doc, span_start
    """,
    doc="Substring-level exact dedup (Lee et al. 2022 ExactSubstr, "
    "re-expressed via k-gram window hashes instead of a suffix array): "
    "maximal spans of >=k consecutive words whose every k-window also "
    "appears in another document. All-native window-lead + xxhash64 + "
    "gaps-and-islands merge; shuffles move 8-byte window hashes only "
    "(operators/dedup.py:duplicate_spans).",
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dd.duplicate_spans(doc, "doc_id", "text", k=8).orderBy("doc", "span_start")


@query(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_reduce(
                   list_transform(range(1, len(e.embedding) + 1),
                                  i -> e.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE),
                   (acc, v) -> acc + v)
               / (sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1),
                                                  i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                                   (acc, v) -> acc + v))
                  * sqrt(list_reduce(list_transform(range(1, len(q.q_vec) + 1),
                                                    i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE),
                                     (acc, v) -> acc + v))) AS score
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, floor(score * 1e6 + 0.5) / 1e6 AS score, rank
    FROM ranked WHERE rank <= 10
    """,
    doc="Similarity search: exact brute-force cosine top-k (query batch "
    "broadcast, corpus map-scored, per-query TakeOrdered). The cosine fold "
    "is zip_with+aggregate — JVM codegen, no UDF — with left-fold order "
    "matching the oracle so doubles are bit-identical. LSH-bucketed "
    "variant: ann_lsh_topk.",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8)
    out = sim.brute_force_topk(emb, queries_df, "vec_id", "embedding", k=10)
    return out.select("query_id", "vec_id", dround("score", 6).alias("score"), "rank")


@query(
    "ann_lsh_topk",
    None,  # approximate by construction — rows-only; recall vs brute force in tests.
    doc="ANN scale path: random-hyperplane LSH bucketing (deterministic "
    "planes, seed=42); a query scores only its own bucket. At 100 TB the "
    "corpus is pre-partitioned by bucket at write time → a query reads "
    "1/2^n_planes of the data. Recall measured against brute force in "
    "tests/test_similarity.py.",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8)
    return sim.lsh_topk(emb, queries_df, "vec_id", "embedding", k=10, n_planes=4, n_tables=8, dim=64)


@query(
    "ann_ivf_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_reduce(
                   list_transform(range(1, len(e.embedding) + 1),
                                  i -> e.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE),
                   (acc, v) -> acc + v)
               / (sqrt(list_reduce(list_transform(range(1, len(q.q_vec) + 1),
                                                  i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE),
                                   (acc, v) -> acc + v))
                  * sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1),
                                                    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                                     (acc, v) -> acc + v))) AS score
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, floor(score * 1e6 + 0.5) / 1e6 AS score, rank
    FROM ranked WHERE rank <= 10
    """,
    doc="ANN scale path #2: IVF (inverted-file) with a kmeans coarse "
    "quantizer (operators/similarity.ivf_topk; faiss IVF-Flat structure "
    "as a Spark plan). Corpus assigned to n_lists inverted lists; a "
    "query scores only its nprobe nearest lists. At 100 TB the corpus "
    "parquet is partitioned BY list_id at write time → probing becomes "
    "partition pruning, reading nprobe/n_lists of the data. Gate runs "
    "nprobe=n_lists — the pytest-proven exact-equivalence configuration "
    "(every list probed ⇒ ≡ brute force, whatever the quantizer learned) "
    "— against the exact top-k oracle, so the whole IVF machinery "
    "(training, assignment, probe join, in-list scoring) is hash-checked. "
    "Approximate-recall invariants at nprobe<n_lists stay in "
    "tests/test_operators.py.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8)
    out = sim.ivf_topk(
        emb, queries_df, "vec_id", "embedding", k=10, n_lists=8, nprobe=8, dim=64
    )
    return out.select("query_id", "vec_id", dround("score", 6).alias("score"), "rank")


# =============================================================================
# Time-series operators beyond the reference algebra (SURVEY §2.3 gaps)
# =============================================================================


@query(
    "asof_join",
    """
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'purchase'),
         l AS (SELECT user_id, epoch_us(ts) AS lts_us FROM events
               WHERE event_type = 'login')
    SELECT p.event_id, p.user_id, p.ts_us, l.lts_us AS last_login_us
    FROM p ASOF LEFT JOIN l
      ON p.user_id = l.user_id AND p.ts_us >= l.lts_us
    """,
    doc="As-of join (absent from the reference algebra — SURVEY §2.3): "
    "latest login at-or-before each purchase per user. Spark impl is the "
    "union+window trick (pixie_spark.operators.asof): ONE shuffle on the "
    "key, no range-join blowup — the scalable formulation for "
    "billion-row event backfills. Oracle: DuckDB native ASOF JOIN.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts DIV 1000"))
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    logins = ev.where(F.col("event_type") == "login").select(
        "user_id", F.col("ts_us").alias("lts_us")
    )
    out = asof_join(
        purchases, logins, on="user_id", left_time="ts_us", right_time="lts_us",
        value_cols=["lts_us"], suffix="",
    )
    return out.select(
        "event_id", "user_id", "ts_us", F.col("lts_us").alias("last_login_us")
    )


@query(
    "sessionize",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
    n AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 3600000000 THEN 1 ELSE 0 END AS nw
          FROM l),
    s AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM n)
    SELECT event_id, user_id, session_id,
           min(ts_us) OVER (PARTITION BY user_id, session_id) AS session_start_us
    FROM s
    """,
    doc="Gap-based sessionization (1h timeout) — lag + running-sum of "
    "session starts, one shuffle per key (pixie_spark.operators.asof."
    "sessionize). Streaming twin: session_window() in Structured "
    "Streaming.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.asof import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    out = sessionize(ev, "user_id", "ts_us", gap=3_600_000_000, tiebreak_col="event_id")
    return out.select(
        "event_id", "user_id", "session_id",
        F.col("session_start").alias("session_start_us"),
    )


# =============================================================================
# Relational surface beyond the reference (Spark-native, SURVEY §2.3)
# =============================================================================


@query(
    "pivot_wide",
    """
    SELECT l_returnflag,
           floor(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) * 1e4 + 0.5) / 1e4 AS O,
           floor(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) * 1e4 + 0.5) / 1e4 AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot (wide aggregation) — absent from the reference; native in "
    "Spark (RelationalGroupedDataset.pivot with explicit value list → no "
    "extra distinct-values job).",
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag", dround("O", 4).alias("O"), dround("F", 4).alias("F")
    )


@query(
    "rollup_hierarchy",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Rollup / grouping sets — absent from the reference algebra "
    "(SURVEY §2.3), native in Spark (single Expand + one aggregation, "
    "no N-pass scans).",
)
def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_extendedprice"), 2).alias("total"),
    )


@query(
    "set_ops",
    """
    SELECT nationkey, 'both' AS src FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'customer_only' AS src FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    doc="Intersect / except — absent from the reference (SURVEY §2.3); "
    "Spark compiles both to aggregated semi/anti joins.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    su = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cu.intersect(su).withColumn("src", F.lit("both"))
    conly = cu.subtract(su).withColumn("src", F.lit("customer_only"))  # EXCEPT DISTINCT
    return both.unionByName(conly)


@query(
    "string_agg_sorted",
    """
    SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM supplier GROUP BY s_nationkey
    """,
    doc="Ordered string aggregation: collect_list + array_sort + "
    "concat_ws (deterministic across partitionings — sort happens after "
    "the partial-agg merge).",
)
def q_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = load_table(spark, sf_dir, "supplier")
    return su.groupBy("s_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("suppliers")
    )


# =============================================================================
# Source operators (SURVEY §2.1: UDTFSource, EmptySource) + px facade e2e
# =============================================================================


@query(
    "udtf_catalog_tables",
    """
    SELECT * FROM (VALUES
        ('customer'), ('documents'), ('embeddings'), ('events'), ('lineitem'),
        ('nation'), ('orders'), ('part'), ('region'), ('supplier')
    ) AS t(table_name)
    """,
    doc="UDTFSource (ref: src/carnot/exec/udtf_source_node.cc, "
    "registrations src/vizier/funcs/md_udtfs/md_udtfs.cc:32-59 — e.g. "
    "GetTables): driver-side generator → createDataFrame; catalog "
    "introspection replaces the reference's metadata UDTFs.",
)
def q_udtf_catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    names = sorted(
        f[: -len(".parquet")]
        for f in _os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    return spark.createDataFrame([(n,) for n in names], "table_name: string")


@query(
    "empty_source",
    # Rows-only BY DESIGN since round 4: the driver's gate window holds 50
    # rows and all 50 go to value-bearing queries — this 0-row schema
    # check ceded its slot to the hash-matched dedup_simhash row. The
    # local oracle closes the loop: same 0-row/column/dtype comparison
    # through the gate comparator.
    None,
    local_oracle="""
    SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS VARCHAR) AS name
    WHERE false
    """,
    doc="EmptySource (ref: src/carnot/exec/empty_source_node.cc): zero "
    "rows, fixed schema.",
    allow_empty=True,
)
def q_empty_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.sources import empty_source

    return empty_source(spark, "id long, name string")


@query(
    "pxl_facade_agg",
    """
    SELECT o_orderpriority, count(*) AS n,
           floor(sum(o_totalprice) * 1e2 + 0.5) / 1e2 AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    doc="End-to-end through the PxL API facade (px.DataFrame → bracket "
    "filter → groupby → agg tuples → function registry) proving the "
    "facade emits oracle-correct plans, not just the raw DataFrame path.",
)
def q_pxl_facade_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pixie_spark.api as px

    px.set_context(spark, tables={"orders": load_table(spark, sf_dir, "orders")})
    df = px.DataFrame("orders")
    df = df[df.o_orderstatus == "F"]
    out = df.groupby(["o_orderpriority"]).agg(
        n=("o_orderkey", "px.count"),
        revenue=("o_totalprice", "px.sum"),
    )
    sdf = out.to_spark()
    return sdf.select("o_orderpriority", "n", dround("revenue", 2).alias("revenue"))


@query(
    "dedup_embedding_cosine",
    """
    WITH s AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_reduce(list_transform(range(1, len(a.embedding)+1),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x,y) -> x+y)
               / (sqrt(list_reduce(list_transform(range(1, len(a.embedding)+1),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE), (x,y) -> x+y))
                  * sqrt(list_reduce(list_transform(range(1, len(b.embedding)+1),
                      i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x,y) -> x+y)))
               AS score
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, floor(score * 1e6 + 0.5) / 1e6 AS score
    FROM s WHERE score >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs (exact all-pairs core; the 100 TB "
    "path is the same operator with prefilter=True → multi-table LSH "
    "bucket join generates candidates, only colliding pairs are scored). "
    "Identical left-fold cosine in both engines → bit-identical doubles.",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.embedding_dedup_pairs(emb, "vec_id", "embedding", threshold=0.4, prefilter=False)
    return out.select("id_a", "id_b", dround("score", 6).alias("score"))


def _lsh_oracle_sql(threshold: float, n_planes: int, n_tables: int, dim: int) -> str:
    """DuckDB oracle that replicates the LSH bucketing EXACTLY.

    Both engines compute each plane dot as the same left-associated
    double chain over the same full-precision literals, so the sign test
    (and therefore every bucket, candidate pair, and final score) is
    bit-identical — the oracle verifies the whole LSH pipeline
    cross-engine, not just the output's plausibility. repr() literals
    round-trip exactly through DuckDB's strtod."""
    planes = sim._hyperplanes(dim, n_planes * n_tables)
    ents = []
    for t in range(n_tables):
        bits = []
        for i in range(n_planes):
            plane = planes[t * n_planes + i]  # sparse [(idx, weight), ...]
            dot = " + ".join(
                f"(embedding[{d + 1}]::DOUBLE * {w!r})" for d, w in plane
            )
            bits.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END")
        bucket = " + ".join(bits)
        ents.append(
            f"SELECT vec_id, {t} AS tbl, ({bucket})::BIGINT AS bucket FROM embeddings"
        )
    ent = "\n        UNION ALL\n        ".join(ents)
    return f"""
    WITH ent AS (
        {ent}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM ent a JOIN ent b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    s AS (
        SELECT id_a, id_b,
               list_reduce(list_transform(range(1, len(ea.embedding)+1),
                   i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE), (x,y) -> x+y)
               / (sqrt(list_reduce(list_transform(range(1, len(ea.embedding)+1),
                      i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE), (x,y) -> x+y))
                  * sqrt(list_reduce(list_transform(range(1, len(eb.embedding)+1),
                      i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE), (x,y) -> x+y)))
               AS score
        FROM cand JOIN embeddings ea ON ea.vec_id = cand.id_a
                  JOIN embeddings eb ON eb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, floor(score * 1e6 + 0.5) / 1e6 AS score
    FROM s WHERE score >= {threshold!r}
    """


@query(
    "dedup_embedding_cosine_lsh",
    _lsh_oracle_sql(threshold=0.4, n_planes=6, n_tables=8, dim=64),
    doc="Embedding near-dup via the 100 TB SCALE path: multi-table "
    "hyperplane LSH bucket join generates candidates (only bucket-"
    "colliding pairs are scored — no all-pairs BNLJ), then the exact "
    "cosine post-filter keeps pairs >= threshold; output is a subset of "
    "the exact all-pairs result by construction. 6 planes x 8 tables = "
    "64 buckets/table, ~8x candidate reduction even at this loose "
    "threshold (the synthetic corpus max cosine is 0.51; at a real 0.9 "
    "dedup threshold the same index prunes >100x). The oracle replays "
    "the identical bucketing in DuckDB (see _lsh_oracle_sql) so the "
    "ENTIRE LSH pipeline is hash-verified cross-engine.",
)
def q_dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.embedding_dedup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, prefilter=True,
        n_planes=6, n_tables=8,
    )
    return out.select("id_a", "id_b", dround("score", 6).alias("score"))


@query(
    "multi_join_star",
    """
    SELECT n.n_name, r.r_name,
           floor(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5) AS BIGINT)) / 1e4 * 1e2 + 0.5) / 1e2 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name, r.r_name
    """,
    doc="TPC-H-Q5-shaped star join: fact-fact join (lineitem x orders, "
    "shuffled on the key) + four broadcast dimension joins; Catalyst "
    "reorders and AQE re-plans at runtime. The canonical 100 TB join "
    "pyramid: only ONE shuffle of each fact table, dims never move.",
)
def q_multi_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        li.join(od.where(F.col("o_orderstatus") == "F"), li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            # Revenue summed in EXACT integer space: price and discount
            # are 2-decimal, so each term price*(1-disc) is an exact
            # multiple of 1e-4 — floor(term*1e4+0.5) recovers the exact
            # decimal product and the BIGINT sum is order-independent
            # (the sf1 sweep caught a float-reassociation sum landing
            # exactly on a .005 cent boundary; both engines now divide
            # the SAME integer, so the final rounding is bit-identical).
            dround(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e4)
                        + F.lit(0.5)
                    )
                )
                / F.lit(1e4),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "multimodal_features",
    None,  # mapInPandas featurizer over synthetic binary media — rows-only.
    doc="Multimodal plumbing: binary payload columns + typed metadata → "
    "Arrow-batched mapInPandas featurizer. ALL THREE kinds run REAL "
    "pure-numpy decoders: netpbm images, PCM-WAV spectral audio, and "
    "uncompressed-DIB AVI video (temporal luminance signature) — see "
    "operators/multimodal; compressed codecs are lib-gated (Pillow) or "
    "loud errors, never silent fakes. Payloads are consumed in the map "
    "stage and never shuffled.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=200)
    feats = mm.extract_features(media, fake=False)
    return feats.select(
        "media_id", "kind", "payload_bytes", dround(F.element_at("feature", 1), 6).alias("f0")
    )


@query(
    "kmeans_clusters",
    None,  # iterative algorithm — rows-only (SURVEY §2.4 ml_ops).
    doc="KMeans (ref: _kmeans_fit/_kmeans_inference, ml_ops.cc + "
    "exec/ml/kmeans.cc): Lloyd's iterations as DataFrame aggregations — "
    "assignment is a native argmin expression over broadcast centroid "
    "literals; one k-row shuffle per iteration. Deterministic init.",
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.functions.ml_ops import kmeans_fit, kmeans_inference

    emb = load_table(spark, sf_dir, "embeddings")
    # small k / few iterations: at sf0.01 the cost is Catalyst codegen per
    # iteration (literal centroids change each round), not data
    centroids = kmeans_fit(emb, "embedding", k=4, max_iter=3, dim=64)
    out = kmeans_inference(emb, centroids, "embedding")
    return out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))


@query(
    "embedding_pipeline_e2e",
    None,  # approximate LSH chain — rows-only; components tested separately.
    doc="End-to-end LLM-pipeline chain: documents → quality filter → "
    "REAL transformer-encoder inference (the ONNX pandas_udf batch path "
    "driven by the numpy session — tokenize/pad/mask/forward/mean-pool, "
    "functions/np_encoder.py; point model_path at an .onnx file for a "
    "learned encoder) → LSH-bucketed ANN self-similarity → top-1 "
    "neighbor per doc. Exercises the full text→vector→search path.",
)
def q_embedding_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.functions.ml_ops import text_embedding
    from pixie_spark.functions.np_encoder import ensure_tiny_encoder
    from pixie_spark.operators.text import quality_score

    model_path, vocab_path = ensure_tiny_encoder()
    doc = load_table(spark, sf_dir, "documents")
    # checkpoint: the embedding is the expensive stage (a real encoder
    # forward per Arrow batch) and feeds BOTH the corpus and query sides
    # of the self-similarity join — without it inference runs once per
    # consumer
    embedded = (
        doc.where(quality_score(F.col("text")) >= 0.5)
        .select(
            "doc_id",
            text_embedding(
                F.col("text"), model_path=model_path, tokenizer_path=vocab_path
            ).alias("emb"),
        )
        .transform(materialize)
    )
    queries_df = embedded.where(F.col("doc_id") % 50 == 0)
    out = sim.lsh_topk(
        embedded, queries_df, id_col="doc_id", vec_col="emb",
        k=1, n_planes=4, n_tables=4, dim=32,
    )
    return out.select(
        F.col("query_id").alias("doc_id"),
        F.col("vec_id").alias("nearest_doc"),
        dround("score", 6).alias("score"),
    )


@query(
    "funnel_conversion",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s AS (SELECT user_id, min(us) AS signup_us FROM e WHERE event_type = 'signup'
          GROUP BY user_id),
    p AS (SELECT e.user_id, min(e.us) AS first_purchase_us
          FROM e JOIN s ON e.user_id = s.user_id AND e.us >= s.signup_us
          WHERE e.event_type = 'purchase'
          GROUP BY e.user_id)
    SELECT s.user_id, s.signup_us, p.first_purchase_us,
           coalesce(p.first_purchase_us - s.signup_us <= 604800000000, false) AS converted_7d
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    doc="Funnel analysis: first signup → first subsequent purchase per "
    "user, 7-day conversion flag. Two keyed aggregations + one join on "
    "user_id — the standard product-analytics shape; at scale both aggs "
    "and the join share the user_id partitioning (single shuffle).",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("us")
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s.withColumnRenamed("user_id", "u2"),
              (F.col("user_id") == F.col("u2")) & (F.col("us") >= F.col("signup_us")))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase_us"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        "signup_us",
        "first_purchase_us",
        F.coalesce(
            (F.col("first_purchase_us") - F.col("signup_us")) <= 604_800_000_000, F.lit(False)
        ).alias("converted_7d"),
    )


@query(
    "latency_histogram",
    """
    SELECT CAST(length(bin(CAST(floor(value) AS BIGINT) + 1)) - 1 AS BIGINT) AS log2_bucket,
           count(*) AS n,
           floor(min(value) * 1e4 + 0.5) / 1e4 AS bucket_min,
           floor(max(value) * 1e4 + 0.5) / 1e4 AS bucket_max
    FROM events
    WHERE value > 0
    GROUP BY 1
    """,
    doc="Log-scale histogram (the latency-distribution view of the "
    "reference's UI): power-of-two buckets of floor(value)+1, computed as "
    "length(bin(n))-1 — EXACT integer floor(log2) with no float logs. "
    "(ln(x)/ln(2) differs between Java's Math.log and libm by 1-2 ulp on "
    "~3% of inputs, so a float formulation flips buckets at boundaries — "
    "e.g. Math.log(8)/Math.log(2) = 2.9999999999999996.)",
)
def q_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_int = F.floor(F.col("value")).cast("long") + 1
    bucket = (F.length(F.bin(n_int)) - 1).cast("long")
    return (
        ev.where(F.col("value") > 0)
        .groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.min("value"), 4).alias("bucket_min"),
            dround(F.max("value"), 4).alias("bucket_max"),
        )
    )


@query(
    "window_lag_diff",
    """
    SELECT event_id, user_id,
           floor((value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
                 * 1e4 + 0.5) / 1e4 AS value_diff
    FROM events
    """,
    doc="Analytic lag window: per-user value deltas in event order — the "
    "counter-diff primitive behind rate computations; one shuffle on "
    "user_id. Deterministic tiebreak on event_id.",
)
def q_window_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("ts DIV 1000"), F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        dround(F.col("value") - F.lag("value").over(w), 4).alias("value_diff"),
    )


@query(
    "cube_aggregate",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           floor(sum(l_quantity) * 1e4 + 0.5) / 1e4 AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Cube (all grouping-set combinations) — absent from the reference "
    "algebra (SURVEY §2.3); single Expand + one hash aggregation in Spark.",
)
def q_cube_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_quantity"), 4).alias("total_qty"),
    )


@query(
    "range_join_error_context",
    """
    WITH p AS (SELECT event_id, epoch_us(ts) AS p_us FROM events
               WHERE event_type = 'purchase'),
         e AS (SELECT epoch_us(ts) AS e_us FROM events WHERE event_type = 'error')
    SELECT p.event_id, p.p_us, count(e.e_us) AS n_recent_errors
    FROM p LEFT JOIN e ON e.e_us >= p.p_us - 3600000000 AND e.e_us <= p.p_us
    GROUP BY p.event_id, p.p_us
    """,
    doc="Range/interval join (absent from the reference algebra — SURVEY "
    "§2.3): system-wide errors in the hour before each purchase. Naive "
    "inequality joins plan as cartesian products in Spark; the operator "
    "(pixie_spark.operators.rangejoin) bucketizes both sides so the plan "
    "is an equijoin on the band bucket — one shuffle, no n². Left-join "
    "semantics recovered by re-joining purchases with zero-fill.",
)
def q_range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.expr("ts DIV 1000").alias("p_us")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.expr("ts DIV 1000").alias("e_us")
    )
    matched = range_join(
        purchases, errors, "p_us", "e_us", lower_ns=-3_600_000_000, upper_ns=0
    )
    counts = matched.groupBy("event_id", "p_us").agg(
        F.count(F.lit(1)).alias("n_recent_errors")
    )
    return purchases.join(counts, ["event_id", "p_us"], "left").select(
        "event_id", "p_us", F.coalesce("n_recent_errors", F.lit(0)).alias("n_recent_errors")
    )


@query(
    "stratified_downsample",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY list_reduce(
                       list_concat([0::BIGINT],
                           list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
                       (a, b) -> (a * 31 + b) % 1000000007), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 20
    """,
    doc="Stratified downsampling (training-data mixing: cap each source's "
    "contribution): deterministic n-per-stratum by ranking on the "
    "content fingerprint — pseudo-random but reproducible across engines "
    "and runs. One shuffle on the stratum key. The seeded-hash variant "
    "for production is operators/sampling.stratified_downsample.",
)
def q_stratified_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(tx.fingerprint(F.col("text")), F.col("doc_id"))
    return (
        doc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "source")
    )


@query(
    "sequence_packing",
    """
    WITH c AS (
        SELECT doc_id, n_chars,
               coalesce(sum(n_chars) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
        FROM documents
    )
    SELECT doc_id, n_chars, CAST(floor(cum_prev / 4096) AS BIGINT) AS pack_id
    FROM c
    """,
    doc="Sequence packing (fill ~4096-char context windows in doc_id "
    "order): pack_id = exclusive-prefix-sum DIV budget "
    "(operators/sampling.sequence_packing). At 100 TB the prefix sum "
    "becomes per-partition sums + a driver offset pass; same formula.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import sequence_packing

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sequence_packing(doc, "n_chars", budget=4096, order_col="doc_id")


@query(
    "corpus_preprocess",
    """
    WITH stats AS (
        SELECT doc_id, text,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_words,
               len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                   / len(text) AS praw,
               len(regexp_extract_all(lower(text),
                   '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS n_stop,
               len(regexp_replace(text, '\\s+', '', 'g')) AS n_nospace
        FROM documents
    ),
    quality AS (
        SELECT doc_id, text,
               (CASE WHEN n_words BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END
                + CASE WHEN n_stop::DOUBLE / n_words > 0.01 THEN 1.0 ELSE 0.0 END
                + CASE WHEN n_nospace::DOUBLE / n_words BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END
                + CASE WHEN praw < 0.2 THEN 1.0 ELSE 0.0 END) / 4.0 AS q
        FROM stats
    ),
    kept AS (SELECT doc_id, text FROM quality WHERE q >= 0.5),
    dedup AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text)
    SELECT k.doc_id, d.lang, d.source
    FROM dedup k JOIN documents d ON k.doc_id = d.doc_id
    """,
    doc="Composite C4-style preprocessing pipeline: quality filter "
    "(length/stopword/word-shape/punctuation rules) → exact dedup "
    "(keep lowest id per identical text) → metadata projection. One map "
    "stage + one content-hash shuffle + one keyed join — the whole "
    "pipeline shape a 100 TB corpus cleanup runs.",
)
def q_corpus_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    kept = doc.where(tx.quality_score(F.col("text")) >= 0.5)
    deduped = (
        kept.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    return deduped.join(doc, "doc_id").select("doc_id", "lang", "source")


@query(
    "contamination_check",
    """
    WITH w AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS shingle
        FROM w
    ),
    probe AS (SELECT doc_id AS probe_doc, shingle FROM sh WHERE doc_id < 5)
    SELECT c.doc_id AS doc, count(*) AS n_hits,
           count(DISTINCT p.probe_doc) AS n_probe_docs
    FROM sh c JOIN probe p ON c.shingle = p.shingle
    WHERE c.doc_id >= 5
    GROUP BY c.doc_id
    """,
    doc="Benchmark-contamination check: corpus docs sharing any word "
    "5-gram with a probe set (here: docs 0-4 as the stand-in benchmark). "
    "Probe shingles broadcast; the corpus never shuffles "
    "(operators/dedup.contamination_check).",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    probes = doc.where(F.col("doc_id") < 5)
    corpus = doc.where(F.col("doc_id") >= 5)
    return dd.contamination_check(corpus, probes, "doc_id", "text", "doc_id", "text", n=5)


@query(
    "pprof_profile",
    """
    SELECT CAST(10 AS BIGINT) AS period_ms,
           CAST(count(*) AS BIGINT) AS n_stacks,
           CAST(sum(n) AS BIGINT) AS total_samples
    FROM (
        SELECT concat('root;', event_type, ';u', CAST(user_id % 5 AS VARCHAR)) AS stack,
               count(*) AS n
        FROM events
        GROUP BY 1
    )
    """,
    doc="px.pprof UDA (ref: src/carnot/funcs/builtins/pprof_ops.h:35-130, "
    "src/shared/pprof/pprof.cc:31-146): folded stacks -> pprof "
    "profile.proto wire bytes. The Spark result ENCODES the histogram to "
    "proto and DECODES it back (operators/pprof.py) — the oracle computes "
    "the same stats directly in SQL, so a hash match proves the wire "
    "round-trip preserves the histogram. Distinct-stack reduction is a "
    "native partial+final hash agg; only the reduced histogram reaches "
    "Python.",
)
def q_pprof_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.pprof import decode_pprof, pprof_profile

    ev = load_table(spark, sf_dir, "events")
    stacks = ev.select(
        F.concat_ws(
            ";", F.lit("root"), "event_type", F.concat(F.lit("u"), F.col("user_id") % 5)
        ).alias("stack_trace"),
        F.lit(1).alias("count"),
        F.lit(10).alias("profiler_sampling_period_ms"),
    )
    prof = pprof_profile(stacks)

    def _stats(it):
        import pandas as pd

        for pdf in it:
            for blob in pdf["pprof"]:
                period_ms, histo = decode_pprof(bytes(blob))
                yield pd.DataFrame(
                    {
                        "period_ms": [period_ms],
                        "n_stacks": [len(histo)],
                        "total_samples": [sum(histo.values())],
                    }
                )

    return prof.mapInPandas(
        _stats, "period_ms long, n_stacks long, total_samples long"
    )


@query(
    "dedup_clusters",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — exact-Jaccard pairs (the full-recall
    # banding config is hash-proven equal to them by the
    # dedup_minhash_lsh gate row) closed with a recursive min-label
    # propagation — plus a union-find reference in
    # tests/test_clustering.py across chains, cliques, stars and
    # random graphs.
    None,
    local_oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS shingle
        FROM w
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a AS a, doc_b AS b
        FROM inter
        JOIN sz x ON inter.doc_a = x.doc_id
        JOIN sz y ON inter.doc_b = y.doc_id
        WHERE n_common::DOUBLE / (x.sz + y.sz - n_common) >= 0.5
    ),
    sym AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b AS node, r.lbl
        FROM reach r JOIN sym s ON s.a = r.node
        WHERE r.lbl < s.b
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT component, count(*) AS n_docs FROM comp
    GROUP BY component ORDER BY component
    """,
    doc="Full production dedup pipeline: minhash-LSH verified pairs -> "
    "connected components (alternating large-star/small-star, Kiveris "
    "et al. 2014) -> duplicate-cluster roll-up. No adjacency list is "
    "ever materialized; every round is two shuffles on 8-byte node ids "
    "(operators/clustering.py). dedup_keep_canonical produces the "
    "cleaned corpus from the same closure.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.clustering import duplicate_clusters

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_lsh_verified_pairs(
        doc, "doc_id", "text", n=5, num_hashes=64, bands=64, threshold=0.5
    )
    return duplicate_clusters(pairs).orderBy("component")


@query(
    "vocab_bpe_stats",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below (the registered query is the FIRST-merge
    # pair statistic — fully deterministic; only bpe_train's merge LOOP
    # is iterative), plus Python references in tests/test_vocab.py.
    None,
    local_oracle="""
    WITH w AS (
        SELECT lower(unnest(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> ''))) AS term
        FROM documents
    ),
    vocab AS (SELECT term, count(*) AS cnt FROM w GROUP BY term),
    p AS (
        SELECT substr(term, CAST(i AS INT), 1) AS l,
               substr(term, CAST(i AS INT) + 1, 1) AS r, cnt
        FROM (SELECT term, cnt, unnest(range(1, length(term))) AS i
              FROM vocab WHERE length(term) > 1)
    )
    SELECT l AS "left", r AS "right", CAST(sum(cnt) AS BIGINT) AS count
    FROM p GROUP BY 1, 2 ORDER BY count DESC, "left", "right" LIMIT 50
    """,
    doc="Tokenizer-prep statistics: corpus vocabulary (term, count, "
    "doc_freq — map-side partials absorb Zipf head terms) and "
    "BPE-merge adjacent-char-pair frequencies computed from the "
    "DISTINCT-word vocabulary weighted by count, so a million-"
    "occurrence word explodes its characters once "
    "(operators/text.py:vocab_stats, bpe_pair_stats).",
)
def q_vocab_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.text import bpe_pair_stats

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_pair_stats(doc, top_k=50)


def _clean_pipeline_oracle() -> str:
    """DuckDB oracle for the WHOLE cleaning funnel: quality gate
    (STRUCTURAL_RULES subset, min_words=5) → exact dedup (min-id per
    identical text) → exact-Jaccard ≥0.5 near-dup pairs (the config the
    dedup_minhash_lsh gate row proves equal to the engine's full-recall
    banding) → recursive-CTE component closure → canonical filter →
    duplicate-span removal with canonical owners. Every stage reuses an
    oracle pattern already hash-proven on its standalone query; the
    funnel holds them end-to-end against the composed DAG."""
    gram_union = "\n        UNION ALL ".join(
        f"SELECT doc, {n} AS n, unnest(list_transform(range(1, greatest(len(ws)-{n-1},0)+1), "
        f"i -> array_to_string(ws[i:i+{n-1}], ' '))) AS g FROM b"
        for n in range(2, 11)
    )
    top_frac = lambda n: (  # noqa: E731
        f"least(1.0, coalesce((SELECT t.prod FROM tops t "
        f"WHERE t.doc = st.doc AND t.n = {n} AND t.rn = 1) / st.tc, 0.0))"
    )
    dup_frac = lambda n: (  # noqa: E731
        f"least(1.0, coalesce((SELECT dd.prod FROM dups dd "
        f"WHERE dd.doc = st.doc AND dd.n = {n}) / st.tc, 0.0))"
    )
    ng_rules = " AND ".join(
        [f"{top_frac(n)} <= {t}" for n, t in ((2, 0.20), (3, 0.18), (4, 0.16))]
        + [f"{dup_frac(n)} <= {t}" for n, t in
           ((5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10))]
    )
    return f"""
    WITH RECURSIVE d0 AS (SELECT doc_id AS doc, text FROM documents
                          WHERE doc_id % 10 = 0),
    b AS (
        SELECT doc, text, CAST(length(text) AS BIGINT) AS tc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws,
               list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
               list_filter(string_split_regex(text, '\\n\\s*\\n'), x -> trim(x) <> '') AS paras
        FROM d0
    ),
    st AS (
        SELECT doc, tc, len(ws) AS n_words,
            CASE WHEN len(ws) > 0
                 THEN coalesce(list_sum(list_transform(ws, x -> length(x))), 0) / len(ws)
                 ELSE 0.0 END AS mwl,
            CASE WHEN len(lines) > 0
                 THEN (len(lines) - len(list_distinct(lines))) / len(lines)
                 ELSE 0.0 END AS ldf,
            CASE WHEN coalesce(list_sum(list_transform(lines, s -> length(s))), 0) > 0
                 THEN (list_sum(list_transform(lines, s -> length(s)))
                       - list_sum(list_transform(list_distinct(lines), s -> length(s))))
                      / list_sum(list_transform(lines, s -> length(s)))
                 ELSE 0.0 END AS ldcf,
            CASE WHEN len(paras) > 0
                 THEN (len(paras) - len(list_distinct(paras))) / len(paras)
                 ELSE 0.0 END AS pdf,
            CASE WHEN coalesce(list_sum(list_transform(paras, s -> length(s))), 0) > 0
                 THEN (list_sum(list_transform(paras, s -> length(s)))
                       - list_sum(list_transform(list_distinct(paras), s -> length(s))))
                      / list_sum(list_transform(paras, s -> length(s)))
                 ELSE 0.0 END AS pdcf
        FROM b
    ),
    gr AS ({gram_union}),
    cnts AS (SELECT doc, n, g, count(*) AS c FROM gr GROUP BY doc, n, g),
    tops AS (
        SELECT doc, n, c * length(g) AS prod,
               row_number() OVER (PARTITION BY doc, n ORDER BY c DESC, length(g) DESC) AS rn
        FROM cnts WHERE c > 1 AND n IN (2, 3, 4)
    ),
    dups AS (
        SELECT doc, n, sum(c * length(g)) AS prod
        FROM cnts WHERE c > 1 AND n >= 5 GROUP BY doc, n
    ),
    aq AS (
        SELECT st.doc FROM st
        WHERE st.n_words >= 5 AND st.n_words <= 100000
          AND st.mwl >= 3.0 AND st.mwl <= 10.0
          AND st.ldf <= 0.30 AND st.pdf <= 0.30
          AND st.ldcf <= 0.20 AND st.pdcf <= 0.20
          AND {ng_rules}
    ),
    ae AS (
        SELECT min(b.doc) AS doc FROM b JOIN aq USING (doc) GROUP BY b.text
    ),
    sh AS (
        SELECT b.doc,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> array_to_string(ws[i:i+4], ' ')))) AS shingle
        FROM b JOIN ae USING (doc)
    ),
    sz AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
    np AS (
        SELECT a.doc AS a, b2.doc AS b2 FROM sh a JOIN sh b2
          ON a.shingle = b2.shingle AND a.doc < b2.doc
        GROUP BY 1, 2
        HAVING count(*)::DOUBLE /
               ((SELECT sz FROM sz WHERE sz.doc = a.doc)
                + (SELECT sz FROM sz WHERE sz.doc = b2.doc) - count(*)) >= 0.5
    ),
    sym AS (SELECT a, b2 AS b FROM np UNION SELECT b2 AS a, a AS b FROM np),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    losers AS (SELECT node AS doc FROM comp WHERE node <> component),
    an AS (SELECT ae.doc FROM ae LEFT JOIN losers USING (doc) WHERE losers.doc IS NULL),
    anw AS (SELECT b.doc, b.ws FROM b JOIN an USING (doc)),
    wins AS (
        SELECT doc, unnest(range(1, greatest(len(ws) - 9, 0) + 1)) - 1 AS pos,
               unnest(list_transform(range(1, greatest(len(ws) - 9, 0) + 1),
                      i -> array_to_string(ws[i:i+9], ' '))) AS wstr
        FROM anw
    ),
    owners AS (
        SELECT wstr, min(doc) AS owner FROM wins
        GROUP BY wstr HAVING count(DISTINCT doc) >= 2
    ),
    cover AS (
        SELECT DISTINCT w2.doc, w2.pos + unnest(range(0, 10)) AS p
        FROM wins w2 JOIN owners o ON o.wstr = w2.wstr AND w2.doc <> o.owner
    )
    SELECT (SELECT count(*) FROM d0) AS n_input,
           (SELECT count(*) FROM aq) AS n_after_quality,
           (SELECT count(*) FROM ae) AS n_after_exact,
           (SELECT count(*) FROM np) AS n_near_pairs,
           (SELECT count(*) FROM an) AS n_after_near,
           (SELECT count(*) FROM anw WHERE len(ws) > 0) AS n_clean,
           (SELECT CAST(coalesce(count(*), 0) AS BIGINT) FROM cover)
               AS words_removed_by_span_dedup
    """


@query(
    "corpus_clean_pipeline",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — the WHOLE funnel composed from the
    # stage-oracle patterns already proven individually — plus planted
    # per-stage offenders in tests/test_pipeline.py.
    # Round-8 (verdict #5): BOTH engines run the funnel over the
    # deterministic doc_id % 10 == 0 slice, so the composed pipeline is
    # value-checkable at EVERY sweep tier — the exact single-node
    # replica materializes the n=2..10 string-gram CTEs and spilled
    # >90 GB of DuckDB temp at sf1 over the full corpus; the slice at
    # sf1 is the same workload size as the full sf0.1 corpus, which
    # completes. (At sf1 the slice keeps the adversarial twin structure:
    # the id shift is a multiple of 10, so every copy of a selected doc
    # is selected.) The bench times the FULL-corpus production funnel
    # via BENCH_OVERRIDES, same split as dedup_minhash_lsh.
    None,
    local_oracle=_clean_pipeline_oracle(),
    doc="End-to-end corpus cleaning DAG: Gopher quality gate -> exact "
    "dedup -> minhash near-dup clusters -> canonical filter -> "
    "substring-span removal, reported as a one-row funnel "
    "(operators/pipeline.py:clean_corpus_report). Cheap per-doc "
    "filters run first so cross-doc stages see a shrunk corpus. Gate "
    "runs the doc_id % 10 slice (oracle-tractable at 10x); bench runs "
    "the full corpus.",
)
def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.pipeline import STRUCTURAL_RULES, clean_corpus_report

    doc = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    return clean_corpus_report(doc, quality_rules=STRUCTURAL_RULES, min_words=5)


@query(
    "contamination_bloom",
    None,
    # Rows-only IN THE DRIVER GATE (window full); the filter is
    # probabilistic vs TRUTH but fully DETERMINISTIC in computation, so
    # it is hash-checked locally via local_oracle below — the exact bit
    # positions rebuilt with the spark_xxhash64_words/_int replicas
    # (a corpus shingle "hits" iff ALL 4 of its positions are in the
    # probe-set position set) — plus no-false-negative / FP-bound
    # properties in tests/test_bloom.py.
    local_oracle="""
    WITH w AS (
        SELECT doc_id AS doc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc,
               unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
                      i -> spark_xxhash64_words(ws[i:i+4]))) AS sid
        FROM w
    ),
    probe_pos AS (
        SELECT DISTINCT
               ((spark_xxhash64_int(sid, j) % 1048576) + 1048576) % 1048576 AS p
        FROM (SELECT DISTINCT sid FROM sh WHERE doc < 20),
             unnest([0, 1, 2, 3]) AS u(j)
    ),
    corpus_pos AS (
        SELECT doc, sid, rn, j,
               ((spark_xxhash64_int(sid, j) % 1048576) + 1048576) % 1048576 AS p
        FROM (SELECT doc, sid, row_number() OVER () AS rn FROM sh),
             unnest([0, 1, 2, 3]) AS u(j)
    ),
    hits AS (
        SELECT doc, rn FROM corpus_pos c JOIN probe_pos b ON c.p = b.p
        GROUP BY doc, rn HAVING count(DISTINCT j) = 4
    )
    SELECT doc, count(*) AS n_hits FROM hits GROUP BY doc ORDER BY doc
    """,
    doc="Bloom-filter benchmark decontamination: probe shingles folded "
    "into a 2^20-bit filter (128 KB broadcast regardless of probe "
    "size), corpus membership test as native bit arithmetic inside "
    "codegen — zero corpus shuffle before the per-doc count. Superset "
    "of the exact contamination_check by construction "
    "(operators/dedup.py:bloom_contamination_check).",
)
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probes = doc.where(F.col("doc_id") < 20)
    bits = dd.shingle_bloom_bits(probes, n=5, n_bits=1 << 20)
    return dd.bloom_contamination_check(doc, bits, n=5).orderBy("doc")


@query(
    "dsir_resample",
    None,
    # Rows-only IN THE DRIVER GATE (window full); the seeded Gumbel
    # selection is fully DETERMINISTIC, so it is hash-checked locally
    # via local_oracle below (bucket distributions, log-ratios, scores,
    # Gumbel keys and the top-k all rebuilt in DuckDB over the
    # spark_xxhash64 replicas; scores rounded to 1e-6, far above
    # cross-engine float-sum-order noise), plus a Python recompute in
    # tests/test_dsir.py.
    local_oracle="""
    WITH w AS (
        SELECT doc_id AS doc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    g AS (
        SELECT doc,
               unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                      i -> ((spark_xxhash64_words(ws[i:i+1]) % 4096) + 4096) % 4096))
                   AS bucket
        FROM w
    ),
    tcnt AS (SELECT bucket, count(*) AS c FROM g WHERE doc < 50 GROUP BY bucket),
    rcnt AS (SELECT bucket, count(*) AS c FROM g GROUP BY bucket),
    ttot AS (SELECT 4096 + coalesce(sum(c), 0) AS t FROM tcnt),
    rtot AS (SELECT 4096 + coalesce(sum(c), 0) AS t FROM rcnt),
    lr AS (
        SELECT b.b AS bucket,
               ln((1.0 + coalesce(tc.c, 0)) / (SELECT t FROM ttot))
             - ln((1.0 + coalesce(rc.c, 0)) / (SELECT t FROM rtot)) AS logratio
        FROM (SELECT unnest(range(0, 4096)) AS b) b
        LEFT JOIN tcnt tc ON tc.bucket = b.b
        LEFT JOIN rcnt rc ON rc.bucket = b.b
    ),
    scores AS (
        SELECT w.doc, coalesce(s.score, 0.0) AS score
        FROM w LEFT JOIN (
            SELECT g.doc, sum(lr.logratio) AS score
            FROM g JOIN lr USING (bucket) GROUP BY g.doc
        ) s ON s.doc = w.doc
    ),
    keyed AS (
        SELECT doc, score,
               score + (-ln(-ln(
                   (((spark_xxhash64_int(doc, 42) % 4503599627370496)
                     + 4503599627370496) % 4503599627370496 + 0.5)
                   / 4503599627370496.0))) AS k
        FROM scores
    ),
    kept AS (SELECT doc, score FROM keyed ORDER BY k DESC, doc LIMIT 200)
    SELECT doc AS doc_id, floor(score * 1e6 + 0.5) / 1e6 AS score
    FROM kept ORDER BY doc_id
    """,
    doc="DSIR importance resampling (Xie et al. 2023): hashed-2-gram "
    "bucket log-likelihood ratios target-vs-raw, per-doc score via a "
    "broadcast (bucket, logratio) join + per-doc sum, deterministic "
    "Gumbel-top-k selection ∝ exp(score). Distributions are bounded "
    "n_buckets-row collects; nothing quadratic "
    "(operators/sampling.py:dsir_resample).",
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import dsir_resample

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = doc.where(F.col("doc_id") < 50)
    return (
        dsir_resample(doc, target, k=200, n_buckets=4096, seed=42)
        .select("doc_id", dround("score", 6).alias("score"))
        .orderBy("doc_id")
    )


@query(
    "semantic_dedup",
    # Rows-only in the driver gate (window full); the k=1 configuration
    # is proved equal to exact all-pairs cosine in
    # tests/test_clustering.py (the IVF-style equivalence anchor), and
    # planted-duplicate removal is value-checked there too.
    None,
    doc="SemDeDup (Abbas et al. 2023): kmeans-blocked within-cluster "
    "cosine pairs -> connected components -> keep min-id "
    "representative. Cluster id is the blocking key (one equi-join "
    "shuffle; the cross product never materializes); k auto-scales "
    "with corpus size (k ≈ n/256) and hot clusters split into "
    "hash-salted sub-blocks, so per-task pair cost stays bounded at "
    "100×; scoring is flattened per-dimension codegen arithmetic "
    "(operators/clustering.py:semantic_dedup).",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.clustering import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    # dim passed through → no dimension-probe job; k=None → auto-scale
    return semantic_dedup(emb, threshold=0.9, dim=64).select("vec_id").orderBy("vec_id")


@query(
    "gopher_quality",
    # Rows-only IN THE DRIVER GATE (the 50-entry window is full of
    # hash-matched rows); hash-checked locally via local_oracle below —
    # an independent DuckDB replica of EVERY stat, threshold, and the
    # ordered failed_rules list — plus a brute-force Python reference
    # in tests/test_quality.py.
    None,
    local_oracle="""
    WITH d AS (
        SELECT doc_id AS doc, text, CAST(length(text) AS BIGINT) AS tc FROM documents
    ),
    base AS (
        SELECT doc, text, tc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws,
               list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
               list_filter(string_split_regex(text, '\\n\\s*\\n'), x -> trim(x) <> '') AS paras
        FROM d
    ),
    stats AS (
        SELECT doc, tc, ws,
            CAST(len(ws) AS INT) AS n_words,
            CASE WHEN len(ws) > 0
                 THEN coalesce(list_sum(list_transform(ws, x -> length(x))), 0) / len(ws)
                 ELSE 0.0 END AS mean_word_len,
            CASE WHEN len(ws) > 0
                 THEN (len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '\\.\\.\\.|…'))) / len(ws)
                 ELSE 0.0 END AS symbol_word_ratio,
            CASE WHEN len(lines) > 0
                 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•●▪]'))) / len(lines)
                 ELSE 0.0 END AS bullet_line_frac,
            CASE WHEN len(lines) > 0
                 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) / len(lines)
                 ELSE 0.0 END AS ellipsis_line_frac,
            CASE WHEN len(ws) > 0
                 THEN len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) / len(ws)
                 ELSE 0.0 END AS alpha_word_frac,
            CAST(
                (CASE WHEN regexp_matches(lower(text), '\\bthe\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bbe\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bto\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bof\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\band\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bthat\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bhave\\b') THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(lower(text), '\\bwith\\b') THEN 1 ELSE 0 END)
              AS INT) AS stop_word_hits,
            CASE WHEN len(lines) > 0
                 THEN (len(lines) - len(list_distinct(lines))) / len(lines)
                 ELSE 0.0 END AS line_dup_frac,
            CASE WHEN coalesce(list_sum(list_transform(lines, s -> length(s))), 0) > 0
                 THEN (list_sum(list_transform(lines, s -> length(s)))
                       - list_sum(list_transform(list_distinct(lines), s -> length(s))))
                      / list_sum(list_transform(lines, s -> length(s)))
                 ELSE 0.0 END AS line_dup_char_frac,
            CASE WHEN len(paras) > 0
                 THEN (len(paras) - len(list_distinct(paras))) / len(paras)
                 ELSE 0.0 END AS para_dup_frac,
            CASE WHEN coalesce(list_sum(list_transform(paras, s -> length(s))), 0) > 0
                 THEN (list_sum(list_transform(paras, s -> length(s)))
                       - list_sum(list_transform(list_distinct(paras), s -> length(s))))
                      / list_sum(list_transform(paras, s -> length(s)))
                 ELSE 0.0 END AS para_dup_char_frac
        FROM base
    ),
    gr AS (
        SELECT doc, 2 AS n, unnest(list_transform(range(1, greatest(len(ws)-1,0)+1),
               i -> array_to_string(ws[i:i+1], ' '))) AS g FROM base
        UNION ALL SELECT doc, 3, unnest(list_transform(range(1, greatest(len(ws)-2,0)+1),
               i -> array_to_string(ws[i:i+2], ' '))) FROM base
        UNION ALL SELECT doc, 4, unnest(list_transform(range(1, greatest(len(ws)-3,0)+1),
               i -> array_to_string(ws[i:i+3], ' '))) FROM base
        UNION ALL SELECT doc, 5, unnest(list_transform(range(1, greatest(len(ws)-4,0)+1),
               i -> array_to_string(ws[i:i+4], ' '))) FROM base
        UNION ALL SELECT doc, 6, unnest(list_transform(range(1, greatest(len(ws)-5,0)+1),
               i -> array_to_string(ws[i:i+5], ' '))) FROM base
        UNION ALL SELECT doc, 7, unnest(list_transform(range(1, greatest(len(ws)-6,0)+1),
               i -> array_to_string(ws[i:i+6], ' '))) FROM base
        UNION ALL SELECT doc, 8, unnest(list_transform(range(1, greatest(len(ws)-7,0)+1),
               i -> array_to_string(ws[i:i+7], ' '))) FROM base
        UNION ALL SELECT doc, 9, unnest(list_transform(range(1, greatest(len(ws)-8,0)+1),
               i -> array_to_string(ws[i:i+8], ' '))) FROM base
        UNION ALL SELECT doc, 10, unnest(list_transform(range(1, greatest(len(ws)-9,0)+1),
               i -> array_to_string(ws[i:i+9], ' '))) FROM base
    ),
    cnts AS (SELECT doc, n, g, count(*) AS c FROM gr GROUP BY doc, n, g),
    tops AS (
        SELECT doc, n, c * length(g) AS prod,
               row_number() OVER (PARTITION BY doc, n
                                  ORDER BY c DESC, length(g) DESC) AS rn
        FROM cnts WHERE c > 1 AND n IN (2, 3, 4)
    ),
    dups AS (
        SELECT doc, n, sum(c * length(g)) AS prod
        FROM cnts WHERE c > 1 AND n >= 5 GROUP BY doc, n
    ),
    ng AS (
        SELECT s.doc,
            least(1.0, coalesce((SELECT t2.prod FROM tops t2
                WHERE t2.doc = s.doc AND t2.n = 2 AND t2.rn = 1) / s.tc, 0.0)) AS top_2gram_char_frac,
            least(1.0, coalesce((SELECT t3.prod FROM tops t3
                WHERE t3.doc = s.doc AND t3.n = 3 AND t3.rn = 1) / s.tc, 0.0)) AS top_3gram_char_frac,
            least(1.0, coalesce((SELECT t4.prod FROM tops t4
                WHERE t4.doc = s.doc AND t4.n = 4 AND t4.rn = 1) / s.tc, 0.0)) AS top_4gram_char_frac,
            least(1.0, coalesce((SELECT d5.prod FROM dups d5
                WHERE d5.doc = s.doc AND d5.n = 5) / s.tc, 0.0)) AS dup_5gram_char_frac,
            least(1.0, coalesce((SELECT d6.prod FROM dups d6
                WHERE d6.doc = s.doc AND d6.n = 6) / s.tc, 0.0)) AS dup_6gram_char_frac,
            least(1.0, coalesce((SELECT d7.prod FROM dups d7
                WHERE d7.doc = s.doc AND d7.n = 7) / s.tc, 0.0)) AS dup_7gram_char_frac,
            least(1.0, coalesce((SELECT d8.prod FROM dups d8
                WHERE d8.doc = s.doc AND d8.n = 8) / s.tc, 0.0)) AS dup_8gram_char_frac,
            least(1.0, coalesce((SELECT d9.prod FROM dups d9
                WHERE d9.doc = s.doc AND d9.n = 9) / s.tc, 0.0)) AS dup_9gram_char_frac,
            least(1.0, coalesce((SELECT d10.prod FROM dups d10
                WHERE d10.doc = s.doc AND d10.n = 10) / s.tc, 0.0)) AS dup_10gram_char_frac
        FROM stats s
    ),
    full_t AS (
        SELECT s.doc, s.n_words, s.mean_word_len, s.symbol_word_ratio,
               s.bullet_line_frac, s.ellipsis_line_frac, s.alpha_word_frac,
               s.stop_word_hits, s.line_dup_frac, s.line_dup_char_frac,
               s.para_dup_frac, s.para_dup_char_frac, g.* EXCLUDE (doc)
        FROM stats s JOIN ng g ON s.doc = g.doc
    ),
    ruled AS (
        SELECT *, list_filter([
            CASE WHEN NOT (n_words >= 50 AND n_words <= 100000) THEN 'word_count' END,
            CASE WHEN NOT (mean_word_len >= 3.0 AND mean_word_len <= 10.0) THEN 'mean_word_length' END,
            CASE WHEN NOT (symbol_word_ratio <= 0.1) THEN 'symbol_word_ratio' END,
            CASE WHEN NOT (bullet_line_frac <= 0.9) THEN 'bullet_lines' END,
            CASE WHEN NOT (ellipsis_line_frac <= 0.3) THEN 'ellipsis_lines' END,
            CASE WHEN NOT (alpha_word_frac >= 0.8) THEN 'alpha_words' END,
            CASE WHEN NOT (stop_word_hits >= 2) THEN 'stop_words' END,
            CASE WHEN NOT (line_dup_frac <= 0.30) THEN 'dup_line_frac' END,
            CASE WHEN NOT (para_dup_frac <= 0.30) THEN 'dup_para_frac' END,
            CASE WHEN NOT (line_dup_char_frac <= 0.20) THEN 'dup_line_char_frac' END,
            CASE WHEN NOT (para_dup_char_frac <= 0.20) THEN 'dup_para_char_frac' END,
            CASE WHEN NOT (top_2gram_char_frac <= 0.20) THEN 'top_2gram' END,
            CASE WHEN NOT (top_3gram_char_frac <= 0.18) THEN 'top_3gram' END,
            CASE WHEN NOT (top_4gram_char_frac <= 0.16) THEN 'top_4gram' END,
            CASE WHEN NOT (dup_5gram_char_frac <= 0.15) THEN 'dup_5gram' END,
            CASE WHEN NOT (dup_6gram_char_frac <= 0.14) THEN 'dup_6gram' END,
            CASE WHEN NOT (dup_7gram_char_frac <= 0.13) THEN 'dup_7gram' END,
            CASE WHEN NOT (dup_8gram_char_frac <= 0.12) THEN 'dup_8gram' END,
            CASE WHEN NOT (dup_9gram_char_frac <= 0.11) THEN 'dup_9gram' END,
            CASE WHEN NOT (dup_10gram_char_frac <= 0.10) THEN 'dup_10gram' END
        ], x -> x IS NOT NULL) AS failed_rules
        FROM full_t
    )
    SELECT *, len(failed_rules) = 0 AS keep FROM ruled ORDER BY doc
    """,
    doc="Gopher-style quality gate (Rae et al. 2021 Appendix A): "
    "duplicate line/paragraph fractions, top/dup n-gram char "
    "fractions, shape heuristics, composite keep decision with "
    "per-rule failure list. In-row stats ride the scan (zero "
    "shuffle); n-gram stats shuffle 8-byte xxhash64 gram ids only "
    "(operators/quality.py).",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.quality import gopher_filters

    doc = load_table(spark, sf_dir, "documents")
    return gopher_filters(doc).orderBy("doc")


@query(
    "ann_ivfpq_topk",
    # Gate window full → LOCAL oracle (round-7 verdict #6). The gate
    # runs the pytest-proven LOSSLESS parity configuration, the same
    # trick ann_ivf_topk uses at nprobe=n_lists: corpus capped at
    # vec_id < 4096 (≤ the training sample, so Lloyd's saturates —
    # every residual subvector is its own codeword and encoding is
    # exact; the cap keeps saturation true at EVERY sweep tier, sf1's
    # 20k-row table included), ksub=4096, nprobe=n_lists ⇒ the ADC
    # shortlist is the exact inner-product ranking, and the refine
    # stage re-scores it with the native zip_with/aggregate dot fold —
    # bit-identical to the oracle's left-assoc list_reduce. The whole
    # IVF-PQ machinery (coarse train, residual codebooks, encode, probe
    # join, ADC, refine) is thus hash-checked cross-engine; the lossy
    # production shape (m=8, ksub=16, nprobe<n_lists) keeps its recall
    # anchors in tests/test_pq.py.
    None,
    local_oracle="""
    WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4096),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM c WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, c.vec_id,
               list_reduce(
                   list_transform(range(1, len(c.embedding) + 1),
                                  i -> c.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE),
                   (acc, v) -> acc + v) AS score
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, floor(score * 1e6 + 0.5) / 1e6 AS score, rank
    FROM ranked WHERE rank <= 10
    """,
    doc="ANN at the 100 TB price point: IVF-PQ (Jégou et al. 2011 / "
    "faiss IVFPQ) — coarse lists + m×1-byte product codes (32× smaller "
    "scored payload), ADC table-lookup scoring, exact re-rank of the "
    "4k shortlist (IndexRefineFlat pattern). operators/pq.py. Gate "
    "config = the lossless parity regime (see oracle note); production "
    "lossy config benched/tested separately.",
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 4096)
    queries_df = emb.where(F.col("vec_id") < 8)
    return ivfpq_topk(
        emb, queries_df, "vec_id", "embedding",
        k=10, n_lists=8, nprobe=8, m=8, ksub=4096, dim=64, refine_factor=4,
    ).withColumn("score", dround("score", 6)).orderBy("query_id", "rank")



def _waterfill_ctes(target: float, rounds: int = 8) -> str:
    """DuckDB CTE chain replicating operators/sampling.temperature_weights
    (T=2) over documents.lang: ``rounds`` unrolled saturation rounds
    (each round saturates >=1 domain or reaches the fixed point, so
    rounds >= |domains|+1 suffices — the ``chk`` CTE raises a NAMED
    error if a fixture ever grows past that, instead of silently
    under-iterating); every CTE is MATERIALIZED because inlining would
    re-expand the chain exponentially. Ends with CTE ``p`` = (lang,
    keep probability).

    Float parity with the Python fold: the ``z`` sums carry ``ORDER BY
    lang`` so the pow() terms accumulate in exactly the sorted-domain
    order temperature_weights uses (unordered summation could differ by
    ULPs and flip a hash-draw sitting on a keep boundary). The budget
    ``b`` needs no ordering: counts are integer-valued doubles, so its
    sums/subtractions are exact in any order."""
    out = [
        "cnt AS MATERIALIZED (SELECT lang, CAST(count(*) AS DOUBLE) AS c "
        "FROM documents GROUP BY lang)",
        f"chk AS MATERIALIZED (SELECT CASE WHEN count(*) + 1 > {rounds} "
        f"THEN error('_waterfill_ctes: rounds={rounds} < |domains|+1 = ' "
        f"|| CAST(count(*) + 1 AS VARCHAR) || ' — raise rounds') "
        f"ELSE 1 END AS ok FROM cnt)",
        "r0 AS MATERIALIZED (SELECT lang, c, FALSE AS sat FROM cnt "
        "WHERE (SELECT ok FROM chk) = 1)",
    ]
    for k in range(rounds):
        out.append(
            f"s{k} AS MATERIALIZED (SELECT {target} - coalesce(sum(c) "
            f"FILTER (WHERE sat), 0.0) AS b, coalesce(sum(pow(c, 0.5) "
            f"ORDER BY lang) FILTER (WHERE NOT sat), 0.0) AS z FROM r{k})"
        )
        out.append(
            f"r{k + 1} AS MATERIALIZED (SELECT lang, c, sat OR "
            f"((SELECT b FROM s{k}) > 1e-12 AND (SELECT b FROM s{k}) "
            f"* pow(c, 0.5) / (SELECT z FROM s{k}) >= c) AS sat FROM r{k})"
        )
    out.append(
        f"s{rounds} AS MATERIALIZED (SELECT {target} - coalesce(sum(c) "
        f"FILTER (WHERE sat), 0.0) AS b, coalesce(sum(pow(c, 0.5) "
        f"ORDER BY lang) FILTER (WHERE NOT sat), 0.0) AS z FROM r{rounds})"
    )
    out.append(
        f"p AS MATERIALIZED (SELECT lang, CASE WHEN sat THEN 1.0 "
        f"WHEN (SELECT b FROM s{rounds}) <= 1e-12 THEN 0.0 "
        f"ELSE (SELECT b FROM s{rounds}) * pow(c, 0.5) "
        f"/ (SELECT z FROM s{rounds}) / c END AS p FROM r{rounds})"
    )
    return ",\n    ".join(out)


@query(
    "temperature_mix",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below -- the waterfilling replicated by
    # _waterfill_ctes and the row draw via the spark_xxhash64_chain
    # replica of xxhash64(struct(doc_id, lang), 42) -- plus the math
    # pinned in tests/test_temperature_mix.py.
    None,
    local_oracle=f"""
    WITH {_waterfill_ctes(200.0)}
    SELECT d.doc_id, d.lang
    FROM documents d JOIN p USING (lang)
    WHERE ((spark_xxhash64_chain([
                'l:' || CAST(d.doc_id AS VARCHAR), 's:' || d.lang, 'i:42'
            ]) % 4294967296) + 4294967296) % 4294967296
          / 4294967296.0 < p.p
    ORDER BY d.doc_id
    """,
    doc="Temperature-sampled domain mixture (T5 §3.4.3 / XLM-R): keep "
    "domain d with p ∝ count_d^(1/T) waterfilled to a target total, "
    "decided by a seeded row hash — deterministic, zero-shuffle "
    "scan-attached filter (operators/sampling.py).",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import temperature_mix

    doc = load_table(spark, sf_dir, "documents")
    return (
        temperature_mix(doc.select("doc_id", "lang"), "lang",
                        target_total=200, temperature=2.0)
        .orderBy("doc_id")
    )


@query(
    "nb_classify",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — an independent DuckDB NB over STRING
    # feature keys (the collision-free twin of the engine's hashed
    # fids) — plus exact log-score equality vs a Python Counter
    # reference in tests/test_classifier.py.
    None,
    local_oracle="""
    WITH d AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
    w AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS ws
        FROM d
    ),
    feats AS (
        SELECT doc_id, lang, unnest(ws) AS fid FROM w
        UNION ALL
        SELECT doc_id, lang,
               unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                     i -> ws[i] || chr(1) || ws[i+1])) AS fid
        FROM w
    ),
    cnt AS (SELECT lang AS lbl, fid, count(*) AS c FROM feats GROUP BY lbl, fid),
    keepf AS (SELECT fid FROM cnt GROUP BY fid HAVING sum(c) >= 2),
    pruned AS (SELECT cnt.* FROM cnt JOIN keepf USING (fid)),
    tot AS (SELECT lbl, sum(c) AS t FROM pruned GROUP BY lbl),
    vocab AS (SELECT count(DISTINCT fid) AS v FROM pruned),
    labels AS (SELECT lang AS lbl, count(*) AS nd FROM documents GROUP BY lang),
    consts AS (
        SELECT l.lbl,
               ln(l.nd / (SELECT CAST(sum(nd) AS DOUBLE) FROM labels)) AS prior,
               ln(1.0 / (coalesce(t.t, 0) + (SELECT v FROM vocab) + 1)) AS oov,
               CAST(coalesce(t.t, 0) + (SELECT v FROM vocab) + 1 AS DOUBLE) AS denom
        FROM labels l LEFT JOIN tot t ON l.lbl = t.lbl
    ),
    nf AS (SELECT doc_id, count(*) AS n_feats FROM feats GROUP BY doc_id),
    matched AS (
        SELECT f.doc_id, p.lbl,
               sum(ln((p.c + 1) / co.denom) - co.oov) AS delta
        FROM feats f JOIN pruned p USING (fid) JOIN consts co ON co.lbl = p.lbl
        GROUP BY f.doc_id, p.lbl
    ),
    scored AS (
        SELECT n.doc_id, co.lbl,
               co.prior + n.n_feats * co.oov + coalesce(m.delta, 0.0) AS score
        FROM nf n CROSS JOIN consts co
        LEFT JOIN matched m ON m.doc_id = n.doc_id AND m.lbl = co.lbl
    ),
    pick AS (
        SELECT doc_id, lbl AS label,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lbl ASC) AS rn
        FROM scored
    ),
    empties AS (
        SELECT d2.doc_id,
               (SELECT lbl FROM consts ORDER BY prior DESC, lbl ASC LIMIT 1) AS label
        FROM documents d2 LEFT JOIN nf ON d2.doc_id = nf.doc_id
        WHERE nf.doc_id IS NULL
    )
    SELECT doc_id, label FROM pick WHERE rn = 1
    UNION ALL SELECT doc_id, label FROM empties
    ORDER BY doc_id
    """,
    doc="fastText-shaped corpus classifier (Joulin et al. 2017) as "
    "closed-form hashed-n-gram Naive Bayes: train = ONE map-side-combined "
    "counting pass over (label, 8-byte fid), score = one AQE-broadcastable "
    "model join + native array-sum argmax. The quality/domain/language "
    "filter stage of LLM data recipes (operators/classifier.py).",
)
def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.classifier import naive_bayes_predict, naive_bayes_train

    doc = load_table(spark, sf_dir, "documents")
    model = naive_bayes_train(doc, "lang", min_count=2)
    return (
        naive_bayes_predict(doc, model)
        .select("doc_id", "label")
        .orderBy("doc_id")
    )


@query(
    "lm_perplexity",
    # Rows-only IN THE DRIVER GATE (the 50-entry window is full of
    # hash-matched rows); hash-checked locally via local_oracle below
    # (string-keyed grams — the collision-free twin of the hashed-id
    # model), plus a pure-Python Counter+log reference in
    # tests/test_lm.py.
    None,
    local_oracle="""
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
    w AS (
        SELECT doc_id,
               list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS ws
        FROM d
    ),
    tok AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos,
               unnest(ws) AS word,
               unnest(list_transform(range(1, len(ws) + 1),
                      i -> CASE WHEN i > 1 THEN ws[i-1] || chr(1) || ws[i] END)) AS prev_bi
        FROM w
    ),
    uni AS (SELECT word, count(*) AS c1 FROM tok GROUP BY word),
    nv AS (SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni),
    bi AS (
        SELECT t2.prev_bi AS big, count(*) AS c2,
               string_split(t2.prev_bi, chr(1))[1] AS ctx
        FROM tok t2 WHERE t2.prev_bi IS NOT NULL
        GROUP BY t2.prev_bi HAVING count(*) >= 2
    ),
    bigr AS (
        SELECT b.big, ln(b.c2 / CAST(u.c1 AS DOUBLE)) AS log_cond
        FROM bi b JOIN uni u ON u.word = b.ctx
    ),
    scored AS (
        SELECT t.doc_id,
               CASE WHEN t.prev_bi IS NULL
                    THEN ln((u.c1 + 1) / ((SELECT n FROM nv) + (SELECT v FROM nv) + 1))
                    ELSE coalesce(
                        bg.log_cond,
                        ln(0.4) + ln((u.c1 + 1) /
                                     ((SELECT n FROM nv) + (SELECT v FROM nv) + 1)))
               END AS lp
        FROM tok t
        JOIN uni u ON u.word = t.word
        LEFT JOIN bigr bg ON bg.big = t.prev_bi
    )
    SELECT doc_id, count(*) AS n_tokens,
           floor(exp(-avg(lp)) * 1e6 + 0.5) / 1e6 AS perplexity
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="CCNet-style LM quality scoring (Wenzek et al. 2020): bigram "
    "stupid-backoff LM (Brants et al. 2007) trained on the corpus, every "
    "document scored with its perplexity. All counting/joining on 8-byte "
    "xxhash64 gram ids; the min_count-pruned model auto-broadcasts under "
    "AQE (operators/lm.py).",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.lm import lm_score, ngram_lm_train

    doc = load_table(spark, sf_dir, "documents")
    lm = ngram_lm_train(doc, min_count=2)
    return (
        lm_score(doc, lm)
        .select("doc_id", "n_tokens", dround("perplexity", 6).alias("perplexity"))
        .orderBy("doc_id")
    )


@query(
    "image_phash_dedup",
    # Rows-only in the driver gate (binary media decode is not
    # SQL-expressible); full pair-set equality vs an all-pairs Python
    # hamming reference is pinned in tests/test_phash.py.
    None,
    doc="Perceptual image near-dedup (Zauner 2010 aHash/dHash/pHash): "
    "one Arrow-batched map stage turns each image payload into an 8-byte "
    "dHash (payloads never shuffle), then the simhash banding story with "
    "an EXACT pigeonhole recall guarantee — bands = max_hamming+1 bit "
    "segments, posting-list in-row pair expansion with the dedup "
    "family's hot-bucket cap, native bit_count(xor) verify on candidates "
    "only (operators/phash.py). The image counterpart of text "
    "MinHash/SimHash in the training-data pipeline.",
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators import multimodal as mm
    from pixie_spark.operators.phash import image_dedup_pairs

    media = mm.synthetic_media(spark, n=300)
    return (
        image_dedup_pairs(media, method="dhash", max_hamming=8)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "rollup_cascade",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — each cascaded level against direct
    # aggregation from raw in DuckDB. The registered query runs the
    # exact_distinct parity mode (mergeable value-set partials, the
    # quantiles gate-row convention); production keeps the HLL sketch
    # path, which the bench times via BENCH_OVERRIDES.
    None,
    local_oracle="""
    WITH ev AS (
        SELECT epoch_us(ts) * 1000 AS t, event_type, value, user_id FROM events
    ),
    lv AS (SELECT l FROM (VALUES (60), (600), (3600)) AS levels(l)),
    agg AS (
        SELECT l AS level_width_s, event_type,
               (t // (CAST(l AS BIGINT) * 1000000000))
                   * (CAST(l AS BIGINT) * 1000000000) AS bucket_ts,
               count(value) AS n,
               sum(value) AS sum_raw,
               min(value) AS min_v,
               max(value) AS max_v,
               count(DISTINCT user_id) AS approx_distinct
        FROM ev CROSS JOIN lv
        GROUP BY 1, 2, 3
    )
    SELECT level_width_s, event_type, bucket_ts, n,
           floor(sum_raw * 1e4 + 0.5) / 1e4 AS sum_v,
           min_v, max_v,
           floor(((floor(sum_raw * 1e4 + 0.5) / 1e4) / n) * 1e6 + 0.5) / 1e6
               AS avg_v,
           approx_distinct
    FROM agg
    ORDER BY level_width_s, event_type, bucket_ts
    """,
    doc="Multi-resolution rollup cascade (TimescaleDB continuous "
    "aggregates / Druid rollup): raw events are scanned ONCE into 1m "
    "(count,sum,min,max) partials, then 10m and 1h levels merge the "
    "finer level's partials — the reference's partial/finalize UDA "
    "decomposition (plan.proto:244-266) reused across materialization "
    "boundaries. Cascaded levels are EXACTLY equal to direct "
    "aggregation from raw (operators/rollup.py).",
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.rollup import cascade_long, rollup_cascade

    ev = load_table(spark, sf_dir, "events")
    widths = [60 * 10**9, 600 * 10**9, 3600 * 10**9]
    levels = rollup_cascade(
        ev, "ts", "value", ["event_type"], widths,
        distinct_col="user_id", exact_distinct=True,
    )
    # avg_v is derived from the ROUNDED sum (not the raw partials): the
    # cascaded sum and DuckDB's direct sum can differ in the last bit,
    # and a true mean sitting exactly on a .5e-6 boundary (measured at
    # sf0.1: 1461.11/32 = 45.6596875) flips the rounded digit. Dividing
    # the already-hash-matched rounded sum makes the quotient bits
    # identical in both engines, so the final rounding can't diverge.
    return (
        cascade_long(levels, ["event_type"])
        .select(
            "level_width_s", "event_type", "bucket_ts", "n",
            dround("sum_v", 4).alias("sum_v"), "min_v", "max_v",
            dround(dround("sum_v", 4) / F.col("n"), 6).alias("avg_v"),
            "approx_distinct",
        )
        .orderBy("level_width_s", "event_type", "bucket_ts")
    )


@query(
    "web_url_pipeline",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below (independent normalization: the synthetic
    # URLs canonicalize to https://{source}.com/p/{id%40}?id={id%7} —
    # www. stripped, utm_source dropped), plus a Python urllib
    # reference in tests/test_web.py.
    None,
    local_oracle="""
    WITH u AS (
        SELECT doc_id,
               source || '.com' AS domain,
               'https://' || source || '.com/p/' || CAST(doc_id % 40 AS VARCHAR)
                   || '?id=' || CAST(doc_id % 7 AS VARCHAR) AS url_norm
        FROM documents
    ),
    kept AS (SELECT * FROM u WHERE domain NOT IN ('src0.com', 'src13.com')),
    dedup AS (SELECT domain, url_norm FROM kept GROUP BY domain, url_norm)
    SELECT domain, count(*) AS n_urls FROM dedup GROUP BY domain ORDER BY domain
    """,
    doc="Web-crawl URL front end (C4/RefinedWeb recipe stage 0): "
    "normalize (tracking-param strip, canonical host/port/path) → "
    "registrable-domain blocklist (broadcast anti-join) → URL-exact "
    "dedup → per-domain survivor counts. All native Column expressions "
    "(try_parse_url + higher-order array functions) — a zero-shuffle "
    "codegen'd scan filter until the final dedup/count "
    "(operators/web.py). URLs derive deterministically from the "
    "documents table (the fixtures carry no URL column).",
)
def q_web_url_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators import web

    doc = load_table(spark, sf_dir, "documents")
    urls = doc.select(
        "doc_id",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".com/p/"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit("?utm_source=feed&id="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    block = spark.createDataFrame([("src0.com",), ("src13.com",)], ["domain"])
    kept = web.url_dedup(web.blocklist_filter(urls, block))
    return (
        kept.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("domain")
    )


@query(
    "warc_ingest_pipeline",
    # Rows-only (binary-archive source is not SQL-expressible); the
    # parser/bridge are pinned by roundtrip + golden-text tests in
    # tests/test_warc.py.
    None,
    doc="Crawl-archive ingestion (ISO 28500 WARC/WET, the Common Crawl "
    "interchange format): binaryFile → from-scratch record parser in an "
    "Arrow-batched kernel → documents-shaped bridge (http-header strip "
    "+ native tag-strip for response records, passthrough for WET "
    "conversion records) → URL featurization + quality score "
    "(sources/warc.py). The fixture archive is synthesized from the "
    "documents table (bounded 100-doc collect, demo-only — production "
    "reads real .warc.gz paths with one task per archive).",
)
def q_warc_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pixie_spark.operators import web
    from pixie_spark.operators.text import quality_score
    from pixie_spark.sources.warc import build_warc_bytes, read_warc, warc_documents

    src = [
        (r.doc_id, r.text)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(100)
        .collect()
    ]
    records = [
        {
            "warc_type": "conversion",
            "target_uri": f"https://doc{i % 10}.example.org/d/{i}",
            "record_id": f"<urn:uuid:doc-{i}>",
            "content_type": "text/plain",
            "payload": text.encode(),
        }
        for i, text in src
    ]
    d = tempfile.mkdtemp(prefix="warc_demo_")
    with open(os.path.join(d, "demo.warc"), "wb") as f:
        f.write(build_warc_bytes(records))
    docs = warc_documents(read_warc(spark, d))
    feats = web.url_features(docs).withColumn("q", quality_score(F.col("text")))
    return (
        feats.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dround(F.avg("q"), 6).alias("avg_quality"),
        )
        .orderBy("host")
    )


@query(
    "dedup_incremental",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — the ENTIRE MinHash-LSH pipeline replayed
    # independently in DuckDB (shingle sids via spark_xxhash64_words,
    # the 64 minwise mixes via the spark_minhash_mix64 replica of
    # _minhash_mix's XOR-rotate double hashing, band buckets via
    # spark_xxhash64_longs over signature slices, then the new-vs-old /
    # new-vs-new candidate joins and the agreement-fraction verify).
    # Exact slice-equality vs a full rebuild additionally pinned in
    # tests/test_incremental.py. The MAX_POSTING_LIST cap is not
    # replicated: no fixture posting list approaches 2500 docs, and a
    # triggered cap would surface here as a mismatch, not hide.
    None,
    local_oracle=r"""
WITH oldd AS MATERIALIZED (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
),
newd AS MATERIALIZED (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text || ' tail' AS text
    FROM documents WHERE doc_id % 5 <> 0 AND doc_id < 20
),
alldocs AS MATERIALIZED (
    SELECT 'o' AS side, doc_id, text FROM oldd
    UNION ALL
    SELECT 'n' AS side, doc_id, text FROM newd
),
ws AS MATERIALIZED (
    SELECT side, doc_id,
           list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
    FROM alldocs
),
sh AS MATERIALIZED (
    SELECT side, doc_id,
           unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                                 i -> spark_xxhash64_words([ws[i], ws[i+1], ws[i+2]]))) AS sid
    FROM ws
),
mixed AS MATERIALIZED (
    SELECT side, doc_id, spark_minhash_mix64(sid, spark_xxhash64(sid)) AS m FROM sh
),
mrows AS MATERIALIZED (
    SELECT side, doc_id, unnest(m) AS v, generate_subscripts(m, 1) AS i FROM mixed
),
sigs AS MATERIALIZED (
    SELECT side, doc_id, list(v ORDER BY i) AS s
    FROM (SELECT side, doc_id, i, min(v) AS v FROM mrows GROUP BY 1, 2, 3)
    GROUP BY 1, 2
),
entries AS MATERIALIZED (
    SELECT side, doc_id, b,
           spark_xxhash64_longs(s[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]) AS bucket
    FROM sigs CROSS JOIN (SELECT unnest(range(16)) AS b) bands
),
cand AS MATERIALIZED (
    SELECT DISTINCT n.doc_id AS doc_a, o.doc_id AS doc_b
    FROM entries n JOIN entries o ON n.b = o.b AND n.bucket = o.bucket
    WHERE n.side = 'n' AND o.side = 'o'
    UNION
    SELECT DISTINCT n1.doc_id AS doc_a, n2.doc_id AS doc_b
    FROM entries n1 JOIN entries n2 ON n1.b = n2.b AND n1.bucket = n2.bucket
    WHERE n1.side = 'n' AND n2.side = 'n' AND n1.doc_id < n2.doc_id
),
est AS (
    SELECT c.doc_a, c.doc_b,
           len(list_filter(range(1, 65),
                           i -> sa.s[CAST(i AS INT)] = sb.s[CAST(i AS INT)]))
               / 64.0 AS ej
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a AND sa.side = 'n'
    JOIN sigs sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, floor(ej * 1e6 + 0.5) / 1e6 AS est_jaccard
FROM est WHERE ej >= 0.5
ORDER BY doc_a, doc_b
    """,
    doc="Incremental near-dup against a persisted MinHash-LSH index — "
    "the ingestion-loop shape at 100 TB: the new batch's band entries "
    "BROADCAST against the stored corpus index (corpus never shuffles), "
    "new-vs-new via the ordinary posting-list path, signature verify "
    "fetches only candidate-matched signatures; the index update is an "
    "append of the batch's own rows. Deterministic hashing makes the "
    "incremental result EXACTLY the pairs-involving-the-batch slice of "
    "a full rebuild (operators/incremental.py).",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.incremental import build_index, incremental_pairs

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = doc.where(F.col("doc_id") % 5 != 0)
    new = doc.where(F.col("doc_id") % 5 == 0).unionByName(
        old.where(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    oe, os_ = build_index(old, "doc_id", "text")
    ne, ns = build_index(new, "doc_id", "text")
    return (
        incremental_pairs(ne, ns, oe, os_, threshold=0.5)
        .select("doc_a", "doc_b", dround("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "snapshot_diff",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below, plus a plain-Python dict reference in
    # tests/test_diff.py.
    None,
    local_oracle="""
    WITH base AS (SELECT doc_id, text, lang FROM documents),
    old AS (SELECT * FROM base WHERE doc_id % 10 <> 9),
    new AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
               lang
        FROM base WHERE doc_id % 10 <> 0
    ),
    j AS (
        SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.text IS DISTINCT FROM n.text
                         OR o.lang IS DISTINCT FROM n.lang THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT status, count(*) AS n FROM j
    WHERE status <> 'unchanged' GROUP BY status ORDER BY status
    """,
    doc="Snapshot diff between two corpus versions (the QA step after "
    "every recipe change / idempotent replay): both sides reduce "
    "map-side to (key, 8-byte row hash) BEFORE the single full-outer "
    "join, so the shuffle carries ~16 bytes/row regardless of row "
    "width; verdict = added/removed/changed from hash (in)equality "
    "(operators/diff.py).",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.diff import diff_summary, snapshot_diff

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    old = doc.where(F.col("doc_id") % 10 != 9)
    new = doc.where(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    return diff_summary(snapshot_diff(old, new, ["doc_id"])).orderBy("status")


@query(
    "kmeans_coreset",
    None,  # stochastic summarization — rows-only; cost-preservation and
    # q-math are value-checked in tests/test_coreset.py.
    doc="Lightweight coreset (Bachem et al. 2018; ref kernel: "
    "src/carnot/exec/ml/coreset.cc): m weighted points preserving the "
    "k-means cost of the full embedding set. Two map-side-combined "
    "global aggregates + Gumbel-top-m TakeOrderedAndProject; scoring is "
    "one native SQL-string expression. Output: coreset sized vs corpus "
    "with its weight mass (≈ n) and weighted cost against the full "
    "corpus's centroids.",
)
def q_kmeans_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.functions.ml_ops import kmeans_cost, kmeans_fit, lightweight_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    core = lightweight_coreset(emb, m=100, vec_col="embedding", id_col="vec_id", dim=64)
    core = core.transform(materialize)  # feeds count + weight-sum + cost
    centroids = kmeans_fit(core, "embedding", k=4, max_iter=3, dim=64, weight_col="weight")
    full_cost = kmeans_cost(emb, centroids, "embedding")
    core_cost = kmeans_cost(core, centroids, "embedding", weight_col="weight")
    stats = core.agg(
        F.count(F.lit(1)).alias("m"),
        dround(F.sum("weight"), 3).alias("weight_mass"),
    )
    return stats.select(
        "m",
        "weight_mass",
        dround(F.lit(full_cost), 3).alias("full_cost"),
        dround(F.lit(core_cost), 3).alias("coreset_cost"),
    )


@query(
    "training_shards",
    None,  # layout operator — rows-only IN THE DRIVER GATE; hash-checked
    # locally via local_oracle below (spark_xxhash64_int replicates the
    # permutation order), plus membership/size/permutation contracts in
    # tests/test_shards.py.
    local_oracle="""
    WITH ranked AS (
        SELECT doc_id,
               (row_number() OVER (ORDER BY spark_xxhash64_int(doc_id, 42))
                - 1) // 100 AS shard
        FROM documents
    )
    SELECT shard, count(*) AS n_rows,
           max(doc_id) - min(doc_id) AS id_spread
    FROM ranked GROUP BY shard ORDER BY shard
    """,
    doc="Deterministic training-shard layout (sources/shards.py): seeded-"
    "hash global permutation + two-phase distributed ranking (range "
    "exchange + broadcast offset map — never Exchange SinglePartition) "
    "→ exact fixed-size shards. Output: per-shard row counts and id "
    "spread demonstrating each shard samples the whole corpus.",
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.sources.shards import assign_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assigned = assign_shards(docs, shard_rows=100, id_col="doc_id")
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("doc_id") - F.min("doc_id")).alias("id_spread"),
        )
        .orderBy("shard")
    )


@query(
    "term_freq_cms",
    None,  # rows-only IN THE DRIVER GATE; the sketch is approximate vs
    # TRUTH but fully DETERMINISTIC in computation, so it is
    # hash-checked locally via local_oracle below — the full CMS cell
    # array rebuilt in DuckDB with the spark_xxhash64_str_int replica
    # (complete byte-wise XXH64, pinned bit-for-bit vs the JVM) — plus
    # one-sided-error/linearity tests in tests/test_sketch.py.
    local_oracle="""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    cells AS (
        SELECT j,
               ((spark_xxhash64_str_int(term, j) % 8192) + 8192) % 8192 AS bucket,
               count(*) AS cnt
        FROM words, unnest([0, 1, 2, 3]) AS u(j)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT term, count(*) AS exact FROM words GROUP BY term
        ORDER BY exact DESC, term LIMIT 20
    ),
    probes AS (
        SELECT term, exact, j,
               ((spark_xxhash64_str_int(term, j) % 8192) + 8192) % 8192 AS bucket
        FROM exact, unnest([0, 1, 2, 3]) AS u(j)
    ),
    est AS (
        SELECT p.term, p.exact, min(coalesce(c.cnt, 0)) AS est
        FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
        GROUP BY p.term, p.exact
    )
    SELECT term, exact, est, est - exact AS overcount
    FROM est ORDER BY exact DESC, term
    """,
    doc="Count-min sketch term frequencies (Cormode & Muthukrishnan "
    "2005; operators/sketch.py): fixed depth×width mergeable cells — "
    "shuffle bounded by sketch size, not vocabulary — probed for the "
    "corpus's top exact terms. Columns prove the one-sided contract "
    "(est ≥ exact, overcount ≤ εN).",
)
def q_term_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sketch import cms_build, cms_estimate

    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("term"))
        .where(F.col("term") != "")
    )
    words = words.transform(materialize)  # feeds build + exact counts
    cms = cms_build(words, "term")
    exact = words.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    top = exact.orderBy(F.desc("exact"), "term").limit(20)
    est = cms_estimate(cms, top.select("term"), "term")
    return (
        top.join(est, "term")
        .select("term", "exact", "est", (F.col("est") - F.col("exact")).alias("overcount"))
        .orderBy(F.desc("exact"), "term")
    )


@query(
    "decontaminate_spans",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (gram-string cover — collision-free
    # twin of the engine's hashed-wid path), plus a brute-force Python
    # k-gram cover in tests/test_dedup_extra.py.
    local_oracle="""
    WITH w AS (
        SELECT doc_id AS doc,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    cwin AS (
        SELECT doc, unnest(range(1, greatest(len(ws) - 9, 0) + 1)) - 1 AS pos,
               unnest(list_transform(
                   range(1, greatest(len(ws) - 9, 0) + 1),
                   i -> array_to_string(ws[i:i+9], ' '))) AS g
        FROM w
    ),
    pg AS (
        SELECT DISTINCT g FROM cwin WHERE doc % 50 = 0
    ),
    cover AS (
        SELECT DISTINCT doc, pos + unnest(range(0, 10)) AS p
        FROM cwin JOIN pg USING (g)
    ),
    removed AS (SELECT doc, count(*) AS n_removed FROM cover GROUP BY doc),
    per_doc AS (
        SELECT w.doc, coalesce(r.n_removed, 0) AS n_removed
        FROM w LEFT JOIN removed r ON w.doc = r.doc
        WHERE len(w.ws) > 0
    )
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_touched,
           CAST(sum(n_removed) AS BIGINT) AS total_removed
    FROM per_doc
    """,
    doc="Span-level benchmark decontamination (operators/dedup.py): "
    "remove every word position covered by a k-gram shared with the "
    "probe set instead of dropping whole documents. Probe wids "
    "broadcast — the corpus never shuffles for detection.",
)
def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.dedup import decontaminate_spans

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant: use a slice of the corpus itself as the "benchmark"
    probes = doc.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    out = decontaminate_spans(doc, probes, k=10)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("n_touched"),
        F.sum("n_removed").alias("total_removed"),
    )


@query(
    "perplexity_buckets",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # the registered query runs the exact_cuts/round_to oracle-parity
    # mode (the quantiles gate-row convention; the production path is
    # the percentile_approx sketch, sketch-vs-exact agreement checked in
    # tests/test_lm.py). The oracle extends the lm_perplexity
    # string-keyed twin with per-language quantile_cont cuts.
    None,
    local_oracle="""
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
    w AS (
        SELECT doc_id,
               list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS ws
        FROM d
    ),
    tok AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos,
               unnest(ws) AS word,
               unnest(list_transform(range(1, len(ws) + 1),
                      i -> CASE WHEN i > 1 THEN ws[i-1] || chr(1) || ws[i] END)) AS prev_bi
        FROM w
    ),
    uni AS (SELECT word, count(*) AS c1 FROM tok GROUP BY word),
    nv AS (SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni),
    bi AS (
        SELECT t2.prev_bi AS big, count(*) AS c2,
               string_split(t2.prev_bi, chr(1))[1] AS ctx
        FROM tok t2 WHERE t2.prev_bi IS NOT NULL
        GROUP BY t2.prev_bi HAVING count(*) >= 2
    ),
    bigr AS (
        SELECT b.big, ln(b.c2 / CAST(u.c1 AS DOUBLE)) AS log_cond
        FROM bi b JOIN uni u ON u.word = b.ctx
    ),
    scored AS (
        SELECT t.doc_id,
               CASE WHEN t.prev_bi IS NULL
                    THEN ln((u.c1 + 1) / ((SELECT n FROM nv) + (SELECT v FROM nv) + 1))
                    ELSE coalesce(
                        bg.log_cond,
                        ln(0.4) + ln((u.c1 + 1) /
                                     ((SELECT n FROM nv) + (SELECT v FROM nv) + 1)))
               END AS lp
        FROM tok t
        JOIN uni u ON u.word = t.word
        LEFT JOIN bigr bg ON bg.big = t.prev_bi
    ),
    ppl AS (
        SELECT doc_id, floor(exp(-avg(lp)) * 1e6 + 0.5) / 1e6 AS perplexity
        FROM scored GROUP BY doc_id
    ),
    wl AS (
        SELECT p.doc_id, p.perplexity, d2.lang
        FROM ppl p JOIN documents d2 USING (doc_id)
    ),
    cuts AS (
        SELECT lang,
               floor(quantile_cont(perplexity, 1.0/3.0) * 1e6 + 0.5) / 1e6 AS lo,
               floor(quantile_cont(perplexity, 2.0/3.0) * 1e6 + 0.5) / 1e6 AS hi
        FROM wl GROUP BY lang
    ),
    b AS (
        SELECT w2.lang, w2.perplexity,
               CASE WHEN w2.perplexity <= c.lo THEN 'head'
                    WHEN w2.perplexity <= c.hi THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM wl w2 JOIN cuts c ON w2.lang = c.lang
    )
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           floor(avg(perplexity) * 1e4 + 0.5) / 1e4 AS avg_ppl
    FROM b GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    doc="CCNet head/middle/tail buckets (Wenzek et al. 2020 §4.3, "
    "operators/lm.py): per-language perplexity percentile cuts via "
    "percentile_approx (mergeable sketch, partial+final) broadcast back "
    "onto the corpus as a native when-chain. The registered query runs "
    "exact cuts for oracle determinism; the sketch is the scale path.",
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.lm import ngram_lm_train, perplexity_buckets

    doc = load_table(spark, sf_dir, "documents")
    lm = ngram_lm_train(doc, min_count=2)
    out = perplexity_buckets(doc, lm, group_col="lang", exact_cuts=True, round_to=6)
    return (
        out.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dround(F.avg("perplexity"), 4).alias("avg_ppl"),
        )
        .orderBy("lang", "bucket")
    )


@query(
    "mixture_shards",
    # Rows-only IN THE DRIVER GATE (window full); hash-checked locally
    # via local_oracle below — waterfilling via _waterfill_ctes, the
    # row draw via spark_xxhash64_chain over struct(doc_id, text, lang),
    # and the global shard permutation as row_number over the
    # spark_xxhash64_int(doc_id, 42) order (collision-free at fixture
    # size, so the rank is total). Unbiasedness, replay identity, and
    # id re-keying are additionally value-checked in tests/test_shards.py.
    None,
    local_oracle=f"""
    WITH {_waterfill_ctes(300.0)},
    sel AS MATERIALIZED (
        SELECT d.doc_id, d.lang
        FROM documents d JOIN p USING (lang)
        WHERE ((spark_xxhash64_chain([
                    'l:' || CAST(d.doc_id AS VARCHAR),
                    's:' || d.text, 's:' || d.lang, 'i:42'
                ]) % 4294967296) + 4294967296) % 4294967296
              / 4294967296.0 < p.p
    ),
    top AS (
        SELECT lang FROM documents GROUP BY lang ORDER BY count(*) DESC LIMIT 1
    ),
    ranked AS (
        SELECT lang,
               row_number() OVER (ORDER BY spark_xxhash64_int(doc_id, 42)) - 1
                   AS rnk
        FROM sel
    )
    SELECT rnk // 64 AS shard, count(*) AS n_rows,
           floor(avg(CASE WHEN lang = (SELECT lang FROM top)
                          THEN 1.0 ELSE 0.0 END) * 1e4 + 0.5) / 1e4
               AS head_lang_frac
    FROM ranked GROUP BY 1 ORDER BY shard
    """,
    doc="Mixture materialization (sources/shards.materialize_mixture): "
    "temperature-sampled multi-source selection → deterministic global "
    "permutation → fixed-size shards; per-shard source composition "
    "tracks the global mixture (each shard is an unbiased sample). "
    "Output: per-shard row counts and tail-domain fraction.",
)
def q_mixture_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import temperature_mix
    from pixie_spark.sources.shards import assign_shards

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    mixed = temperature_mix(doc, "lang", target_total=300, temperature=2.0)
    assigned = assign_shards(mixed, shard_rows=64, id_col="doc_id")
    top_lang = doc.groupBy("lang").count().orderBy(F.desc("count")).first()["lang"]
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.avg((F.col("lang") == top_lang).cast("double")), 4).alias(
                "head_lang_frac"
            ),
        )
        .orderBy("shard")
    )


@query(
    "epoch_expansion",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (spark_xxhash64_int replicates the
    # seeded fractional pick bit-for-bit), plus a per-row replica in
    # tests/test_temperature_mix.py.
    local_oracle="""
    WITH l AS (SELECT min(lang) AS lo, max(lang) AS hi FROM documents),
    d AS (
        SELECT doc_id, lang,
               CASE WHEN lang = (SELECT lo FROM l) THEN 0
                    WHEN lang = (SELECT hi FROM l) THEN 2 ELSE 1 END AS full_e,
               CASE WHEN lang = (SELECT lo FROM l) THEN 0.5
                    WHEN lang = (SELECT hi FROM l) THEN 0.5 ELSE 0.0 END AS frac_e
        FROM documents
    ),
    c AS (
        SELECT lang,
               full_e + CASE WHEN
                   (((spark_xxhash64_int(doc_id, 42) % 4294967296)
                     + 4294967296) % 4294967296) / 4294967296.0 < frac_e
                   THEN 1 ELSE 0 END AS copies
        FROM d
    ),
    e AS (SELECT lang, unnest(range(0, copies)) AS epoch FROM c WHERE copies > 0)
    SELECT lang, count(*) AS n_rows, max(epoch) AS max_epoch
    FROM e GROUP BY lang ORDER BY lang
    """,
    doc="Fractional dataset repeats for data-constrained training "
    "(Muennighoff et al. 2023; operators/sampling.epoch_expand): "
    "floor(e) full copies per row + a seeded-hash frac(e) share once "
    "more — one in-row explode, zero shuffle, bit-for-bit replayable.",
)
def q_epoch_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import epoch_expand

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    langs = [r["lang"] for r in doc.select("lang").distinct().collect()]
    # upweight the alphabetically-last domain 2.5×, downsample the first
    epochs = {min(langs): 0.5, max(langs): 2.5}
    out = epoch_expand(doc, "lang", epochs, id_col="doc_id")
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.max("epoch").alias("max_epoch"))
        .orderBy("lang")
    )


@query(
    "doc_chunking",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below, plus a Python boundary reference
    # in tests/test_operators.py.
    # chunk i covers words [i*56, i*56+64); chunk count 1+ceil(max(0,n-64)/56)
    local_oracle="""
    WITH w AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, n,
               1 + CAST(ceil(greatest(n - 64, 0) / 56.0) AS INT) AS n_chunks
        FROM w
    ),
    e AS (
        SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_id FROM c
    )
    SELECT count(*) AS n_chunks,
           count(DISTINCT doc_id) AS n_docs,
           max(chunk_id) AS max_chunk_id,
           floor(avg(least(64, n - chunk_id * 56)) * 1e4 + 0.5) / 1e4 AS avg_chunk_words
    FROM e
    """,
    doc="Fixed-window document chunking with overlap (operators/"
    "text.chunk_documents): the pre-embedding step of retrieval "
    "pipelines — one codegen'd map stage (split once, sequence + "
    "slice in-row), zero shuffle.",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.text import chunk_documents

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(doc, chunk_words=64, overlap=8)
    return out.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("chunk_id").alias("max_chunk_id"),
        dround(F.avg("n_words"), 4).alias("avg_chunk_words"),
    )


@query(
    "ann_ivf_persisted",
    None,  # rows-only (window full); persisted-search ≡ live-ivf_topk,
    # full-probe ≡ brute force, and the partition-pruning plan are
    # value-checked in tests/test_ivf_index.py.
    doc="Persisted IVF index (operators/similarity.ivf_index_build/"
    "search): the corpus written once as list_id-PARTITIONED parquet + "
    "a centroid sidecar; at search time the query batch's nprobe "
    "union becomes a literal partition filter, so nprobe selection is "
    "physical partition pruning — a query reads nprobe/n_lists of the "
    "index bytes. Build once, query many.",
)
def q_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pixie_spark.operators.similarity import ivf_index_build, ivf_index_search

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pixie_spark_ivf_")
    ivf_index_build(emb, path, n_lists=16, dim=64)
    queries_df = emb.where(F.col("vec_id") % 61 == 0)
    out = ivf_index_search(spark, path, queries_df, k=10, nprobe=4, dim=64)
    return out.select(
        "query_id", "vec_id", dround("score", 6).alias("score"), "rank"
    ).orderBy("query_id", "rank")


@query(
    "ts_pattern_search",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (same lead/z-norm/distance fold in
    # DuckDB SQL — bit-identical doubles because the literals and the
    # left-fold order match), plus a numpy reference in
    # tests/test_timeseries.py. zq literals = znorm([0,1,3,1,0]).
    local_oracle="""
    WITH ev AS (
        -- one value per (entity, ts): a time series is a FUNCTION of
        -- time, and lead()-window subsequences are ill-defined over
        -- duplicate timestamps (the interleave of equal-ts rows is
        -- arbitrary, so window contents diverge per engine — caught by
        -- the sf1 sweep, whose twin recipe duplicates every point 10x).
        -- min() is the deterministic, bit-exact-in-both-engines collapse.
        SELECT event_type AS entity, epoch_ns(ts) AS ts, min(value) AS value
        FROM events GROUP BY 1, 2
    ),
    led AS (
        SELECT entity, ts,
               CAST(value AS DOUBLE) AS v0,
               lead(CAST(value AS DOUBLE), 1) OVER w AS v1,
               lead(CAST(value AS DOUBLE), 2) OVER w AS v2,
               lead(CAST(value AS DOUBLE), 3) OVER w AS v3,
               lead(CAST(value AS DOUBLE), 4) OVER w AS v4
        FROM ev WINDOW w AS (PARTITION BY entity ORDER BY ts)
    ),
    mu AS (
        SELECT entity, ts, v0, v1, v2, v3, v4,
               ((v0 + v1 + v2 + v3 + v4) / 5) AS m
        FROM led WHERE v4 IS NOT NULL
    ),
    sd AS (
        SELECT entity, ts, v0, v1, v2, v3, v4, m,
               sqrt(((v0-m)*(v0-m) + (v1-m)*(v1-m) + (v2-m)*(v2-m)
                     + (v3-m)*(v3-m) + (v4-m)*(v4-m)) / 5) AS s
        FROM mu
    ),
    scored AS (
        SELECT entity, ts,
               CASE WHEN s = 0.0 THEN CAST('infinity' AS DOUBLE) ELSE
                   ((v0-m)/s - (-0.9128709291752769)) * ((v0-m)/s - (-0.9128709291752769))
                 + ((v1-m)/s - (0.0)) * ((v1-m)/s - (0.0))
                 + ((v2-m)/s - (1.8257418583505538)) * ((v2-m)/s - (1.8257418583505538))
                 + ((v3-m)/s - (0.0)) * ((v3-m)/s - (0.0))
                 + ((v4-m)/s - (-0.9128709291752769)) * ((v4-m)/s - (-0.9128709291752769))
               END AS dist
        FROM sd
    ),
    topk AS (
        SELECT entity, ts, dist,
               row_number() OVER (ORDER BY dist ASC, entity, ts) AS rank
        FROM scored
    )
    SELECT entity, ts, floor(dist * 1e6 + 0.5) / 1e6 AS dist, CAST(rank AS INT) AS rank
    FROM topk WHERE rank <= 15 ORDER BY rank
    """,
    doc="Z-normalized subsequence pattern search (operators/timeseries."
    "pattern_search): incident-signature matching over per-entity metric "
    "series — m-1 window-leads (one shuffle on the entity key), in-row "
    "z-normalization, native UCR-style distance, TakeOrdered top-k. "
    "Amplitude/offset-invariant by construction.",
)
def q_ts_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.timeseries import pattern_search

    # duplicate-(entity, ts) collapse + single-exchange layout now live
    # INSIDE pattern_scores (round-7 advice): the operator min-collapses
    # per point and repartitions on entity alone, so the collapse agg
    # and the lead window share ONE exchange whatever the caller passes.
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("entity"), "ts", "value"
    )
    spike = [0.0, 1.0, 3.0, 1.0, 0.0]
    out = pattern_search(ev, spike, k=15)
    return out.select("entity", "ts", dround("dist", 6).alias("dist"), "rank")


@query(
    "ts_anomalies",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (same trailing window in DuckDB;
    # the 1e-6 rounding sits far above any cross-engine stddev-
    # algorithm noise), plus exact numpy z-score equality in
    # tests/test_timeseries.py.
    local_oracle="""
    WITH ev AS (
        SELECT event_type AS entity, epoch_ns(ts) AS ts,
               CAST(value AS DOUBLE) AS v
        FROM events
    ),
    wnd AS (
        SELECT entity, ts, v,
               avg(v) OVER w AS mu,
               stddev_pop(v) OVER w AS sd,
               count(v) OVER w AS n
        FROM ev
        WINDOW w AS (PARTITION BY entity ORDER BY ts
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT entity,
               CASE WHEN n >= 20 AND sd > 0 THEN (v - mu) / sd END AS z,
               (n >= 20 AND sd = 0 AND v <> mu) AS flat_jump
        FROM wnd
    )
    SELECT entity, count(*) AS n_points,
           CAST(sum(CASE WHEN coalesce(abs(z) >= 3.0, FALSE)
                          OR coalesce(flat_jump, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           floor(max(abs(z)) * 1e6 + 0.5) / 1e6 AS max_abs_z
    FROM z GROUP BY entity ORDER BY entity
    """,
    doc="Rolling z-score anomaly flags (operators/timeseries."
    "rolling_anomalies): per-entity trailing mean/std window excluding "
    "the current point, warm-up gated, flat-baseline jumps flagged. "
    "Output: per-entity anomaly counts over the events table.",
)
def q_ts_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.timeseries import rolling_anomalies

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("entity"), "ts", "value"
    )
    out = rolling_anomalies(ev, baseline_rows=50, min_support=20, z_threshold=3.0)
    return (
        out.groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
            dround(F.max(F.abs("z")), 6).alias("max_abs_z"),
        )
        .orderBy("entity")
    )


def _pagerank_oracle() -> str:
    """DuckDB oracle for domain_pagerank: the SAME synthetic two-chord
    graph, 10 damped power iterations UNROLLED as CTEs (r1..r10 — SQL
    cannot loop-with-aggregation, so the loop is written out; verified
    empirically that the tol=1e-6 check never fires early on this graph
    and that no node is dangling, so each step is exactly
    rank = (1-d)/N + d·Σ inflow). Rounding to 1e-9 sits ~7 orders above
    the cross-engine float-sum-order noise."""
    steps = []
    prev = "r0"
    for i in range(1, 11):
        steps.append(
            f"""r{i} AS (
        SELECT n.node, (1.0 - 0.85) / (SELECT cnt FROM nn) + 0.85 * coalesce(s.inf, 0.0) AS rank
        FROM nodes n LEFT JOIN (
            SELECT cw.dst AS node, sum({prev}.rank * cw.w) AS inf
            FROM cw JOIN {prev} ON {prev}.node = cw.node GROUP BY cw.dst
        ) s ON s.node = n.node
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS (
        SELECT DISTINCT CAST(doc_id AS VARCHAR) AS src,
               CAST((doc_id * 31 + 7) % 500 AS VARCHAR) AS dst
        FROM documents WHERE CAST(doc_id AS VARCHAR) <> CAST((doc_id * 31 + 7) % 500 AS VARCHAR)
        UNION
        SELECT DISTINCT CAST(doc_id AS VARCHAR) AS src,
               CAST((doc_id * 17 + 3) % 100 AS VARCHAR) AS dst
        FROM documents WHERE CAST(doc_id AS VARCHAR) <> CAST((doc_id * 17 + 3) % 100 AS VARCHAR)
    ),
    deg AS (SELECT src, count(*) AS o FROM e GROUP BY src),
    cw AS (SELECT e.src AS node, e.dst, 1.0 / deg.o AS w FROM e JOIN deg USING (src)),
    nodes AS (
        SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes),
    {chain}
    SELECT node, floor(rank * 1e9 + 0.5) / 1e9 AS rank
    FROM r10 ORDER BY r10.rank DESC, node LIMIT 10
    """


@query(
    "domain_pagerank",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (10 unrolled damped iterations),
    # plus exact numpy power-iteration equality in tests/test_graph.py.
    local_oracle=_pagerank_oracle(),
    doc="PageRank domain authority (operators/graph.py): damped power "
    "iteration with dangling-mass redistribution over an edge frame — "
    "per iteration one co-partitioned rank⋈edge join (edge side "
    "materialized once) + one partial+final agg; host authority joins "
    "back to the corpus as a broadcast quality prior.",
)
def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.graph import pagerank

    doc = load_table(spark, sf_dir, "documents").select("doc_id")
    # deterministic synthetic link graph over the doc ids (the testdata
    # has no link table): two chords per node
    edges = doc.select(
        F.col("doc_id").cast("string").alias("src"),
        ((F.col("doc_id") * 31 + 7) % 500).cast("string").alias("dst"),
    ).union(
        doc.select(
            F.col("doc_id").cast("string").alias("src"),
            ((F.col("doc_id") * 17 + 3) % 100).cast("string").alias("dst"),
        )
    ).where(F.col("src") != F.col("dst")).distinct()
    ranks = pagerank(edges, max_iter=10)
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(10)
        .select("node", dround("rank", 9).alias("rank"))
    )


@query(
    "jsonl_ingest_pipeline",
    None,  # rows-only; parse/bridge/corrupt-accounting contracts are
    # value-checked in tests/test_jsonl.py.
    doc="JSONL corpus ingestion (sources/jsonl.py — the C4/Pile/Dolma "
    "interchange format): schema-EXPLICIT read (no inference pass over "
    "100 TB), PERMISSIVE corrupt-line accounting, deterministic "
    "url-hash doc ids, documents-table bridge feeding the standard "
    "cleaning chain. Fixture jsonl is synthesized from the documents "
    "table (demo-only; production points at real .jsonl.gz paths).",
)
def q_jsonl_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pixie_spark.operators.text import quality_score
    from pixie_spark.sources.jsonl import jsonl_documents

    d = tempfile.mkdtemp(prefix="pixie_spark_jsonl_")
    (
        load_table(spark, sf_dir, "documents")
        .select(
            F.concat(F.lit("https://corpus.example/doc/"), "doc_id").alias("url"),
            "text",
            "lang",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .json(d)
    )
    docs = jsonl_documents(spark, d, extra_fields={"lang": "string"})
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_ids"),
        dround(F.avg(quality_score(F.col("text"))), 6).alias("avg_quality"),
    ).orderBy("lang")


@query(
    "pii_exposure_report",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (all 7 patterns are RE2-compatible
    # — no lookarounds — so Java-regex and DuckDB counts agree), plus a
    # Python re reference in tests/test_functions.py.
    local_oracle="""
    WITH c AS (
        SELECT lang,
            len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
            len(regexp_extract_all(text,
                '\\b(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\\b')) AS n_mac,
            len(regexp_extract_all(text,
                '\\b(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f]{1,4}\\b')) AS n_ip6,
            len(regexp_extract_all(text,
                '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ip,
            len(regexp_extract_all(text,
                '\\b(?:\\d[ -]?){13,16}\\b')) AS n_cc,
            len(regexp_extract_all(text,
                '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
            len(regexp_extract_all(text,
                '\\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\b')) AS n_uuid
        FROM documents
    )
    SELECT lang,
        count(*) AS n_docs,
        CAST(sum(CASE WHEN n_email + n_mac + n_ip6 + n_ip + n_cc + n_ssn + n_uuid > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
        floor(sum(CASE WHEN n_email + n_mac + n_ip6 + n_ip + n_cc + n_ssn + n_uuid > 0
                  THEN 1 ELSE 0 END) / count(*) * 1e6 + 0.5) / 1e6 AS pii_doc_rate,
        CAST(sum(n_email) AS BIGINT) AS matches_email,
        CAST(sum(n_ip) AS BIGINT) AS matches_ip
    FROM c GROUP BY lang ORDER BY lang
    """,
    doc="Corpus PII-exposure report (functions/pii_ops.pii_report — the "
    "release-gate numbers a dataset card publishes): per-language doc/"
    "match counts per PII kind + any-PII doc rate, all native "
    "regexp_count in one codegen map stage + one partial+final agg.",
)
def q_pii_exposure_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.functions.pii_ops import pii_report

    doc = load_table(spark, sf_dir, "documents")
    out = pii_report(doc, "text", ["lang"])
    return out.select(
        "lang",
        "n_docs",
        "docs_with_pii",
        dround("pii_doc_rate", 6).alias("pii_doc_rate"),
        "matches_email",
        "matches_ip",
    ).orderBy("lang")


@query(
    "contamination_matrix",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (gram-string overlap), plus a
    # brute-force Python reference in tests/test_dedup_extra.py.
    local_oracle="""
    WITH w AS (
        SELECT doc_id AS doc, lang,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc, lang,
               unnest(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> array_to_string(ws[i:i+4], ' '))) AS g
        FROM w
    ),
    suites AS (
        SELECT DISTINCT 'suite_alpha' AS suite, g FROM grams WHERE doc % 100 = 7
        UNION ALL
        SELECT DISTINCT 'suite_beta' AS suite, g FROM grams WHERE doc % 100 = 13
    ),
    hits AS (SELECT suite, lang, doc FROM grams JOIN suites USING (g))
    SELECT suite, lang,
           count(DISTINCT doc) AS n_contaminated_docs,
           count(*) AS n_shared_ngrams
    FROM hits GROUP BY suite, lang ORDER BY suite, lang
    """,
    doc="Per-suite × per-slice contamination audit (operators/dedup."
    "contamination_matrix): every eval suite's n-gram overlap with "
    "every corpus slice in one pass — probe shingles broadcast, corpus "
    "never shuffles before the bounded (suite, slice) aggregate.",
)
def q_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.dedup import contamination_matrix

    doc = load_table(spark, sf_dir, "documents")
    # two synthetic "eval suites" drawn from disjoint corpus slices
    probes = (
        doc.where(F.col("doc_id") % 100 == 7)
        .select(F.lit("suite_alpha").alias("suite"), "text")
        .union(
            doc.where(F.col("doc_id") % 100 == 13).select(
                F.lit("suite_beta").alias("suite"), "text"
            )
        )
    )
    out = contamination_matrix(doc, probes, n=5, corpus_slice_col="lang")
    return out.orderBy("suite", "lang")


@query(
    "corpus_diversity",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # the registered query runs the exact count_distinct oracle-parity
    # mode (HLL stays the production path; HLL-vs-exact tolerance is
    # pinned in tests/test_corpus_metrics.py). The oracle counts
    # distinct space-joined word tuples — the collision-free twin of the
    # hashed gram ids.
    None,
    local_oracle="""
    WITH w AS (
        SELECT lang,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    g AS (
        SELECT lang, nn.n AS n,
               unnest(list_transform(range(1, len(ws) - nn.n + 2),
                      i -> array_to_string(ws[i:i+nn.n-1], ' '))) AS gram
        FROM w, (VALUES (1), (2), (3)) nn(n)
        WHERE len(ws) >= nn.n
    )
    SELECT lang, n,
           CAST(count(*) AS BIGINT) AS total_ngrams,
           CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           floor(count(DISTINCT gram)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6
               AS distinct_ratio
    FROM g GROUP BY lang, n ORDER BY lang, n
    """,
    doc="Corpus diversity report (operators/text.distinct_ngram_stats): "
    "distinct-n per (lang, n) via 8-byte gram ids — the mixture-card "
    "repetitiveness gauge. Production path = HLL approx_count_distinct "
    "(shuffle bounded by sketch partials, not gram counts); the "
    "registered query runs the exact count_distinct parity mode.",
)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.text import distinct_ngram_stats

    doc = load_table(spark, sf_dir, "documents")
    out = distinct_ngram_stats(doc, (1, 2, 3), slice_col="lang", exact=True)
    return out.select(
        "lang",
        "n",
        "total_ngrams",
        "distinct_ngrams",
        dround("distinct_ratio", 6).alias("distinct_ratio"),
    ).orderBy("lang", "n")


@query(
    "ts_resample_ffill",
    None,  # rows-only IN THE DRIVER GATE (window full); hash-checked
    # locally via local_oracle below (same grid-union-window plan in
    # DuckDB SQL), plus a serial Python reference in
    # tests/test_timeseries.py.
    local_oracle="""
    WITH ev AS (
        SELECT event_type AS entity, epoch_ns(ts) AS ts, value FROM events
    ),
    b AS (
        SELECT entity, min(ts) // 60000000000 AS lo, max(ts) // 60000000000 AS hi
        FROM ev GROUP BY entity
    ),
    grid AS (
        SELECT entity, unnest(range(lo, hi + 1)) * 60000000000 AS ts,
               TRUE AS is_grid, NULL::DOUBLE AS v
        FROM b
    ),
    obs AS (SELECT entity, ts, FALSE AS is_grid, value AS v FROM ev),
    u AS (SELECT * FROM grid UNION ALL SELECT * FROM obs),
    wnd AS (
        SELECT entity, ts, is_grid,
               LAST_VALUE(v IGNORE NULLS) OVER w AS fv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                   OVER w AS src
        FROM u
        WINDOW w AS (
            PARTITION BY entity ORDER BY ts, CAST(is_grid AS INT)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    ),
    g AS (
        SELECT entity, ts, src,
               CASE WHEN ts - src <= 5 * 60000000000 THEN fv END AS value
        FROM wnd WHERE is_grid
    )
    SELECT entity, count(*) AS grid_points,
           CAST(coalesce(sum(CASE WHEN value IS NOT NULL AND src <> ts
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_filled,
           CAST(coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_gaps
    FROM g GROUP BY entity ORDER BY entity
    """,
    doc="Regular-grid resampling with forward fill (operators/"
    "timeseries.resample_ffill): floor-aligned per-entity grid from an "
    "in-row sequence explode, as-of fill via one last(ignorenulls) "
    "window pass, staleness horizon — one shuffle on the entity key.",
)
def q_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("entity"), "ts", "value"
    )
    step = 60 * 10**9  # one-minute grid over the long-ns time axis
    out = resample_ffill(ev, step, max_fill_steps=5)
    return (
        out.groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("grid_points"),
            F.sum(F.col("filled").cast("long")).alias("n_filled"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_gaps"),
        )
        .orderBy("entity")
    )


@query(
    "corpus_overlap_sketch",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # the registered query runs the exact count_distinct parity mode
    # (the HLL sketch stays the production path; estimate-vs-exact
    # tolerance pinned in tests/test_sketch.py).
    None,
    local_oracle="""
    WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 != 9),
    b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 != 0),
    u AS (SELECT text FROM a UNION SELECT text FROM b),
    c AS (SELECT (SELECT count(*) FROM a) AS n_old,
                 (SELECT count(*) FROM b) AS n_new,
                 (SELECT count(*) FROM u) AS n_union)
    SELECT CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_union AS BIGINT) AS n_union,
           CAST(n_old + n_new - n_union AS BIGINT) AS n_shared,
           floor((n_old + n_new - n_union)::DOUBLE / n_union * 1e4 + 0.5) / 1e4
               AS jaccard
    FROM c
    """,
    doc="Sketch-based corpus-version overlap (operators/sketch."
    "hll_overlap_report): |A|, |B|, |A∪B| from mergeable HLL states + "
    "inclusion-exclusion intersection/Jaccard — the aggregate twin of "
    "snapshot_diff without its full-outer join; the two corpora never "
    "co-shuffle. Registered query runs the exact parity mode.",
)
def q_corpus_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sketch import hll_overlap_report

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = doc.where(F.col("doc_id") % 10 != 9)  # the snapshot_diff slices
    new = doc.where(F.col("doc_id") % 10 != 0)
    rep = hll_overlap_report(old, new, "text", exact=True)
    return rep.select(
        F.round("n_a").cast("long").alias("n_old"),
        F.round("n_b").cast("long").alias("n_new"),
        F.round("n_union").cast("long").alias("n_union"),
        F.round("n_intersection").cast("long").alias("n_shared"),
        dround("jaccard", 4).alias("jaccard"),
    )


@query(
    "dedup_lines",
    # Rows-only in the driver gate (50-row window full); hash-checked
    # locally below — an independent DuckDB window-function replica of
    # the keep-first semantics — plus a serial-Python reference on a
    # planted multi-line corpus in tests/test_dedup_extra.py.
    None,
    doc="Corpus-wide exact line-level dedup, keep-first (C4 §2.2 span "
    "dedup at line granularity / RefinedWeb-Dolma recipes): every line "
    "occurring more than once anywhere keeps only its (doc_id, pos)-"
    "minimal occurrence; documents are rebuilt in-row from surviving "
    "positions. Line text never shuffles — only 8-byte xxhash64 line "
    "ids; keep-first is a map-side-combinable min(struct) agg, so "
    "boilerplate hot lines collapse in the partial aggregate.",
    local_oracle="""
    WITH split AS (
        SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
    ),
    lines AS (
        SELECT doc_id, unnest(ls) AS line, unnest(range(len(ls))) AS pos
        FROM split
    ),
    elig AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        FROM lines WHERE length(line) >= 1
    ),
    drops AS (SELECT doc_id, pos FROM elig WHERE rn > 1)
    SELECT l.doc_id,
           coalesce(string_agg(CASE WHEN d.pos IS NULL THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(d.pos) AS BIGINT) AS n_lines_dropped
    FROM lines l LEFT JOIN drops d ON l.doc_id = d.doc_id AND l.pos = d.pos
    GROUP BY l.doc_id
    """,
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.line_level_dedup(docs)


@query(
    "c4_quality_clean",
    # Rows-only in the driver gate (window full); hash-checked locally
    # below via an independent DuckDB list-lambda replica of every line
    # rule, page rule, and the reason precedence — plus a serial-Python
    # reference on planted pages in tests/test_quality.py.
    None,
    doc="C4 heuristic cleaning (Raffel et al. 2020 §2.2): line-granular "
    "keep rules (terminal punctuation, >=3 words, no javascript/cookie/"
    "policy boilerplate) REWRITE the text; page rules (brace, lorem "
    "ipsum, sentence floor) gate the document. Pure in-row map stage — "
    "zero shuffle, scan-attached projection at 100 TB.",
    local_oracle="""
    WITH base AS (
        SELECT doc_id, text AS orig,
               list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
        FROM documents
    ),
    k AS (
        SELECT doc_id, orig, lines,
               list_filter(lines, x ->
                   regexp_matches(trim(x), '[.!?"'']$')
                   AND len(list_filter(string_split_regex(trim(x), '\\s+'),
                           w -> w <> '')) >= 3
                   AND NOT regexp_matches(lower(x),
                       '(javascript|terms of use|privacy policy|cookie policy|uses cookies|use of cookies|use cookies)')
               ) AS kept_lines
        FROM base
    ),
    c AS (
        SELECT doc_id, orig, lines, kept_lines,
               -- duckdb array_to_string([]) is NULL; spark array_join is ''
               coalesce(array_to_string(kept_lines, chr(10)), '') AS clean
        FROM k
    ),
    s AS (
        SELECT *, CAST(length(clean)
                   - length(regexp_replace(clean, '[.!?]', '', 'g'))
                   AS BIGINT) AS n_sentences
        FROM c
    ),
    v AS (
        SELECT *,
            CASE WHEN strpos(orig, '{') > 0 THEN 'brace'
                 WHEN strpos(lower(orig), 'lorem ipsum') > 0 THEN 'lorem_ipsum'
                 WHEN n_sentences < 5 THEN 'too_few_sentences'
                 ELSE NULL END AS drop_reason
        FROM s
    )
    SELECT doc_id, clean AS text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept_lines) AS BIGINT) AS n_lines_kept,
           n_sentences,
           (drop_reason IS NULL) AS kept,
           drop_reason
    FROM v
    """,
)
def q_c4_quality_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.quality import c4_clean

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return c4_clean(docs)


@query(
    "normalize_corpus",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # the DuckDB replica shares every \x{...} pattern string verbatim
    # (the one escape syntax Java regex and RE2 both accept); planted
    # unicode/control/CRLF adversaries are pinned in tests/test_operators.
    None,
    doc="Unicode/whitespace cleanup (CCNet/Dolma-style pre-processing): "
    "CRLF fold, zero-width strip, control-char strip, unicode-space "
    "fold, space/newline-run collapse, edge trim — a chain of native "
    "regexp_replace, zero shuffle, scan-attached projection at 100 TB.",
    local_oracle=r"""
    WITH n AS (
      SELECT doc_id, text AS orig,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '\r\n?', chr(10), 'g'),
                    '[\x{200b}-\x{200d}\x{2060}\x{feff}]', '', 'g'),
                  '[\x{0}-\x{8}\x{b}\x{c}\x{e}-\x{1f}\x{7f}-\x{9f}]', '', 'g'),
                '[\x{a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}]|\t', ' ', 'g'),
              ' {2,}', ' ', 'g'),
            ' ?\n ?', chr(10), 'g'),
          '\n{3,}', chr(10)||chr(10), 'g') AS t1
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(t1, '^[ \n]+|[ \n]+$', '', 'g') AS text,
           CAST(length(orig) AS BIGINT) AS n_chars_before,
           CAST(length(regexp_replace(t1, '^[ \n]+|[ \n]+$', '', 'g')) AS BIGINT)
               AS n_chars_after,
           (regexp_replace(t1, '^[ \n]+|[ \n]+$', '', 'g') <> orig) AS changed
    FROM n
    """,
)
def q_normalize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tx.normalize_report(docs)


@query(
    "dedup_lines_ccnet",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # same window-function replica as dedup_lines but partitioned by the
    # CCNet-normalized key, so two boilerplate lines differing only in
    # case/digits/punctuation collapse to one owner.
    None,
    doc="CCNet-style fuzzy line dedup (Wenzek et al. 2020 §3): "
    "line_level_dedup keyed on the lowercase/digits-to-0/punctuation-"
    "stripped projection — keep-first still by (doc_id, pos); the "
    "stored text is untouched and only the 8-byte key hash shuffles.",
    local_oracle=r"""
    WITH split AS (
        SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
    ),
    lines AS (
        SELECT doc_id, unnest(ls) AS line, unnest(range(len(ls))) AS pos
        FROM split
    ),
    elig AS (
        SELECT doc_id, pos,
               row_number() OVER (
                   PARTITION BY trim(regexp_replace(regexp_replace(
                       regexp_replace(lower(line), '[0-9]', '0', 'g'),
                       '[^a-z0\x{c0}-\x{24f}\x{400}-\x{4ff} ]', ' ', 'g'),
                       ' {2,}', ' ', 'g'))
                   ORDER BY doc_id, pos) AS rn
        FROM lines WHERE length(line) >= 1
    ),
    drops AS (SELECT doc_id, pos FROM elig WHERE rn > 1)
    SELECT l.doc_id,
           coalesce(string_agg(CASE WHEN d.pos IS NULL THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(d.pos) AS BIGINT) AS n_lines_dropped
    FROM lines l LEFT JOIN drops d ON l.doc_id = d.doc_id AND l.pos = d.pos
    GROUP BY l.doc_id
    """,
)
def q_dedup_lines_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.line_level_dedup(docs, key_fn=tx.normalize_for_hash)


@query(
    "leakage_safe_split",
    # Rows-only in the driver gate (window full); hash-checked locally —
    # the oracle recomputes exact-Jaccard pairs (proven ≡ the full-recall
    # banding by the dedup_minhash_lsh gate row), closes them with the
    # same recursive min-label CTE as dedup_clusters, and replays the
    # seeded threshold chain with the spark_xxhash64_int replica.
    None,
    doc="Leakage-safe train/val/test split: the unit of assignment is "
    "the near-dup CONNECTED COMPONENT (min-id representative; "
    "singletons represent themselves), so a near-duplicate of a "
    "training document can never land in a held-out split. Assignment "
    "is the seeded-xxhash64 uniform threshold chain over cumulative "
    "fractions — deterministic and row-order independent.",
    local_oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 4, 0) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS shingle
        FROM w
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a AS a, doc_b AS b
        FROM inter
        JOIN sz x ON inter.doc_a = x.doc_id
        JOIN sz y ON inter.doc_b = y.doc_id
        WHERE n_common::DOUBLE / (x.sz + y.sz - n_common) >= 0.5
    ),
    sym AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b AS node, r.lbl
        FROM reach r JOIN sym s ON s.a = r.node
        WHERE r.lbl < s.b
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    r AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    u AS (
        SELECT doc_id, cluster_rep,
               ((spark_xxhash64_int(cluster_rep, 0) % 4503599627370496
                 + 4503599627370496) % 4503599627370496 + 0.5)
                 / 4503599627370496.0 AS uu
        FROM r
    )
    SELECT doc_id, cluster_rep,
           CASE WHEN uu < 0.9 THEN 'train'
                WHEN uu < 0.9500000000000001 THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.operators.sampling import leakage_safe_split

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_lsh_verified_pairs(
        doc, "doc_id", "text", n=5, num_hashes=64, bands=64, threshold=0.5
    )
    return leakage_safe_split(doc, pairs, seed=0)


@query(
    "debug_analyze_stats",
    None,  # runtime metrics (times, shuffle bytes) are run-dependent —
    # rows-only here; the contract (non-trivial rows/time for
    # scan/agg/join/exchange nodes, id uniqueness, px.debug wiring)
    # is pinned in tests/test_analyze.py
    doc="px.debug(analyze=True) parity: execute a scan→filter→agg→join "
    "plan and return per-operator runtime stats (reference "
    "carnot.cc:371-400 collects per-exec-node records_output/time when "
    "analyze=true).",
)
def q_debug_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixie_spark.plans.analyze import analyze

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    flagship = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("revenue").alias("total"))
    )
    return analyze(flagship).select("node_id", "node", "depth", "rows_out")


# =============================================================================
# Gate-window ordering
# =============================================================================
# The external driver records at most the FIRST 50 queries() entries in
# its correctness gate (dict insertion order). ``QUERIES`` itself stays
# in declaration order (docs/listings/other consumers see the natural
# order); the driver adapter (__spark_entry__.queries) calls
# ``gate_ordered()`` to put every oracle-bearing entry inside the gate
# window and the rows-only demos (approximate/stochastic by
# construction — pytest-verified instead) at the tail. Round 2 lost gate
# rows for 5 oracle-checked queries to this cap; round 3 fixed it by
# mutating QUERIES in place, which silently reordered every consumer —
# this keeps the reorder scoped to the driver contract.

GATE_WINDOW = 50


def gate_ordered() -> dict[str, "QuerySpec"]:
    """Gate-friendly view of QUERIES: oracle-bearing entries first.

    Raises if oracle-bearing entries outgrow the driver's gate window —
    a silent drop there would remove a hash-checked row from the gate,
    which is exactly the regression this ordering exists to prevent.
    """
    oracle = {n: s for n, s in QUERIES.items() if s.oracle is not None}
    if len(oracle) > GATE_WINDOW:
        raise RuntimeError(
            f"{len(oracle)} oracle-bearing queries exceed the driver's "
            f"{GATE_WINDOW}-row gate window; drop or demote one explicitly "
            "instead of letting the window truncate it."
        )
    rows_only = {n: s for n, s in QUERIES.items() if s.oracle is None}
    return {**oracle, **rows_only}
