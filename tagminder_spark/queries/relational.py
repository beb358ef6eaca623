"""Relational operator inventory (SURVEY.md §2.3-§2.7) over the testdata
star schema.

Determinism rules used throughout (so the DuckDB oracle hash-matches):
- money math in DECIMAL(18,2) (exact, engine-independent), cast to DOUBLE
  only at the end (exact while |value|*10^scale < 2^53);
- averages computed as exact-decimal-sum / count in IEEE double (identical
  in both engines), never via the engines' float `avg`;
- every top-k / argmax carries a full deterministic tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tagminder_spark.cache import scoped_persist
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _dec(c, p: int = 18, s: int = 2):
    return (F.col(c) if isinstance(c, str) else c).cast(f"decimal({p},{s})")


# --------------------------------------------------------------------------
# A: aggregations
# --------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@q("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter + 8-way hash aggregate (SURVEY §2.4).

    Mirrors the reference's report aggregations (e.g. A12/A13 album &
    format-mix stats, scripts/reports/92-library-insights.py:795-1160):
    one wide groupBy with conditional/derived measures. Map-side partial
    aggregation + AQE handle this at 100 TB: the shuffle carries only
    (flag,status) groups.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    qty, price, disc, tax = (
        _dec("l_quantity"),
        _dec("l_extendedprice"),
        _dec("l_discount"),
        _dec("l_tax"),
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), 2)
        .cast("double")
        .alias("sum_charge"),
        (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
        (F.sum(price).cast("double") / cnt).alias("avg_price"),
        (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


_Q3_SQL = """
SELECT o.o_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '1998-03-15'
  AND l.l_shipdate > DATE '1996-03-15'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@q("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    customer is small relative to lineitem → broadcast it (the reference's
    dictionary-broadcast idiom, scripts/pipeline/03-...py:114-120). orders⋈
    lineitem stays a shuffle join on the natural key; AQE can re-plan to
    broadcast post-filter at runtime.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(
            o, li.l_orderkey == o.o_orderkey, "inner"
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q5_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@q("q5_region_revenue", _Q5_SQL)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcastable dim chains.

    region/nation/customer/supplier are all dims → broadcast; lineitem⋈
    orders is the only shuffle. The s_nationkey = c_nationkey predicate is
    the reference's J15-style multi-source corroboration join.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_SEQ_SQL = """
SELECT l_orderkey,
       COUNT(*) AS n_lines,
       MAX(l_linenumber) AS max_line,
       CAST(MAX(l_linenumber) - COUNT(DISTINCT l_linenumber) AS INT) AS n_missing,
       CAST(COUNT(*) - COUNT(DISTINCT l_linenumber) AS INT) AS n_dup_lines
FROM lineitem
GROUP BY l_orderkey
HAVING MAX(l_linenumber) <> COUNT(DISTINCT l_linenumber)
    OR COUNT(*) <> COUNT(DISTINCT l_linenumber)
"""


@q("a_sequence_gaps", _SEQ_SQL)
def a_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Track-sequence anomaly report (A4, scripts/reports/93-...py:213-271):
    per group, detect gaps via sequence(1,max) EXCEPT observed, and dups.

    Spark side uses the reference's literal semantics — collect_set +
    sequence + array_except — while the oracle proves the arithmetic
    identity (missing = max - distinct when values ∈ 1..max).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.max("l_linenumber").alias("max_line"),
            F.collect_set("l_linenumber").alias("seen"),
        )
        .withColumn(
            "n_missing",
            F.size(
                F.array_except(F.sequence(F.lit(1), F.col("max_line")), F.col("seen"))
            ),
        )
        .withColumn("n_dup_lines", (F.col("n_lines") - F.size("seen")).cast("int"))
        .filter((F.col("n_missing") > 0) | (F.col("n_dup_lines") > 0))
        .select("l_orderkey", "n_lines", "max_line", "n_missing", "n_dup_lines")
    )


_SIG_SQL = """
WITH parts AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sigs AS (
  SELECT l_orderkey, STRING_AGG(l_partkey, ',' ORDER BY l_partkey) AS part_sig
  FROM parts GROUP BY l_orderkey
)
SELECT part_sig, COUNT(*) AS n_orders, MIN(l_orderkey) AS keeper_orderkey
FROM sigs GROUP BY part_sig HAVING COUNT(*) > 1
"""


@q("a_album_signature", _SIG_SQL)
def a_album_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-album detection (A8, scripts/reports/97-...py:186-230):
    per-group sorted member signature → groups sharing a signature →
    deterministic keeper (min key; the reference keeps min(mtime, path)).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sigs = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("l_partkey"))).alias(
                "part_sig"
            )
        )
    )
    return (
        sigs.groupBy("part_sig")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("l_orderkey").alias("keeper_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
    )


_MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM counts
)
SELECT user_id, event_type AS mode_event, n AS mode_count
FROM ranked WHERE rn = 1
"""


@q("a_mode_per_group", _MODE_SQL)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode-per-group (A11, scripts/reports/92-library-insights.py:176-200):
    count per (group,value) → argmax window with deterministic tie-break —
    the reference's sort-desc-take-first idiom made shuffle-safe.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("n").alias("mode_count"),
        )
    )


_TWOLVL_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_total
  FROM orders GROUP BY o_custkey
)
SELECT COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(avg_total AS DECIMAL(28,10))) / COUNT(*), 4) AS DOUBLE) AS avg_of_avg
FROM per_cust
"""


@q("a_two_level_avg", _TWOLVL_SQL)
def a_two_level_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregate (A10, src/tagminder/core/tm_snapshots.py:157-218):
    album-level ratios averaged globally. Two groupBys; the inner keeps
    exact decimal sums so the outer average is engine-deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_total"
        )
    )
    return per_cust.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(F.col("avg_total").cast("decimal(28,10)")) / F.count(F.lit(1)), 4
        )
        .cast("double")
        .alias("avg_of_avg"),
    )


_DECADE_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(FLOOR(YEAR(o_orderdate) / 10) * 10 AS INT) AS order_decade,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders GROUP BY 1, 2
"""


@q("a_decade_rollup", _DECADE_SQL)
def a_decade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeline rollup (A15, 92-library-insights.py:1685-1800): derived
    year/decade grouping keys (the shared decade() expression)."""
    from tagminder_spark.functions.dates import decade

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .withColumn("order_decade", decade("order_year"))
        .groupBy("order_year", "order_decade")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders GROUP BY o_orderpriority
"""


@q("a_pivot_status", _PIVOT_SQL)
def a_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-to-wide (A19, scripts/pipeline/22-...py:1117-1123: role-match
    counts pivoted). Explicit pivot values keep the schema static — at
    scale an unbounded pivot(value-discovery) pass would be a full extra
    job."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
        .select(
            "o_orderpriority",
            F.col("O").alias("n_open"),
            F.col("F").alias("n_finished"),
            F.col("P").alias("n_pending"),
        )
    )


_COLLECT_SQL = """
WITH d AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
SELECT c_nationkey, STRING_AGG(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
FROM d GROUP BY c_nationkey
"""


@q("a_collect_set_sorted", _COLLECT_SQL)
def a_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted join (A20, harvest_mb_works.py:526-600 role
    name-set emission; A6 normalized token-set signatures)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias(
            "segments"
        )
    )


_PCTL_SQL = """
SELECT l_returnflag,
       CAST(ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS DOUBLE) AS median_qty,
       CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.9) - QUANTILE_CONT(l_extendedprice, 0.1), 4) AS DOUBLE) AS price_spread,
       CAST(ROUND(20 * LOG10(MAX(l_extendedprice)), 4) AS DOUBLE) AS max_price_db
FROM lineitem GROUP BY l_returnflag
"""


@q("a_percentiles", _PCTL_SQL)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile aggregates (A14, 92-library-insights.py:1280-1390): median,
    p90-p10 spread, and the reference's 20*log10 dBFS derivation. Exact
    `percentile` matches DuckDB's QUANTILE_CONT interpolation; at 100 TB
    swap to approx_percentile and record tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4)
        .cast("double")
        .alias("median_qty"),
        F.round(
            F.percentile("l_extendedprice", F.lit(0.9))
            - F.percentile("l_extendedprice", F.lit(0.1)),
            4,
        )
        .cast("double")
        .alias("price_spread"),
        F.round(F.lit(20) * F.log10(F.max("l_extendedprice")), 4)
        .cast("double")
        .alias("max_price_db"),
    )


# --------------------------------------------------------------------------
# J: joins
# --------------------------------------------------------------------------

_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@q("j_anti_join", _ANTI_SQL)
def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti (J11/S6, tags2db.py:955-977 --new-files): scanned-minus-
    existing set difference as a distributed anti-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@q("j_semi_join", _SEMI_SQL)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (J12/S12, 98-create-export-db.py:314-322: export only rows
    ever touched via IN (SELECT DISTINCT path FROM changelog))."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_BRAND_SQL = """
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""


@q("j_broadcast_dim", _BRAND_SQL)
def j_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join (J2, scripts/pipeline/03-...py:114-120
    case-map lookup): fact⋈dim with the dim shipped to every executor —
    no shuffle of the 100 TB side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_COOC_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS weight
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= 2
"""


@q("g_cooccurrence_edges", _COOC_SQL)
def g_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph edge build (J4/§2.9, src/tagminder/core/tm_graph.py:294-316):
    distinct (group,entity) → self-join within group → pair weights =
    distinct group co-occurrence. distinct-before-join bounds the blowup;
    at scale, cap per-group fan-out or pre-aggregate hot groups."""
    li = load_table(spark, sf_dir, "lineitem")
    # persist: both self-join sides otherwise recompute the scan+distinct
    # (measured 1.65 -> 1.05 s warm at sf0.1; exchange reuse does not fire
    # across the aliased sides)
    op = scoped_persist(li.select("l_orderkey", "l_partkey").distinct())
    a = op.alias("a")
    b = op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= 2)
    )


_NEIGH_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS weight
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
), ranked AS (
  SELECT src, dst, weight,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY weight DESC, dst) AS rn
  FROM edges
)
SELECT src, dst, weight, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= 3
"""


@q("g_top_neighbors", _NEIGH_SQL)
def g_top_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-list trim (§2.9, src/tagminder/ui/tm_artist_map.py:31-64 +
    tm_graph.py:446-449 sort by (-weight, name)): symmetrized edges, top-k
    per node via ranked window."""
    li = load_table(spark, sf_dir, "lineitem")
    op = scoped_persist(li.select("l_orderkey", "l_partkey").distinct())
    a = op.alias("a")
    b = op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    w = W.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    return (
        edges.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("src", "dst", "weight", "rn")
    )


# --------------------------------------------------------------------------
# W: window patterns (§2.5)
# --------------------------------------------------------------------------

_TOP1_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS top_orderkey,
       CAST(o_totalprice AS DOUBLE) AS top_totalprice
FROM ranked WHERE rn = 1
"""


@q("w_top1_per_group", _TOP1_SQL)
def w_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group (§2.5 pattern 1, scripts/pipeline/05-...py:146-150
    composer majority vote): row_number over (group, desc value, tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").cast("double").alias("top_totalprice"),
        )
    )


_PCT_SQL = """
WITH counts AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority, o_orderstatus, n,
       CAST(ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY o_orderpriority), 6) AS DOUBLE) AS pct_of_priority,
       CAST(ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6) AS DOUBLE) AS rev_share
FROM counts
"""


@q("w_pct_of_total", _PCT_SQL)
def w_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pct-of-total within class (§2.5 pattern 2, 92-library-insights.py:
    1127-1160 format-mix %): aggregate once, then a window sum over the
    class partition — no rejoin, one extra exchange at most."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("rev"),
    )
    wp = W.partitionBy("o_orderpriority")
    return counts.select(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6)
        .cast("double")
        .alias("pct_of_priority"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wp).cast("double"), 6
        )
        .cast("double")
        .alias("rev_share"),
    ).drop("rev")


_GRPCNT_SQL = """
WITH wc AS (
  SELECT user_id, event_type,
         COUNT(*) OVER (PARTITION BY user_id) AS user_events
  FROM events
)
SELECT user_id, event_type, COUNT(*) AS n, MAX(user_events) AS user_events
FROM wc WHERE user_events >= 60 GROUP BY user_id, event_type
"""


@q("w_group_count_attached", _GRPCNT_SQL)
def w_group_count_attached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-count attached to rows (§2.5 pattern 3 / J3, scripts/pipeline/
    12-...py:89-93 artist-count rejoin): a count window replaces the
    groupBy+rejoin, halving the shuffles."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    return (
        ev.withColumn("user_events", F.count(F.lit(1)).over(w))
        .filter(F.col("user_events") >= 60)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"), F.max("user_events").alias("user_events")
        )
    )


_SESS_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id,
       CAST(1 + SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


@q("t_sessionize", _SESS_SQL)
def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (no reference analogue — §2.11 notes the reference is
    batch-only; this is the training-pipeline event-stream pattern): lag +
    gap>threshold + running sum. Streaming twin: session_window(ts, gap)
    in tagminder_spark.streaming."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        ev.withColumn(
            "new_sess", F.when(gap > 30 * 60, F.lit(1)).otherwise(F.lit(0))
        )
        .groupBy("user_id")
        .agg(
            (F.lit(1) + F.sum("new_sess")).cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# S: set operations (§2.7)
# --------------------------------------------------------------------------

_SETOPS_SQL = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
UNION ALL
SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
UNION ALL
SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
"""


@q("s_set_operations", _SETOPS_SQL)
def s_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / EXCEPT / INTERSECT (§2.7, tm_graph.py:215 concat,
    tags2db.py:1038-1042 set difference, 18-...py:913-931 intersection)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    cust_only = c.exceptAll(s).withColumn("tag", F.lit("cust_only"))
    supp_only = s.exceptAll(c).withColumn("tag", F.lit("supp_only"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    return cust_only.unionByName(supp_only).unionByName(both).select("tag", "nk")
