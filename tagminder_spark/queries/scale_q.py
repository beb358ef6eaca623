"""Skew-safe aggregation queries (SURVEY §4 optimizer table: salting) and
the end-to-end pipeline chain.

The salted plans must produce bit-identical results to the direct
groupBy/window — the oracle IS the direct plan, so the gate proves the
rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.operators.scale import salted_sum_count, top_k_per_key_salted
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

D = "\\\\"


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_SALTED_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@q("a_salted_agg", _SALTED_SQL)
def a_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregate over a 3-value (maximally skewed)
    grouping key; the oracle is the direct GROUP BY — identical results,
    skew-safe shuffle layout (every reducer bounded by the salt)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li, ["l_returnflag"], "l_quantity", buckets=32, salt_from="l_orderkey"
    )
    return out.select(
        "l_returnflag",
        F.col("sum_l_quantity").cast("double").alias("sum_qty"),
        "n_rows",
    )


_TOPK_SQL = """
SELECT l_returnflag, l_orderkey, l_extendedprice
FROM (
  SELECT l_returnflag, l_orderkey, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey ASC) AS rn
  FROM (
    SELECT l_returnflag, l_orderkey,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS l_extendedprice
    FROM lineitem GROUP BY 1, 2
  )
) WHERE rn <= 5
"""


@q("w_topk_salted", _TOPK_SQL)
def w_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-key top-k (local top-k per salt bucket, exact
    top-k over survivors) vs the direct-window oracle; deterministic via
    the orderkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_orderkey").agg(
        F.max("l_extendedprice").cast("double").alias("l_extendedprice")
    )
    return top_k_per_key_salted(
        base,
        "l_returnflag",
        "l_extendedprice",
        k=5,
        buckets=8,
        tiebreak="l_orderkey",
    ).select("l_returnflag", "l_orderkey", "l_extendedprice")


@q("pl_chain_e2e", None)  # rows-only: five deterministic steps chained
def pl_chain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pipeline run (the reference's primary workload): a
    synthesized alib flows through steps 02→04→09→17→20 sequentially,
    then one diff-audit against the original produces the changelog;
    returns per-column change counts. Rows-only check by design — the
    oracle would be a five-step SQL re-implementation; the individual
    steps are each value-checked by their own gate queries."""
    from tagminder_spark.operators.diff_audit import diff_audit
    from tagminder_spark.pipeline import (
        step02_clean_text,
        step04_merge_writers,
        step09_live_markers,
        step17_dedupe_tags,
        step20_dates,
    )

    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    ln = F.col("l_linenumber")
    alib = li.select(
        F.concat(F.lit("p"), k, F.lit("-"), ln).alias("__path"),
        F.concat(
            F.lit("Song "),
            k,
            F.when(k % 4 == 0, F.lit(" (Live)")).otherwise(F.lit("")),
            F.when(k % 5 == 0, F.lit("\r\n")).otherwise(F.lit("")),
        ).alias("title"),
        F.when(k % 3 == 0, F.lit("  ")).otherwise(F.concat(F.lit("Sub "), ln)).alias(
            "subtitle"
        ),
        F.concat(F.lit("Album "), (k % 500).cast("string")).alias("album"),
        F.lit("0").alias("live"),
        F.concat(F.lit("C"), (k % 7).cast("string")).alias("composer"),
        F.when(k % 2 == 0, F.concat(F.lit("W"), (k % 7).cast("string"))).alias(
            "writer"
        ),
        F.lit(None).cast("string").alias("arranger"),
        F.lit(None).cast("string").alias("lyricist"),
        F.concat(
            F.lit("Rock"), F.lit(D), F.lit("Rock"), F.lit(D), F.lit("Pop")
        ).alias("genre"),
        F.lit(None).cast("string").alias("style"),
        F.lit(None).cast("string").alias("artist"),
        F.when(k % 2 == 0, F.concat(F.lit("1999-03-0"), (ln % 7 + 1).cast("string")))
        .otherwise(F.concat(F.lit("2001"), F.lit(D), F.lit("2001")))
        .alias("year"),
        F.lit(None).cast("string").alias("originalyear"),
        F.lit(0).alias("__sqlmodded"),
    )
    def chain(d):
        return step20_dates(
            step17_dedupe_tags(
                step09_live_markers(step04_merge_writers(step02_clean_text(d)))
            )
        )

    cols = ["title", "subtitle", "album", "live", "composer", "genre", "year"]
    # join-based diff on purpose: the five-step expression tree is deep,
    # and the in-row variant (diff_audit_inline) would inline THREE more
    # copies of it per tracked column — past whole-stage-codegen limits
    # into interpreted fallback. The join boundary keeps the chain
    # compiled once; inline is the right protocol for single steps.
    _, changelog = diff_audit(alib, chain(alib), "__path", cols, script="chain")
    return (
        changelog.groupBy("alib_column")
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .orderBy("alib_column")
    )
