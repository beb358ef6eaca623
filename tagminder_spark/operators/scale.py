"""Skew/scale utilities (SURVEY §4; the 100 TB story).

AQE's skew-join splitting handles join-side skew automatically (enabled
in session.py); this module covers the remaining case: *aggregation* over
heavily skewed grouping keys (e.g. grouping a 100 TB corpus by language,
where one key holds half the rows). ``salted_agg`` is the standard
two-phase rewrite — partial aggregate over (key, salt) so every reducer
gets bounded input, then final combine over key. Results are identical to
the direct groupBy (sums ride in DECIMAL so re-association cannot change
the value), only the shuffle layout differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, from_col: str | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a high-cardinality
    column if given, else a round-robin over the partition's rows (salt
    choice never affects results — only reducer balance)."""
    if from_col is not None:
        salt = F.pmod(F.crc32(F.col(from_col).cast("string")), F.lit(buckets))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    return df.withColumn("__salt", salt.cast("int"))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) rewritten skew-safe.

    Phase 1 aggregates (keys, salt) — at most ``buckets`` partial rows
    per key regardless of skew; phase 2 combines per key. DECIMAL sums
    make the two-phase result bit-identical to the direct plan.
    """
    salted = with_salt(df, buckets, salt_from)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(F.col(value_col).cast("decimal(28,4)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__s").alias(f"sum_{value_col}"),
        F.sum("__n").alias("n_rows"),
    )


def top_k_per_key_salted(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    buckets: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Skew-safe per-key top-k: local top-k inside each (key, salt)
    bucket first (cheap, bounded), then exact top-k over the ≤ buckets*k
    survivors. Equivalent to a global window row_number ≤ k, but a hot
    key never funnels through one reducer twice. Pass ``tiebreak`` for a
    deterministic order when ``order_col`` has duplicates — without it,
    ties at the k boundary resolve arbitrarily (as in the direct plan).
    """
    from pyspark.sql import Window as W

    order = [F.desc(order_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    salted = with_salt(df, buckets, from_col=tiebreak or order_col)
    w1 = W.partitionBy(key, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = W.partitionBy(key).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+sorted) datasource table. Two tables
    bucketed on the same keys with the same bucket count join WITHOUT a
    shuffle exchange — the co-located fact-fact join strategy for the
    repeated alib↔changelog / alib↔works joins at 100 TB (pre-shuffle
    once at write time, reuse forever)."""
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(buckets, *keys).sortBy(*keys).saveAsTable(table)
