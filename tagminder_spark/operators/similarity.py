"""Vector similarity search: brute-force top-k baseline + IVF scale path.

Both are pure DataFrame programs: dot products are left-fold ``aggregate``
expressions over double arrays (deterministic, engine-portable IEEE math),
top-k is a ranked window with full tie-breaks.

- ``brute_topk``: query set × corpus cross join. Correct at any scale but
  O(|Q|·|C|); fine when |Q| is small (the reranker case).
- ``ivf_topk``: corpus assigned to its nearest seed centroid (one pass),
  queries probe only their ``nprobe`` nearest cells — the classic IVF
  trade: recall loss only when a true neighbor lives in an unprobed cell.
  Deterministic seed choice (fixed id set) keeps it oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def brute_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k for each query id against the whole corpus."""
    base = _with_norm(df, id_col, vec_col)
    q = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    joined = F.broadcast(q).crossJoin(base).filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    seed_ids: list[int],
    query_ids: list[int],
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Cells are defined by fixed seed vectors (deterministic stand-in for
    k-means centroids — at scale, train centroids offline and broadcast).
    Every corpus vector is assigned to its nearest seed; each query probes
    its ``nprobe`` nearest cells and ranks only those members.
    """
    base = _with_norm(df, id_col, vec_col)
    seeds = base.filter(F.col("id").isin(seed_ids)).select(
        F.col("id").alias("cell_id"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    sim_to_cell = F.round(
        _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn")), 6
    )
    # nearest cell per corpus vector (rank over cells; deterministic ties)
    assign_w = W.partitionBy("id").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    assigned = (
        base.crossJoin(F.broadcast(seeds))
        .withColumn("cell_sim", sim_to_cell)
        .withColumn("cell_rank", F.row_number().over(assign_w))
        .filter(F.col("cell_rank") <= 1)
        .select("id", "v", "norm", "cell_id")
    )
    # queries probe their nprobe nearest cells
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    probes = (
        base.filter(F.col("id").isin(query_ids))
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
        )
        .crossJoin(F.broadcast(seeds))
        .withColumn(
            "cell_sim",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "qn", "cell_id")
    )
    scored = (
        probes.join(assigned, "cell_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
