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


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 4,
) -> DataFrame:
    """Distributed spherical k-means (Lloyd's) for IVF centroids.

    Each iteration is one crossJoin-with-broadcast assignment (k tiny)
    plus one groupBy computing per-dimension means as ``k × dim`` agg
    columns — NO explode, one shuffle per iteration. Centroids (k rows)
    are collected to the driver between iterations, which both truncates
    lineage and matches how trained centroids would be broadcast at
    100 TB. Init is deterministic: the k smallest ids. Means are float
    aggregations, so results are stable only up to partial-agg order —
    this trains the index; it is not an oracle-checked operator (the
    oracle-checked IVF gate keeps fixed seed centroids).

    Returns a DataFrame (cell_id int, cv array<double>, cn double) ready
    for :func:`ivf_topk_with_centroids`.
    """
    spark = df.sparkSession
    base = _with_norm(df, id_col, vec_col)
    unit = base.select(
        "id", F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("v")
    )
    dim = len(unit.select("v").first()["v"])

    init = [
        (i, r["v"])
        for i, r in enumerate(unit.orderBy("id").limit(k).collect())
    ]
    cent_rows = init
    for _ in range(iters):
        cent = spark.createDataFrame(
            cent_rows, "cell_id int, cv array<double>"
        )
        assign_w = W.partitionBy("id").orderBy(F.desc("sim"), F.asc("cell_id"))
        assigned = (
            unit.crossJoin(F.broadcast(cent))
            .withColumn("sim", _dot(F.col("v"), F.col("cv")))
            .withColumn("r", F.row_number().over(assign_w))
            .filter(F.col("r") == 1)
            .select("cell_id", "v")
        )
        means = assigned.groupBy("cell_id").agg(
            *[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)]
        )
        new_rows = [
            (r["cell_id"], [r[f"c{i}"] for i in range(dim)])
            for r in means.collect()
        ]
        # spherical: re-normalize the mean; empty cells keep their centroid
        kept = {}
        for cid, vec in new_rows:
            nrm = sum(x * x for x in vec) ** 0.5
            if nrm > 0:
                kept[cid] = [x / nrm for x in vec]
        cent_rows = [
            (cid, kept.get(cid, vec)) for cid, vec in cent_rows
        ]
    cent = spark.createDataFrame(cent_rows, "cell_id int, cv array<double>")
    return cent.select(
        "cell_id", "cv", F.sqrt(_dot(F.col("cv"), F.col("cv"))).alias("cn")
    )


def ivf_topk_with_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF top-k against an explicit centroid frame (cell_id, cv, cn) —
    the trained-index path (:func:`kmeans_train`); same probe/assign
    plan as :func:`ivf_topk`."""
    base = _with_norm(df, id_col, vec_col)
    return _ivf_probe(base, centroids, query_ids, k, nprobe)


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

    Cells are defined by fixed seed vectors (deterministic, oracle-
    reproducible; :func:`kmeans_train` is the trained-centroid upgrade).
    Every corpus vector is assigned to its nearest seed; each query probes
    its ``nprobe`` nearest cells and ranks only those members.
    """
    base = _with_norm(df, id_col, vec_col)
    seeds = base.filter(F.col("id").isin(seed_ids)).select(
        F.col("id").alias("cell_id"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    return _ivf_probe(base, seeds, query_ids, k, nprobe)


def _ivf_probe(
    base: DataFrame,
    seeds: DataFrame,
    query_ids: list[int],
    k: int,
    nprobe: int,
) -> DataFrame:
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
