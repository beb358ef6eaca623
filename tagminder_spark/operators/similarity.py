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


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the 4x memory
    reduction a 100 TB vector store takes before ANN serving: scale =
    127 / max|x| (per vector, so no global pass), q_i = round(x_i *
    scale) clamped to [-127, 127], plus the max absolute reconstruction
    error for quality monitoring. Map-only higher-order functions, zero
    shuffle; the zero vector quantizes to zeros with scale 0 (decode
    treats scale 0 as all-zero).

    Dequantization is x̂_i = q_i / scale; downstream cosine on int8
    with per-vector scales is the standard serving path (the scales
    cancel in the cosine's normalization).
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.round(x.cast("double") * scale).cast("int"),
            ),
        ).cast("tinyint"),
    )
    # max_i |x_i - q_i/scale| — the reconstruction-error monitor
    err = F.when(
        amax > 0,
        F.aggregate(
            F.zip_with(
                v, q, lambda x, qq: F.abs(x.cast("double") - qq / scale)
            ),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        ),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        q.alias("q8"),
        F.round(scale, 6).cast("double").alias("scale"),
        F.round(err, 6).cast("double").alias("max_abs_err"),
    )


def _cent_array(cent_rows: list[tuple]) -> Column:
    """Centroids as one constant-folded literal ``array<struct>`` — the
    local-mode stand-in for a broadcast variable. Sorted by cell_id so
    argmax tie-breaks (max struct keeps the LARGEST neg_cid = smallest
    cell_id) match ``orderBy(desc(sim), asc(cell_id))`` exactly."""
    return F.array(
        *[
            F.struct(
                F.lit(int(row[0])).alias("cell_id"),
                F.array(*[F.lit(float(x)) for x in row[1]]).alias("cv"),
                F.lit(float(row[2]) if len(row) > 2 else 1.0).alias("cn"),
            )
            for row in sorted(cent_rows, key=lambda r: r[0])
        ]
    )


def _nearest_cell(cent_rows: list[tuple], sim_of) -> Column:
    """Map-side argmax over the literal centroid array: NO crossJoin, NO
    per-id window shuffle. At 100 TB the old plan shuffled n × k array
    rows per assignment; this evaluates k dot products per row inside
    whole-stage codegen and emits one int."""
    scored = F.transform(
        _cent_array(cent_rows),
        lambda c: F.struct(
            sim_of(c).alias("sim"), (-c["cell_id"]).alias("neg_cid")
        ),
    )
    return -F.array_max(scored)["neg_cid"]


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 4,
) -> DataFrame:
    """Distributed spherical k-means (Lloyd's) for IVF centroids.

    Each iteration assigns every unit vector to its nearest centroid with
    a map-side fold over the broadcast-literal centroid array (no
    crossJoin, no window — the only shuffle per iteration is the k-group
    aggregate computing per-dimension means as ``k × dim`` agg columns,
    with map-side partial aggregation). Unit vectors are cached once
    across iterations. Centroids (k rows) are collected to the driver
    between iterations, which both truncates lineage and matches how
    trained centroids would be broadcast at 100 TB. Init is
    deterministic: the k smallest ids. Means are float aggregations, so
    results are stable only up to partial-agg order — this trains the
    index; it is not an oracle-checked operator (the oracle-checked IVF
    gate keeps fixed seed centroids).

    Returns a DataFrame (cell_id int, cv array<double>, cn double) ready
    for :func:`ivf_topk_with_centroids`.
    """
    spark = df.sparkSession
    base = _with_norm(df, id_col, vec_col)
    unit = base.select(
        "id", F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("v")
    ).persist()
    try:
        init = [
            (i, list(r["v"]))
            for i, r in enumerate(unit.orderBy("id").limit(k).collect())
        ]
        dim = len(init[0][1])
        cent_rows = init
        for _ in range(iters):
            cell = _nearest_cell(
                cent_rows, lambda c: _dot(F.col("v"), c["cv"])
            )
            means = (
                unit.select(cell.alias("cell_id"), "v")
                .groupBy("cell_id")
                .agg(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)])
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
            cent_rows = [(cid, kept.get(cid, vec)) for cid, vec in cent_rows]
    finally:
        unit.unpersist()
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
    # Centroids are tiny by construction — collect once and inline them
    # as a broadcast literal (at 100 TB this is a broadcast variable; the
    # old crossJoin+window plan shuffled the full n × k expansion).
    cent_rows = [
        (int(r["cell_id"]), list(r["cv"]), float(r["cn"])) for r in seeds.collect()
    ]

    def cos_to_cell(vec: str, nrm: str):
        return lambda c: F.round(
            _dot(F.col(vec), c["cv"]) / (F.col(nrm) * c["cn"]), 6
        )

    # nearest cell per corpus vector: map-side argmax, deterministic ties
    assigned = base.select(
        "id", "v", "norm",
        _nearest_cell(cent_rows, cos_to_cell("v", "norm")).alias("cell_id"),
    )
    # queries probe their nprobe nearest cells: sort the scored centroid
    # array ascending on (-sim, cell_id) — same order as the old
    # orderBy(desc(sim), asc(cell_id)) window — then explode the head.
    probe_cells = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    _cent_array(cent_rows),
                    lambda c: F.struct(
                        (-cos_to_cell("qv", "qn")(c)).alias("nsim"),
                        c["cell_id"].alias("cell_id"),
                    ),
                )
            ),
            1,
            nprobe,
        ),
        lambda s: s["cell_id"],
    )
    probes = (
        base.filter(F.col("id").isin(query_ids))
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
        )
        .select(
            "query_id", "qv", "qn", F.explode(probe_cells).alias("cell_id")
        )
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
