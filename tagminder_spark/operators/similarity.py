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


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 4,
) -> DataFrame:
    """Distributed spherical k-means (Lloyd's) for IVF centroids.

    Each iteration assigns every unit vector to its nearest centroid with
    a map-side fold over the centroid array, which arrives as DATA — a
    broadcast one-row frame — not as a k×dim literal tree (optimization
    round 13): the literal form re-ran Catalyst analysis and codegen on a
    ~2k-node expression every iteration (new literal values → new plan →
    new generated source), which dominated training wall-clock at any
    corpus size; the data form keeps one small constant-shape plan per
    iteration. The fold expression itself is unchanged, so assignments
    and the per-dimension means are bit-identical to the literal form.
    The only shuffle per iteration is the k-group aggregate computing
    per-dimension means as ``k × dim`` agg columns, with map-side partial
    aggregation. Unit vectors are cached once across iterations. Centroids (k rows) are collected to the driver
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
        cent_schema = "c array<struct<cell_id:int,cv:array<double>>>"
        for _ in range(iters):
            arr = [
                {"cell_id": int(cid), "cv": [float(x) for x in vec]}
                for cid, vec in sorted(cent_rows, key=lambda r: r[0])
            ]
            cent_one = spark.createDataFrame([(arr,)], cent_schema)
            # same argmax as _nearest_cell, over the data column: max
            # struct keeps the largest neg_cid = smallest cell_id on sim
            # ties, matching orderBy(desc(sim), asc(cell_id))
            # named_struct, not struct(...).alias(...): inside an HOF
            # lambda Spark 4 can drop the aliases (col1/col2), breaking
            # the field access below — the repo's known lambda-alias
            # quirk.
            scored = F.transform(
                F.col("c"),
                lambda c: F.named_struct(
                    F.lit("sim"), _dot(F.col("v"), c["cv"]),
                    F.lit("neg_cid"), -c["cell_id"],
                ),
            )
            cell = -F.array_max(scored)["neg_cid"]
            # per-cell mean via ONE vector-sum aggregate (count +
            # elementwise fold over collect_list), not dim separate
            # avg(v[i]) columns: the k×dim-column agg cost ~1-2 s of
            # py4j expression construction plus ~1 s of analysis per
            # iteration — this shape is three expressions. collect_list
            # preserves partition row order, so the fold adds the same
            # values in the same order as the column-wise avg and the
            # means stay bit-identical (pinned by the centroid-hash
            # check run for this change); the final sum/count division
            # happens driver-side with the same IEEE semantics.
            zeros = F.array(*[F.lit(0.0)] * dim)
            vsum = F.aggregate(
                F.collect_list("v"),
                zeros,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            )
            means = (
                unit.crossJoin(F.broadcast(cent_one))
                .select(cell.alias("cell_id"), "v")
                .groupBy("cell_id")
                .agg(F.count(F.lit(1)).alias("n"), vsum.alias("s"))
            )
            new_rows = [
                (r["cell_id"], [x / r["n"] for x in r["s"]])
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
    # Centroids are tiny by construction — collect once and ship them as
    # DATA on a broadcast one-row frame (at 100 TB this is a broadcast
    # variable; the old crossJoin+window plan shuffled the full n × k
    # expansion). Round 13: the previous literal-array form inlined the
    # k×dim floats into the plan TWICE (assign + probe), costing ~1 s of
    # Catalyst analysis per run; the data form is the same fold over the
    # same values — assignments and probe order are bit-identical
    # (oracle-pinned by ann_ivf_topk).
    cent_rows = [
        (int(r["cell_id"]), list(r["cv"]), float(r["cn"])) for r in seeds.collect()
    ]
    spark = base.sparkSession
    cent_one = spark.createDataFrame(
        [([
            {"cell_id": cid, "cv": [float(x) for x in cv], "cn": cn}
            for cid, cv, cn in sorted(cent_rows, key=lambda r: r[0])
        ],)],
        "c array<struct<cell_id:int,cv:array<double>,cn:double>>",
    )

    def cos_to_cell(vec: str, nrm: str):
        return lambda c: F.round(
            _dot(F.col(vec), c["cv"]) / (F.col(nrm) * c["cn"]), 6
        )

    # nearest cell per corpus vector: map-side argmax over the broadcast
    # centroid array, deterministic ties (max struct keeps the largest
    # neg_cid = smallest cell_id). named_struct, not struct().alias():
    # HOF-lambda aliases can be dropped in Spark 4 (repo's known quirk).
    nearest = -F.array_max(
        F.transform(
            F.col("c"),
            lambda c: F.named_struct(
                F.lit("sim"), cos_to_cell("v", "norm")(c),
                F.lit("neg_cid"), -c["cell_id"],
            ),
        )
    )["neg_cid"]
    assigned = base.crossJoin(F.broadcast(cent_one)).select(
        "id", "v", "norm", nearest.alias("cell_id"),
    )
    # queries probe their nprobe nearest cells: sort the scored centroid
    # array ascending on (-sim, cell_id) — same order as the old
    # orderBy(desc(sim), asc(cell_id)) window — then explode the head.
    probe_cells = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("c"),
                    lambda c: F.named_struct(
                        F.lit("nsim"), -cos_to_cell("qv", "qn")(c),
                        F.lit("cell_id"), c["cell_id"],
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
        .crossJoin(F.broadcast(cent_one))
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
