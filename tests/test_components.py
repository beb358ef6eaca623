"""Connected-components equivalence: small-star/large-star vs min-label."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tagminder_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _as_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_star_matches_label_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(80 + 40 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        lab = _as_map(connected_components(pairs, max_iter=50))
        star = _as_map(connected_components_star(pairs, max_iter=30))
        assert star == lab


def test_star_converges_on_long_chain(spark):
    """A 3000-node path has diameter 2999 — linear for min-label, but the
    star rounds collapse it logarithmically."""
    n = 3000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components_star(pairs, max_iter=30)
    assert out.count() == n
    assert out.filter(F.col("component") != 0).count() == 0


def test_star_handles_duplicate_and_reversed_edges(spark):
    pairs = spark.createDataFrame(
        [(5, 2), (2, 5), (2, 5), (9, 9), (7, 8)], ["id_a", "id_b"]
    )
    got = _as_map(connected_components_star(pairs))
    assert got == {2: 2, 5: 2, 7: 7, 8: 7}
