"""Connected components over near-duplicate pair edges.

The dedup operators emit *pairs* (exact, n-gram Jaccard, MinHash-LSH,
SimHash, embedding cosine); a training-data pipeline then needs the
transitive closure — duplicate *clusters* — to elect one canonical
document per group. This is iterative min-label propagation over the
symmetrized edge list: every node adopts the smallest label among itself
and its neighbors until fixpoint.

Scale notes: each iteration is one join + one aggregate keyed by node;
iterations needed = component diameter (near-dup clusters are short —
chains longer than a handful of hops are rare, and ``max_iter`` bounds
the work). For adversarial diameters the alternating small-star/
large-star algorithm (O(log n) rounds) drops in behind the same
signature; label frames are persisted per round and unpersisted after to
keep lineage short (lineage growth, not data volume, is the classic
iterative-algorithm failure mode on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpointer=None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``pairs`` is an undirected edge list (each pair once, any order);
    isolated nodes simply don't appear (callers union them back with
    component = their own id if needed).

    ``checkpointer`` (e.g. ``lambda d: d.checkpoint()`` after
    ``sparkContext.setCheckpointDir``) truncates label lineage every
    ``checkpoint_every`` rounds: persist keeps the DATA hot but the
    logical plan still deepens per iteration, and on a cluster a
    reliable checkpoint also survives executor loss mid-propagation.
    Default None keeps the persist-only behavior — right for the short
    diameters of near-dup clusters at gate scale.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .persist()
    )
    try:
        for it in range(max_iter):
            # neighbor-min pass: every node adopts min(own, neighbors')
            neighbor_min = (
                edges.join(labels, edges["b"] == labels["node"])
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("nmin", F.col("component"))
                    ).alias("component"),
                )
                .persist()
            )
            if checkpointer is not None and (it + 1) % checkpoint_every == 0:
                new_labels = checkpointer(new_labels)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("node", "component")
    finally:
        edges.unpersist()
