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
    require_convergence: bool = False,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``pairs`` is an undirected edge list (each pair once, any order);
    isolated nodes simply don't appear (callers union them back with
    component = their own id if needed).

    The loop exits at the fixpoint (no label changed), so ``max_iter``
    only matters for components whose diameter exceeds it. With
    ``require_convergence=True`` hitting the cap raises instead of
    silently returning truncated propagation — the mode the value-exact
    e2e gates use (their oracle is an exact transitive closure). For
    corpora where diameters can chain adversarially, prefer
    :func:`connected_components_star` (O(log d) rounds).

    ``checkpointer`` (e.g. ``lambda d: d.checkpoint()`` after
    ``sparkContext.setCheckpointDir``) truncates label lineage every
    ``checkpoint_every`` rounds: persist keeps the DATA hot but the
    logical plan still deepens per iteration, and on a cluster a
    reliable checkpoint also survives executor loss mid-propagation.
    Default None keeps the persist-only behavior — right for the short
    diameters of near-dup clusters at gate scale.

    Checkpointer contract: it receives the round's full label frame —
    ``(node, component, __changed)`` — and MUST return it with ALL
    columns intact (``__changed`` drives the convergence check). A
    checkpointer that normalizes to the documented two-column output
    schema (e.g. round-trips through a fixed-schema table) will raise
    ``AnalysisException`` here; wrap it to pass unknown columns through.
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
            new_component = F.least(
                F.col("component"), F.coalesce("nmin", F.col("component"))
            )
            new_labels = labels.join(neighbor_min, "node", "left").select(
                "node",
                new_component.alias("component"),
                # labels are monotonically non-increasing, so "changed"
                # is exactly "new < old" — computed IN the round's plan
                # so the convergence check below needs no join against
                # the previous labels frame (round 13: the old
                # join+limit(1).count() was a SECOND job per round; the
                # flag + full count folds materialization and the check
                # into one job per round)
                (new_component < F.col("component")).alias("__changed"),
            )
            # Lineage MUST be truncated every round, not just cached: the
            # round's plan references the previous labels frame several
            # times, so the logical plan multiplies per iteration —
            # persist caches data but analysis/optimization still walks
            # the exponentially-growing tree (measured 13 s → 36 s →
            # 222 s per round by iteration 7, ending in a JVM stack
            # overflow printing the plan). localCheckpoint cuts the plan
            # to a leaf (lazy: the changed-count below materializes every
            # partition — a full count, deliberately not limit(1), which
            # would leave the checkpoint partially computed and re-run
            # the fill from lineage); a supplied reliable checkpointer
            # replaces it every checkpoint_every rounds for
            # executor-loss safety.
            if checkpointer is not None and (it + 1) % checkpoint_every == 0:
                new_labels = checkpointer(new_labels)
            else:
                new_labels = new_labels.localCheckpoint(eager=False)
            changed = new_labels.filter(F.col("__changed")).count()
            if it == 0:
                # only the round-0 labels frame is cache-manager persisted;
                # later rounds are checkpoint frames, whose blocks are NOT
                # in the cache manager — DataFrame.unpersist is a no-op on
                # them and reclamation relies on the ContextCleaner once
                # this loop drops the reference (bounded: at most one
                # round's blocks are unreferenced at a time).
                labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            if require_convergence:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iter} "
                    "rounds — a component's diameter exceeds the budget; "
                    "raise max_iter or use connected_components_star"
                )
        return labels.select("node", "component")
    finally:
        edges.unpersist()


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    checkpointer=None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds.

    The O(log d)-round alternative to plain min-label propagation
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    large-star hooks every neighbor larger than a node onto the minimum
    of its full neighborhood; small-star re-hooks each node and its
    smaller parents onto the minimum parent. Tree heights roughly halve
    per alternation, so convergence is logarithmic in component diameter
    instead of linear. Use this when duplicate clusters can chain
    arbitrarily (adversarial corpora); `connected_components` stays the
    cheaper choice for the short diameters of organic near-dup clusters.

    The edge state is a canonical child→parent map (parent < child,
    both star steps preserve the invariant); at the fixpoint it is a
    star forest child→component-min. Same contract as
    `connected_components`: component = min node id; isolated nodes
    (absent from ``pairs``) don't appear.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("child"), F.least("u", "v").alias("parent")
        )
        .dropDuplicates()
        .persist()
    )
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .dropDuplicates()
        .persist()
    )

    def _large(e: DataFrame) -> DataFrame:
        # for each u: m = min(neighborhood(u) + {u}); hook every LARGER
        # neighbor onto m. (m <= u < w, so child>parent is preserved.)
        sym = e.select(F.col("child").alias("u"), F.col("parent").alias("w")).unionByName(
            e.select(F.col("parent").alias("u"), F.col("child").alias("w"))
        )
        m = sym.groupBy("u").agg(F.least(F.min("w"), F.first("u")).alias("m"))
        return (
            sym.filter(F.col("w") > F.col("u"))
            .join(m, "u")
            .select(F.col("w").alias("child"), F.col("m").alias("parent"))
            .dropDuplicates()
        )

    def _small(e: DataFrame) -> DataFrame:
        # for each child u with parents P(u): m = min(P(u)); hook u and
        # every other parent onto m. (parents < u and m = their min.)
        m = e.groupBy("child").agg(F.min("parent").alias("m"))
        own = m.select("child", F.col("m").alias("parent"))
        siblings = (
            e.join(m, "child")
            .filter(F.col("parent") != F.col("m"))
            .select(F.col("parent").alias("child"), F.col("m").alias("parent"))
        )
        return own.unionByName(siblings).dropDuplicates()

    try:
        for it in range(max_iter):
            new_edges = _small(_large(edges))
            # per-round lineage truncation — the star steps reference the
            # previous edge frame ~4x each, so the plan tree multiplies
            # per iteration; see the matching note in connected_components
            if checkpointer is not None and (it + 1) % checkpoint_every == 0:
                new_edges = checkpointer(new_edges)
            else:
                new_edges = new_edges.localCheckpoint(eager=True)
            # converged when the child->parent map is unchanged (the star
            # forest is the unique fixpoint): symmetric difference empty
            changed = (
                new_edges.join(edges, ["child", "parent"], "left_anti")
                .limit(1)
                .count()
                + edges.join(new_edges, ["child", "parent"], "left_anti")
                .limit(1)
                .count()
            )
            if it == 0:
                # same reclamation note as connected_components: only the
                # round-0 frame is cache-manager persisted; checkpoint-frame
                # blocks are freed by the ContextCleaner after the reference
                # drops here.
                edges.unpersist()
            edges = new_edges
            if changed == 0:
                break
        comp = edges.select(
            F.col("child").alias("node"), F.col("parent").alias("component")
        )
        roots = nodes.join(
            edges.select(F.col("child").alias("node")), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
        return comp.unionByName(roots)
    finally:
        edges.unpersist()
        nodes.unpersist()
