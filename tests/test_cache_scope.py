"""Ownership contract for operator-internal caches (round-6 VERDICT #2):
the nine round-5 persist() sites must not leak blocks for the session
lifetime. cache_scope() gives deterministic zero-residue; the bounded
session registry caps accumulation for callers who skip the scope."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _residual(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _sweep(spark) -> None:
    # test setup only: clear whatever earlier tests in the shared session
    # left cached, so the assertions below measure THIS test's residue
    for _rid, rdd in dict(
        spark.sparkContext._jsc.getPersistentRDDs()
    ).items():
        rdd.unpersist()


def test_cache_scope_zero_residual_for_gate_paths(spark):
    """Three gates whose operators persist internally (minhash band frame
    + shingles, simhash band frame, embedding-LSH bands + norms, ER's
    normalized inputs and eager phase checkpoints), each consumed inside
    a cache_scope: ZERO cached RDD blocks remain after exit — no
    bench-level sweep involved."""
    from tagminder_spark.cache import cache_scope
    from tagminder_spark.queries.dedup import REGISTRY as DEDUP
    from tagminder_spark.queries.er_q import REGISTRY as ER

    _sweep(spark)
    gates = [DEDUP["d_minhash_lsh"][0], DEDUP["d_embedding_lsh"][0], ER["er_five_phase"][0]]
    for fn in gates:
        with cache_scope(spark):
            assert len(fn(spark, SF_DIR).toPandas()) > 0
        assert _residual(spark) == 0


def test_session_registry_is_bounded(spark):
    """Without a scope, scoped_persist frames accumulate only up to
    MAX_SESSION_FRAMES — the oldest are evicted (unpersisted), so a
    long-lived session invoking operators forever stays bounded."""
    from tagminder_spark import cache

    _sweep(spark)
    cache.release_session_caches()
    for i in range(cache.MAX_SESSION_FRAMES + 10):
        cache.scoped_persist(spark.range(i + 1).selectExpr("id", f"{i} as tag"))
    assert len(cache._SESSION) == cache.MAX_SESSION_FRAMES
    assert cache.release_session_caches() == cache.MAX_SESSION_FRAMES
    # release is idempotent and leaves the registry empty
    assert cache.release_session_caches() == 0


def test_scoped_persist_still_caches_inside_plan(spark):
    """The scope must not defeat the point of the persist: inside the
    scope the frame is actually cached (InMemoryTableScan in the plan of
    a consumer), outside it is gone."""
    from tagminder_spark.cache import cache_scope, scoped_persist

    _sweep(spark)
    with cache_scope(spark):
        base = scoped_persist(spark.range(100).selectExpr("id", "id * 2 as v"))
        base.count()  # fill
        joined = base.alias("a").join(base.alias("b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert joined.count() == 100
    assert _residual(spark) == 0
