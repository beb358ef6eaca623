"""Dedup-family properties: LSH recall vs exact, signature determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagminder_spark.operators.dedupe import (
    embedding_lsh_pairs,
    embedding_neardup_pairs,
    exact_dup_keepers,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from tagminder_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_exact_dup_total_assignment(docs):
    out = exact_dup_keepers(docs, "doc_id", "text")
    n = docs.count()
    assert out.count() == n
    # keeper is a member of its own group and <= every member id
    bad = out.filter(F.col("keeper_id") > F.col("id")).count()
    assert bad == 0


def test_minhash_recall_vs_exact(docs, spark):
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert lsh <= exact  # precision is exact by construction
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.9, f"LSH recall {recall:.2f} too low"


def test_simhash_symmetric_band_guarantee(docs):
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=6)
    row = pairs.agg(F.min("hamming"), F.max("hamming")).collect()[0]
    assert row[1] <= 6
    # id ordering convention holds
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_embedding_lsh_subset_of_brute_with_recall(spark):
    # the deliberately-narrow 4-bit recall configuration, pinned explicit
    # (defaults derive wider bands since round 6)
    emb = load_table(spark, SF_DIR, "embeddings")
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    lsh_df = embedding_lsh_pairs(
        emb, "vec_id", "embedding", dim=64, bits=32, bands=8, threshold=0.4,
        max_bucket=None,
    )
    lsh = {(r.id_a, r.id_b) for r in lsh_df.collect()}
    assert lsh <= brute  # exact verification ⇒ no false positives
    if brute:
        recall = len(lsh) / len(brute)
        assert recall >= 0.6, f"hyperplane-LSH recall {recall:.2f} too low"
    # the candidate path must be an equi-join, never a nested loop
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_derive_banding_rule():
    """r = clamp(ceil(log2(n/16)), 4, 24), bits = bands*r — the sizing
    rule BASELINE §8 derived from the sf1 saturation measurement, now
    code instead of docstring (round-6 VERDICT #1)."""
    from tagminder_spark.operators.dedupe import derive_banding

    assert derive_banding(500) == (40, 8)        # gate corpus: 5-bit bands
    assert derive_banding(20_000) == (88, 8)     # the sf1 saturation case
    assert derive_banding(10) == (32, 8)         # floor r=4
    assert derive_banding(10**12) == (192, 8)    # ceil r=24
    assert derive_banding(2_000, bands=4) == (28, 4)
    # monotone non-decreasing in n
    rs = [derive_banding(n)[0] for n in (10, 100, 1000, 10**6, 10**9)]
    assert rs == sorted(rs)


def test_embedding_lsh_default_path_is_scale_safe(spark):
    """The no-params call derives banding from the corpus count and caps
    saturated buckets: identical to the explicit derived configuration,
    subset of brute force, with decent recall."""
    from tagminder_spark.operators.dedupe import (
        DEFAULT_MAX_BUCKET,
        derive_banding,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    bits, bands = derive_banding(n)
    default = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_lsh_pairs(
            emb, "vec_id", "embedding", dim=64, threshold=0.4
        ).collect()
    }
    explicit = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_lsh_pairs(
            emb, "vec_id", "embedding", dim=64, bits=bits, bands=bands,
            threshold=0.4, max_bucket=DEFAULT_MAX_BUCKET, n=n,
        ).collect()
    }
    assert default == explicit
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    assert {(a, b) for a, b, _ in default} <= brute
    if brute:
        assert len(default) / len(brute) >= 0.5


def test_simhash_capped_subset_and_bounded(spark):
    """Round-6 guard: simhash's default finite max_bucket (1) changes
    nothing on a corpus with no saturated bucket, (2) is a strict
    subset that drops ONLY saturated-bucket candidates on a corpus with
    one, bounding the candidate join."""
    docs = load_table(spark, SF_DIR, "documents")
    capped = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, "doc_id", "text").collect()
    }
    uncapped = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, "doc_id", "text", max_bucket=None).collect()
    }
    assert capped == uncapped  # no bucket near the cap at gate scale

    # saturating corpus: 40 identical docs all share one bucket per band
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)]
    rows += [(100 + i, f"unique text number {i} with words w{i} x{i} y{i}") for i in range(10)]
    sat = spark.createDataFrame(rows, "doc_id long, text string")
    free = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(sat, "doc_id", "text", max_bucket=None).collect()
    }
    tight = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(sat, "doc_id", "text", max_bucket=20).collect()
    }
    assert tight <= free
    # the 40-dup clique (780 pairs) is entirely inside saturated buckets
    assert len(free) >= 780 and len(tight) <= len(free) - 780


def test_ngram_df_cap_lossless_and_bounded(docs):
    from pyspark.sql import functions as F  # noqa: PLC0415

    from tagminder_spark.operators.dedupe import hashed_shingles  # noqa: PLC0415

    uncapped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, 0.5, max_df=20
        ).collect()
    }
    # cap above the corpus max-DF ⇒ no qualifying pair lost
    assert capped == uncapped
    # and the join-key fan-out really is bounded by the cap
    sh = hashed_shingles(docs, "doc_id", "text", 3)
    max_df = sh.groupBy("h").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= 20


def test_minhash_deterministic_across_runs(docs):
    a = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    )
    assert a == b


def test_kmeans_trained_ivf_beats_seed_ivf(spark):
    """Trained spherical k-means centroids must not lose recall vs the
    fixed-seed stand-in, measured against brute-force ground truth."""
    from tagminder_spark.operators.similarity import (
        brute_topk,
        ivf_topk,
        ivf_topk_with_centroids,
        kmeans_train,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    qids = list(range(10, 20))
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(emb, "vec_id", "embedding", qids, k=3).collect()
    }
    seed = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, "vec_id", "embedding", list(range(8)), qids, k=3, nprobe=2
        ).collect()
    }
    cent = kmeans_train(emb, "vec_id", "embedding", k=8, iters=3)
    assert cent.count() == 8
    trained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_with_centroids(
            emb, "vec_id", "embedding", cent, qids, k=3, nprobe=2
        ).collect()
    }
    r_seed = len(seed & truth) / len(truth)
    r_trained = len(trained & truth) / len(truth)
    assert r_trained >= r_seed, f"trained recall {r_trained} < seed {r_seed}"
    assert r_trained >= 0.5


def test_e2e_dedup_composition_properties(spark):
    """pairs→clusters→keeper invariants on a hand-built universe: known
    chain {1,2,3} via (1,2),(2,3), pair (10,11), isolated 20/21."""
    from tagminder_spark.queries.dedup import _cluster_and_elect

    universe = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    rows = {
        r["doc_id"]: r
        for r in _cluster_and_elect(universe, pairs, "doc_id").collect()
    }
    assert len(rows) == 7
    for d in (1, 2, 3):
        assert rows[d]["cluster_id"] == 1 and rows[d]["cluster_size"] == 3
    assert rows[1]["is_dup"] == 0 and rows[2]["is_dup"] == 1
    for d in (10, 11):
        assert rows[d]["cluster_id"] == 10 and rows[d]["cluster_size"] == 2
    for d in (20, 21):  # isolated: singleton cluster, own keeper
        assert rows[d]["cluster_id"] == d
        assert rows[d]["cluster_size"] == 1 and rows[d]["is_dup"] == 0


def test_e2e_fuzzy_dedup_covers_universe(docs, spark):
    """Every document gets exactly one cluster assignment, keepers are
    cluster minima, and cluster sizes sum to the corpus size."""
    from tagminder_spark.queries.dedup import d_fuzzy_dedup_e2e

    out = d_fuzzy_dedup_e2e(spark, SF_DIR)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    agg = out.groupBy("cluster_id").agg(
        F.min("doc_id").alias("mn"), F.count(F.lit(1)).alias("sz")
    )
    assert agg.filter(F.col("mn") != F.col("cluster_id")).count() == 0
    bad_sz = (
        out.join(agg, "cluster_id")
        .filter(F.col("cluster_size") != F.col("sz"))
        .count()
    )
    assert bad_sz == 0


def test_incremental_equals_batch_filtered(docs, spark):
    """Incremental probe over a split corpus == full-corpus pairs that
    touch the new batch (same bands, same verification)."""
    from tagminder_spark.operators.dedupe import (
        incremental_lsh_pairs,
        lsh_index,
    )

    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    inc = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in incremental_lsh_pairs(
            lsh_index(new, "doc_id", "text"),
            lsh_index(old, "doc_id", "text"),
            threshold=0.5,
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
        .collect()
        if r["id_a"] % 5 == 0 or r["id_b"] % 5 == 0
    }
    assert inc == full and len(inc) > 0


def test_df_cap_bounds_boilerplate_blowup(spark):
    """Adversarial corpus: 200 docs share one boilerplate sentence. The
    uncapped shared-shingle join proposes >= C(200,2) pairs from the hot
    shingles alone; the DF cap drops hot shingles from the JOIN KEYS so
    candidates collapse to near zero — while the reported pairs (exact
    jaccard >= threshold) are identical, because boilerplate-only
    overlap never reaches the threshold."""
    from tagminder_spark.operators.dedupe import (
        hashed_shingles,
        shingle_intersections,
    )

    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(20)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = hashed_shingles(docs, "doc_id", "text", 3)
    uncapped_candidates = shingle_intersections(sh).count()
    assert uncapped_candidates >= 199 * 200 // 2  # quadratic in corpus

    counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    hot = counts.filter(F.col("df") > 20).select("h")
    capped = sh.join(hot, "h", "left_anti")
    capped_candidates = shingle_intersections(capped).count()
    assert capped_candidates == 0  # unique tails share nothing

    full = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    cap = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, max_df=20)
    assert full.count() == 0 and cap.count() == 0  # identical verdicts


def test_incremental_reingest_new_version_wins(spark):
    """An id present in BOTH indexes (re-ingest/update) must be compared
    via its NEW shingles only: stale standing rows are anti-joined away,
    so the updated doc still pairs with its exact twin at jaccard 1.0
    instead of a silently understated score against its own old text."""
    from tagminder_spark.operators.dedupe import (
        incremental_lsh_pairs,
        lsh_index,
    )

    txt_new = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame(
        [(1, "totally different stale text body here now"),
         (2, txt_new)],
        ["doc_id", "text"],
    )
    # doc 1 re-ingested with text identical to standing doc 2
    new = spark.createDataFrame([(1, txt_new)], ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in incremental_lsh_pairs(
            lsh_index(new, "doc_id", "text"),
            lsh_index(old, "doc_id", "text"),
            threshold=0.5,
        ).collect()
    }
    assert pairs == {(1, 2): 1.0}


def test_compact_lsh_index_equals_full_rebuild(docs, spark):
    """compact(standing(A), index(B)) == lsh_index(A ∪ B): after the
    periodic compaction the standing artifact is indistinguishable from
    a full rebuild, which closes the streaming probe's cross-batch
    recall gap. Includes an overlapping id (re-ingest) to exercise
    new-version-wins."""
    from tagminder_spark.operators.dedupe import compact_lsh_index, lsh_index

    old = docs.filter(F.col("doc_id") % 5 != 0)
    # batch: the %5 docs PLUS a re-ingest of doc 1 with its current text
    new = docs.filter((F.col("doc_id") % 5 == 0) | (F.col("doc_id") == 1))
    full = docs  # union with new-wins == all docs (texts unchanged)

    got_b, got_sh = compact_lsh_index(
        lsh_index(old, "doc_id", "text"), lsh_index(new, "doc_id", "text")
    )
    want_b, want_sh = lsh_index(full, "doc_id", "text")
    assert {tuple(r) for r in got_b.collect()} == {
        tuple(r) for r in want_b.collect()
    }
    assert {tuple(r) for r in got_sh.collect()} == {
        tuple(r) for r in want_sh.collect()
    }


def test_standing_index_bucketed_probe_shuffles_only_batch(docs, spark, tmp_path):
    """The 100 TB standing-index story pinned in a plan: persist the
    banded index bucketed on (band, bucket) [write_bucketed], then the
    ingest probe joins it WITHOUT re-shuffling the standing side —
    exactly one Exchange (the small new-batch side)."""
    from tagminder_spark.operators.dedupe import lsh_index
    from tagminder_spark.operators.scale import write_bucketed

    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old_banded, _ = lsh_index(old, "doc_id", "text")
    write_bucketed(
        old_banded, "t_standing_banded", ["band", "bucket"], 4,
        str(tmp_path / "standing"),
    )
    # non-bucketed twin of the standing artifact, for the plan diff
    old_banded.write.parquet(str(tmp_path / "plain"))
    try:
        new_banded, _ = lsh_index(new, "doc_id", "text")
        probe_side = new_banded.withColumnRenamed("id", "new_id")

        def n_exchanges(standing):
            j = probe_side.hint("merge").join(standing, ["band", "bucket"])
            assert j.count() > 0
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            return plan.count("Exchange hashpartitioning")

        plain = n_exchanges(spark.read.parquet(str(tmp_path / "plain")))
        bucketed = n_exchanges(spark.table("t_standing_banded"))
        # the bucketed standing side contributes NO exchange; the probe
        # pipeline's own exchanges (minhash agg + its join shuffle) are
        # identical in both plans
        assert bucketed == plain - 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_standing_banded")


def test_quantize_embeddings_roundtrip(spark):
    """int8 quantization: codes clamp to [-127,127], dequantized error
    bounded by 0.5/scale, zero vector -> scale 0 with zero codes."""
    from tagminder_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0, 0.0]),
            (3, [100.0, -0.001, 50.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].q8 == [64, -127, 32]  # scale = 127/2 = 63.5
    assert out[1].scale == 63.5
    assert out[2].q8 == [0, 0, 0] and out[2].scale == 0.0
    assert out[2].max_abs_err == 0.0
    for vid, vec in ((1, [1.0, -2.0, 0.5]), (3, [100.0, -0.001, 50.0])):
        r = out[vid]
        # outputs are rounded to 6 decimals — allow that much slack
        assert r.max_abs_err <= 0.5 / r.scale + 1e-6
        deq = [q / r.scale for q in r.q8]
        assert max(abs(a - b) for a, b in zip(vec, deq)) <= r.max_abs_err + 1e-6


def test_embedding_lsh_bucket_cap(spark):
    """Saturated-bucket guard: with a cap above the max occupancy the
    output is identical to uncapped; with a tiny cap the candidate
    generation is bounded (and the op still returns, never O(n^2))."""
    from tagminder_spark.operators.dedupe import embedding_lsh_pairs
    from tagminder_spark.session import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    free = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_lsh_pairs(
            emb, "vec_id", "embedding", dim=64, bits=32, bands=8,
            threshold=0.4, max_bucket=None,
        ).collect()
    }
    capped_loose = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_lsh_pairs(
            emb, "vec_id", "embedding", dim=64, bits=32, bands=8,
            threshold=0.4, max_bucket=10_000,
        ).collect()
    }
    assert capped_loose == free
    tight = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_lsh_pairs(
            emb, "vec_id", "embedding", dim=64, bits=32, bands=8,
            threshold=0.4, max_bucket=5,
        ).collect()
    }
    assert tight <= free  # dropping buckets only loses candidates
