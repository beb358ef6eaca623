"""Dedup-family properties: LSH recall vs exact, signature determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagminder_spark.operators.dedupe import (
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
