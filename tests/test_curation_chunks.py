"""chunk_documents: sliding-window token chunker properties."""

from __future__ import annotations

import pytest

from tagminder_spark.operators.curation import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # n=10
        (2, "one two three"),                          # n < window
        (3, "solo"),                                   # n=1
        (4, "   "),                                    # empty after trim
        (5, " ".join(f"t{i}" for i in range(64))),    # exactly one window
        (6, " ".join(f"u{i}" for i in range(65))),    # one token over
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_coverage_and_overlap(spark, docs):
    out = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, window=8, overlap=4).collect()
    }
    # n=10, window 8, step 4 -> k = ceil(6/4) = 2 chunks
    assert out[(1, 0)][0].split() == [f"w{i}" for i in range(8)]
    assert out[(1, 1)][0].split() == [f"w{i}" for i in range(4, 10)]
    assert out[(1, 1)][1] == 6
    assert (1, 2) not in out
    # short docs -> exactly one chunk, whole text
    assert out[(2, 0)] == ("one two three", 3)
    assert out[(3, 0)] == ("solo", 1)
    # blank docs emit nothing
    assert not any(k[0] == 4 for k in out)


def test_chunk_boundaries(spark, docs):
    out = chunk_documents(docs, window=64, overlap=16)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[5]) == 1 and by_doc[5][0]["n_tokens"] == 64
    # 65 tokens -> k = ceil((65-16)/48) = 2; second chunk has 17 tokens
    assert len(by_doc[6]) == 2
    assert sorted(r["n_tokens"] for r in by_doc[6]) == [17, 64]
    # every token appears in some chunk (coverage)
    toks = set()
    for r in by_doc[6]:
        toks.update(r["chunk_text"].split())
    assert toks == {f"u{i}" for i in range(65)}


def test_chunk_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, overlap=-1)
