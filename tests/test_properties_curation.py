"""Property tests: the curation operators' distributed implementations
against plain-Python reference models (Counter / greedy loop), over
randomized documents.  One Spark job evaluates a whole batch of
hypothesis-generated docs, so examples are cheap."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from tagminder_spark.operators.curation import (
    pack_sequences,
    repetition_metrics,
    temperature_sample,
    word_ngrams,
)

words = st.sampled_from(["a", "b", "c", "ab", "spam", "x1"])
texts = st.lists(words, min_size=1, max_size=12).map(" ".join)


def _model_stats(tokens: list[str], n: int) -> tuple[int, int, int]:
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    c = Counter(grams)
    total = len(grams)
    top = max(c.values()) if c else 0
    dup = sum(v for v in c.values() if v >= 2)
    return total, top, dup


@settings(max_examples=20, deadline=None)
@given(st.lists(texts, min_size=1, max_size=25))
def test_repetition_fold_matches_counter_model(spark, batch):
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(batch)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    for i, t in enumerate(batch):
        toks = t.split(" ")
        t1, top1, _ = _model_stats(toks, 1)
        t2, top2, _ = _model_stats(toks, 2)
        t3, _, dup3 = _model_stats(toks, 3)
        r = out[i]
        assert r.n_words == t1
        assert abs(r.top_word_frac - round(top1 / t1, 6)) < 1e-9
        if t2 == 0:
            assert r.top_bigram_frac is None
        else:
            assert abs(r.top_bigram_frac - round(top2 / t2, 6)) < 1e-9
        if t3 == 0:
            assert r.dup_trigram_frac is None
            assert r.passes_repetition == 0
        else:
            assert abs(r.dup_trigram_frac - round(dup3 / t3, 6)) < 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(texts, min_size=1, max_size=25))
def test_word_ngrams_matches_slice_model(spark, batch):
    docs = spark.createDataFrame([(t,) for t in batch], "text string")
    for n in (1, 2, 3):
        got = [
            r.g
            for r in docs.select(word_ngrams(F.col("text"), n).alias("g")).collect()
        ]
        for t, g in zip(batch, got):
            toks = t.split(" ")
            want = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            assert g == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=30),
    st.integers(min_value=2, max_value=12),
)
def test_pack_sequences_matches_greedy_model(spark, token_counts, budget):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * k), "en", "s", k) for i, k in enumerate(token_counts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r.shard_id: r for r in pack_sequences(docs, budget=budget).collect()}
    # model: contiguous fill in id order; shard = start offset // budget
    offset, model = 0, {}
    for i, k in enumerate(token_counts):
        sid = offset // budget
        m = model.setdefault(sid, [0, 0, None, None])
        m[0] += 1
        m[1] += k
        m[2] = i if m[2] is None else m[2]
        m[3] = i
        offset += k
    assert set(out) == set(model)
    for sid, (n_docs, total, first, last) in model.items():
        assert out[sid].n_docs == n_docs
        assert out[sid].total_tokens == total
        assert out[sid].first_doc == first and out[sid].last_doc == last


@settings(max_examples=10, deadline=None)
@given(st.lists(st.sampled_from(["en", "de", "fr"]), min_size=2, max_size=40))
def test_temperature_sample_is_stable_and_rate_bounded(spark, langs):
    docs = spark.createDataFrame(
        [(i, "t", lang, "s", 1) for i, lang in enumerate(langs)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = temperature_sample(docs, ["lang"], alpha=0.5).collect()
    counts = Counter(langs)
    n_min = min(counts.values())
    for r in out:
        want = (counts[r.lang] / n_min) ** -0.5
        assert abs(r.keep_rate - round(want, 6)) < 1e-9
    # the smallest stratum keeps every document
    smallest = min(counts, key=lambda k: (counts[k], k))
    kept = Counter(r.lang for r in out)
    assert kept[smallest] == counts[smallest]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),      # n_tokens
            st.sampled_from(["en", "de", "zh"]),        # lang (skewable)
            st.integers(min_value=0, max_value=200),    # quality basis
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=7),  # range_splits
)
def test_range_decomposition_equals_direct_windows(spark, rows, splits):
    """Property: the two-level range decomposition (any split count,
    any stratum mix incl. single-stratum and ties) is row-identical to
    the direct single-window plans for packing AND terciles."""
    from pyspark.sql.window import Window

    from tagminder_spark.operators.curation import quality_buckets

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * k), lang, "s", q)
            for i, (k, lang, q) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    split_p = pack_sequences(docs, budget=5, range_splits=splits).collect()
    single_p = pack_sequences(docs, budget=5, range_splits=1).collect()
    assert sorted(map(tuple, split_p)) == sorted(map(tuple, single_p))

    scored = docs.select(
        "doc_id", "lang", (F.col("n_chars") % 7 * 1.0).alias("quality")
    )
    got = {
        r.doc_id: r.tercile
        for r in quality_buckets(scored, range_splits=splits).collect()
    }
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    want = {
        r.doc_id: r.t
        for r in scored.select(
            "doc_id", F.ntile(3).over(w).cast("long").alias("t")
        ).collect()
    }
    assert got == want
