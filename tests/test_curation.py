"""Semantics tests for the training-data curation operators
(operators/curation.py) on hand-built frames with known answers."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tagminder_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    quality_buckets,
    repetition_metrics,
    source_quota,
    temperature_sample,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")


def test_word_ngrams_short_doc_guard(spark):
    # Spark's sequence(1, 0) counts DOWN; the guard must yield [] instead.
    df = spark.range(1).select(
        word_ngrams(F.lit("a b"), 3).alias("g3"),
        word_ngrams(F.lit("a b c"), 3).alias("g3x"),
        word_ngrams(F.lit("a b c d"), 2).alias("g2"),
    )
    row = df.first()
    assert row.g3 == []
    assert row.g3x == ["a b c"]
    assert row.g2 == ["a b", "b c", "c d"]


def test_repetition_metrics_exact(spark):
    docs = _docs(
        spark,
        [
            # "spam spam spam spam": top word 4/4, top bigram 3/3, dup trigrams 2/2
            (1, "spam spam spam spam", "en", "s", 19),
            # all-distinct words: top fractions 1/n, no dup trigrams
            (2, "a b c d e f g h i j k l", "en", "s", 23),
        ],
    )
    out = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert out[1].top_word_frac == 1.0
    assert out[1].top_bigram_frac == 1.0
    assert out[1].dup_trigram_frac == 1.0
    assert out[1].passes_repetition == 0
    assert out[2].n_words == 12
    assert out[2].top_word_frac == pytest.approx(1 / 12, abs=1e-6)
    assert out[2].dup_trigram_frac == 0.0
    assert out[2].passes_repetition == 1


def test_decontaminate_cross_hits(spark):
    corpus = _docs(
        spark,
        [
            (1, "w x y z tail one", "en", "s", 1),  # shares 'w x y z' with bench
            (2, "totally different words here now", "en", "s", 1),
            (3, "w x y z", "en", "s", 1),  # exactly the benchmark 4-gram
        ],
    )
    bench = _docs(spark, [(99, "prefix w x y z suffix", "en", "s", 1)])
    out = {r.doc_id: r for r in decontaminate(corpus, bench, n=4).collect()}
    assert out[1].is_contaminated == 1
    assert out[2].is_contaminated == 0
    assert out[3].n_contaminated_grams == 1
    # every corpus doc gets a row even with zero hits
    assert len(out) == 3


def test_temperature_sample_rates_and_determinism(spark):
    rows = [(i, "t", "en" if i < 90 else "de", "s", 1) for i in range(100)]
    docs = _docs(spark, rows)
    out = temperature_sample(docs, ["lang"], alpha=0.5)
    rates = {r.lang: r.keep_rate for r in out.select("lang", "keep_rate").distinct().collect()}
    # smallest stratum keeps everything; bigger stratum at (90/10)^-0.5
    assert rates["de"] == 1.0
    assert rates["en"] == pytest.approx((90 / 10) ** -0.5, abs=1e-6)
    kept_de = out.where(F.col("lang") == "de").count()
    assert kept_de == 10  # rate 1.0 → all kept
    # pure function of ids: identical output across runs
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_sample(docs, ["lang"], alpha=0.5).collect())
    assert a == b


def test_pack_sequences_budget_boundaries(spark):
    # token counts 3,3,3 with budget 4: offsets 0,3,6 → shards 0,0,1
    docs = _docs(
        spark,
        [(1, "a b c", "en", "s", 1), (2, "d e f", "en", "s", 1), (3, "g h i", "en", "s", 1)],
    )
    out = {r.shard_id: r for r in pack_sequences(docs, budget=4).collect()}
    assert out[0].n_docs == 2
    assert out[0].total_tokens == 6
    assert out[0].first_doc == 1 and out[0].last_doc == 2
    assert out[1].n_docs == 1
    assert out[1].first_doc == 3


def test_source_quota_cap_and_tiebreak(spark):
    rows = [(i, "t", "en", f"src{i % 2}", 100 - (i % 3)) for i in range(10)]
    out = source_quota(_docs(spark, rows), k=2)
    rows_out = out.collect()
    assert len(rows_out) == 4  # 2 sources × k=2
    per_src = {}
    for r in rows_out:
        per_src.setdefault(r.source, []).append(r)
    for src, rs in per_src.items():
        assert [r.rank_in_source for r in sorted(rs, key=lambda r: r.rank_in_source)] == [1, 2]
        # ties on n_chars break by ascending doc_id
        rs = sorted(rs, key=lambda r: r.rank_in_source)
        assert rs[0].n_chars > rs[1].n_chars or (
            rs[0].n_chars == rs[1].n_chars and rs[0].doc_id < rs[1].doc_id
        )


def test_quality_buckets_tercile_sizes(spark):
    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(9)] + [(100, "de", 1.0)],
        "doc_id long, lang string, quality double",
    )
    out = quality_buckets(scored)
    en = [r for r in out.collect() if r.lang == "en"]
    assert sorted(r.tercile for r in en) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    # highest scores land in the head bucket
    head_ids = {r.doc_id for r in en if r.bucket == "head"}
    assert head_ids == {8, 7, 6}
    de = [r for r in out.collect() if r.lang == "de"]
    assert de[0].bucket == "head" and de[0].tercile == 1


def test_repetition_filter_runs_as_streaming_stage(spark, tmp_path):
    """The map-only curation pass composes into Structured Streaming
    unchanged: same repetition_metrics call on a readStream frame,
    stream-vs-batch row parity (fan_out passes streams through)."""
    from pyspark.sql import types as T

    from tagminder_spark.streaming.ingest import run_stream_to_memory

    src = tmp_path / "docs"
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam", "en", "s", 19),
            (2, "a b c d e f g h i j k l", "en", "s", 23),
            (3, "x y x y x y x y", "de", "s", 15),
        ],
    )
    docs.write.parquet(str(src))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
    stream = spark.readStream.format("parquet").schema(schema).load(str(src))
    out = run_stream_to_memory(
        repetition_metrics(stream), "cur_rep_stream"
    )
    got = {r.doc_id: r for r in out.collect()}
    want = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].asDict() == want[k].asDict()


def test_pii_scrub_masks_and_counts(spark):
    from tagminder_spark.operators.curation import pii_scrub

    docs = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-1.org or x@y.io from 10.0.200.7", "en", "s", 1),
            (2, "call +1 555-123-4567 today", "en", "s", 1),
            (3, "nothing sensitive here", "en", "s", 1),
        ],
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].n_emails == 2 and out[1].n_ips == 1 and out[1].n_phones == 0
    assert out[1].masked_text == "mail <EMAIL> or <EMAIL> from <IP>"
    assert out[1].is_clean == 0
    assert out[2].n_phones == 1 and "<PHONE>" in out[2].masked_text
    assert out[3].is_clean == 1
    assert out[3].masked_text == "nothing sensitive here"


def test_duplicated_spans_reference_model(spark):
    """Hand-built corpus: an 8-token span shared by docs 1 and 2 marks
    exactly its tokens; doc 3 (unique text) stays clean; overlapping dup
    grams merge into one interval (no double counting)."""
    from tagminder_spark.operators.curation import duplicated_spans

    span = "a b c d e f g h"          # 8 shared tokens
    docs = spark.createDataFrame(
        [
            (1, span + " x1 y1 z1"),   # dup span at pos 0..7, 11 tokens
            (2, "p2 q2 " + span),      # dup span at pos 2..9, 10 tokens
            (3, "u v w only unique words here none repeat at all"),
            (4, span + " " + span),    # self-repeat: 16 tokens all covered
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in duplicated_spans(docs, k=8).collect()}
    assert got[1]["dup_tokens"] == 8 and got[1]["n_tokens"] == 11
    assert got[2]["dup_tokens"] == 8 and got[2]["n_tokens"] == 10
    assert got[3]["dup_tokens"] == 0 and got[3]["passes_dup_spans"] == 1
    # doc 4: grams a..h, b..a, ..., all positions 0..8 are duplicated
    # (each gram of the repeated text appears twice corpus-wide), so the
    # union covers the whole 16 tokens
    assert got[4]["dup_tokens"] == 16 and got[4]["passes_dup_spans"] == 0
    assert got[1]["passes_dup_spans"] == 0  # 8/11 > 0.3


def test_duplicated_spans_random_model(spark):
    """Random small-vocabulary corpora vs a pure-python reference model:
    duplicated k-gram positions and interval-union coverage must match
    exactly (seeded, 4 corpora)."""
    import random

    from tagminder_spark.operators.curation import duplicated_spans

    k = 3
    rng = random.Random(11)
    for trial in range(4):
        vocab = ["w%d" % i for i in range(6 + trial)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(12)
        ]
        # python reference model
        gram_pos: dict[str, list[tuple[int, int]]] = {}
        toks_by_doc = {}
        for did, text in rows:
            toks = text.split(" ")
            toks_by_doc[did] = toks
            for p in range(len(toks) - k + 1):
                gram_pos.setdefault(" ".join(toks[p : p + k]), []).append((did, p))
        expected = {}
        dup_positions: dict[int, list[int]] = {}
        for g, occ in gram_pos.items():
            if len(occ) >= 2:
                for did, p in occ:
                    dup_positions.setdefault(did, []).append(p)
        for did, toks in toks_by_doc.items():
            ps = sorted(dup_positions.get(did, []))
            covered = set()
            for p in ps:
                covered.update(range(p, p + k))
            expected[did] = (len(toks), len(ps), len(covered))

        got = {
            r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["dup_tokens"])
            for r in duplicated_spans(
                spark.createDataFrame(rows, ["doc_id", "text"]), k=k
            ).collect()
        }
        assert got == expected


def test_pipeline_e2e_stage_monotonicity(spark):
    """Stage flags chain: kept implies every stage flag; quota caps each
    source at 10 kept docs; total assignment covers the corpus."""
    from tagminder_spark.queries.curation_q import cur_pipeline_e2e
    from tests.conftest import SF_DIR

    out = cur_pipeline_e2e(spark, SF_DIR)
    n = out.count()
    assert n == out.select("doc_id").distinct().count()
    bad = out.filter(
        (F.col("kept") == 1)
        & (
            (F.col("passes_repetition") == 0)
            | (F.col("is_exact_keeper") == 0)
            | (F.col("is_clean") == 0)
            | (F.col("within_quota") == 0)
        )
    ).count()
    assert bad == 0
    kept = out.filter(F.col("kept") == 1)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    per_source = (
        kept.join(docs, "doc_id").groupBy("source").count().collect()
    )
    assert per_source and all(r["count"] <= 10 for r in per_source)


def test_write_curated_shards_roundtrip(spark, tmp_path):
    """Shard-partitioned write: directories per (lang, shard_id), rows
    survive the round-trip, and shard assignment matches pack_sequences'
    rollup counts."""
    from tagminder_spark.operators.curation import (
        pack_sequences,
        write_curated_shards,
    )
    from tagminder_spark.session import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "curated")
    write_curated_shards(docs, out, budget=512)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    roll = {
        (r["lang"], r["shard_id"]): r["n_docs"]
        for r in pack_sequences(docs, budget=512).collect()
    }
    got = {
        (r["lang"], r["shard_id"]): r["count"]
        for r in back.groupBy("lang", "shard_id").count().collect()
    }
    assert got == roll


def test_vocabulary_counts_and_cut(spark):
    from tagminder_spark.operators.curation import vocabulary

    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b z"), (3, "c a q")], ["doc_id", "text"]
    )
    rows = vocabulary(docs, top_k=2, min_count=2).collect()
    # a: 4 occ / 3 docs; b: 3 occ / 2 docs; c: 2/2; z,q hapax-pruned
    assert [(r["token"], r["n_occurrences"], r["doc_frequency"]) for r in rows] == [
        ("a", 4, 3),
        ("b", 3, 2),
    ]


def test_skewed_stratum_splits_and_exactness(spark):
    """The 100x-skew scenario: one language holds 99% of rows. The
    range decomposition must (a) actually split the hot stratum across
    >1 window partition — no single task sorts the whole language —
    and (b) produce BIT-IDENTICAL output to the single-window plan for
    packing, quota, and terciles alike."""
    from tagminder_spark.operators.curation import _range_tag

    rows = [
        (i, "w " * (1 + i % 7), "en" if i % 100 else "de", f"s{i % 3}", i % 50)
        for i in range(2000)
    ]
    docs = _docs(spark, [(i, t.strip(), l, s, n) for i, t, l, s, n in rows])

    # (a) the hot stratum really fans out across ranges
    tagged = _range_tag(docs, "lang", "doc_id", 8)
    n_ranges_en = (
        tagged.where(F.col("lang") == "en").select("__rng").distinct().count()
    )
    assert n_ranges_en > 1

    # (b) two-level cumsum == single-window cumsum, row for row
    split = pack_sequences(docs, budget=64, range_splits=8).collect()
    single = pack_sequences(docs, budget=64, range_splits=1).collect()
    key = lambda r: (r.lang, r.shard_id)  # noqa: E731
    assert sorted(map(tuple, split), key=lambda t: t[:2]) == sorted(
        map(tuple, single), key=lambda t: t[:2]
    )
    assert len({key(r) for r in split if r.lang == "en"}) > 1

    # terciles: decomposed rank + closed-form cutoffs == plain ntile
    from pyspark.sql.window import Window

    scored = docs.select(
        "doc_id", "lang", (F.col("n_chars") * 1.0).alias("quality")
    )
    got = {
        r.doc_id: (r.tercile, r.bucket)
        for r in quality_buckets(scored, range_splits=8).collect()
    }
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    want = {
        r.doc_id: r.t
        for r in scored.select("doc_id", F.ntile(3).over(w).alias("t")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want

    # quota: two-phase salted == direct window (total order => unique answer)
    got_q = {
        r.doc_id: r.rank_in_source
        for r in source_quota(docs, k=7, buckets=4).collect()
    }
    wq = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    want_q = {
        r.doc_id: r.rn
        for r in docs.select(
            "doc_id", F.row_number().over(wq).cast("long").alias("rn")
        )
        .where(F.col("rn") <= 7)
        .collect()
    }
    assert got_q == want_q


def test_bpe_pair_counts_histogram_weighting(spark):
    """Pair counts must equal naive per-occurrence counting (the
    histogram-first computation is an optimization, not a semantic):
    'ab ab abc' -> ab: 2+1=3 (a,b)x3... verified on a hand case."""
    from tagminder_spark.operators.curation import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab abc x"), (2, "abc bc")], ["doc_id", "text"]
    )
    got = {
        (r["pair"]): r["n_occurrences"]
        for r in bpe_pair_counts(docs, top_k=10, min_count=1).collect()
    }
    # occurrences: ab x2, abc x2, bc x1, x x1 (len-1 token: no pairs)
    # 'ab' pairs: ab ; 'abc' pairs: ab, bc ; 'bc' pairs: bc
    assert got == {"ab": 2 + 2, "bc": 2 + 1}


def test_benchmark_overlap_counts(spark):
    from tagminder_spark.operators.curation import benchmark_overlap

    corpus = spark.createDataFrame(
        [
            (1, "a b c d x"),      # shares 'a b c d' with bench 10
            (2, "p q r s t"),      # no overlap
            (3, "a b c d a b c d"),  # two occurrences of the bench gram
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(10, "a b c d")], ["doc_id", "text"])
    got = {r["bench_id"]: r for r in benchmark_overlap(corpus, bench, n=4).collect()}
    assert got[10]["n_corpus_docs"] == 2
    # doc1: 1 shared gram occurrence; doc3: 'a b c d' at pos 0 and 4,
    # plus the straddling grams 'b c d a','c d a b','d a b c' are NOT in
    # the bench set -> 2 occurrences
    assert got[10]["n_shared_grams"] == 3


def test_strip_markup_semantics(spark):
    from tagminder_spark.operators.curation import strip_markup

    docs = spark.createDataFrame(
        [
            (1, '<p>Hi <b>there</b></p><script>x<y</script> done'),
            # &amp;lt; must decode to the LITERAL '&lt;', not '<'
            (2, "&amp;lt; ok &quot;q&quot;"),
            (3, '<STYLE a="b">h1 { }</style>plain'),
            (4, "no markup at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in strip_markup(docs).collect()}
    assert out[1].clean_text == "Hi there done"
    # p, b, /b, /p, <script>, and the tag-shaped '<y</script>' span = 6
    assert out[1].n_tags_removed == 6
    assert out[2].clean_text == '&lt; ok "q"'
    assert out[3].clean_text == "plain"
    assert out[4].clean_text == "no markup at all"
    assert out[4].n_tags_removed == 0


def test_extract_domains_normalization(spark):
    from tagminder_spark.operators.curation import extract_domains

    docs = spark.createDataFrame(
        [
            (1, "x https://WWW.Foo.COM/a http://foo.com/b https://Bar.org:99"),
            (2, "no urls"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in extract_domains(docs).collect()}
    assert out[1].n_urls == 3
    # www-stripped + lowercased + dedup: foo.com appears once
    assert out[1].domains == "bar.org,foo.com"
    assert out[1].n_domains == 2
    assert out[2].n_urls == 0 and out[2].domains == ""


def test_c4_line_filter_rules(spark):
    from tagminder_spark.operators.curation import c4_line_filter

    docs = spark.createDataFrame(
        [
            (1, "A good long sentence ends here.\nshort.\nno punct line at all\nAnother proper keeper line stays!"),
            (2, "Contains lorem ipsum sadly.\nA second fine line here."),
            (3, "Code block { return 1; }\nA second fine line here."),
            (4, "Only one good line survives here."),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    assert out[1].n_lines == 4 and out[1].n_kept_lines == 2
    assert out[1].page_keep == 1
    assert out[1].clean_text == (
        "A good long sentence ends here.\nAnother proper keeper line stays!"
    )
    assert out[2].page_keep == 0  # lorem ipsum (case-insensitive)
    assert out[3].page_keep == 0  # curly braces
    assert out[4].page_keep == 0  # < 2 kept lines


def test_lm_perplexity_hand_model(spark):
    """Tiny corpus with a closed-form check: reference trains the LM,
    a reference-identical doc scores lower perplexity than an OOV doc."""
    import math

    from tagminder_spark.operators.curation import lm_perplexity

    ref = spark.createDataFrame(
        [(7, "a b a b"), (14, "a b c")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(7, "a b a b"), (1, "z z z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in lm_perplexity(docs, ref, k=0.5).collect()}
    # V = |{a,b,c}| + 1 = 4; closed-form for doc 1: bigrams
    # (<s>,z),(z,z),(z,z): c2=0 everywhere; c1(<s>)=2, c1(z)=0
    want_logp = math.log(0.5 / (2 + 2.0)) + 2 * math.log(0.5 / 2.0)
    assert out[1].n_bigrams == 3
    assert out[1].avg_logprob == round(want_logp / 3, 6)
    assert out[7].perplexity < out[1].perplexity
    assert out[7].avg_logprob > out[1].avg_logprob


def test_hash_split_deterministic_and_complete(spark):
    from tagminder_spark.operators.curation import hash_split

    docs = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    a = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.05, test_frac=0.05).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.05, test_frac=0.05).collect()}
    assert a == b and len(a) == 500
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 400  # ~90%


def test_mixture_plan_invariants(spark):
    from tagminder_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [(i, "w " * (5 + i % 3), "en" if i < 90 else "de", "s", 1)
         for i in range(100)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = mixture_plan(docs, ["lang"], alpha=0.5, budget_tokens=1000).collect()
    assert len(rows) == 2
    total_w = sum(r.weight for r in rows)
    assert abs(total_w - 1.0) < 1e-4
    # alpha < 1 upweights the small stratum relative to its share
    by = {r.lang: r for r in rows}
    assert by["de"].weight > by["de"].n_tokens / (
        by["de"].n_tokens + by["en"].n_tokens
    )
    assert abs(sum(r.allocated_tokens for r in rows) - 1000) <= 1


def test_range_tag_non_numeric_degrades_to_single_range(spark):
    """Docstring contract: a non-numeric order key (cast -> NULL) must
    degrade to ONE range per stratum — the plain-window plan — with
    packing results still exact."""
    from tagminder_spark.operators.curation import _range_tag

    docs = spark.createDataFrame(
        [(f"id{i:03d}", "w w w", "en", "s", 1) for i in range(50)],
        "doc_id string, text string, lang string, source string, n_chars int",
    )
    tagged = _range_tag(docs, "lang", "doc_id", 8)
    assert tagged.select("__rng").distinct().count() == 1
    out = pack_sequences(docs, budget=7, range_splits=8).collect()
    single = pack_sequences(docs, budget=7, range_splits=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, single))


def test_pack_sequences_numeric_castable_string_ids(spark):
    """Round-6 ADVICE regression: ids like '9' vs '10' are bucketed by
    _range_tag NUMERICALLY (try_cast double) — the within-range window
    must rank by the same casted key, or the two-level plan diverges
    from the single window exactly at range boundaries."""
    docs = spark.createDataFrame(
        [(str(i), "w " * (i % 5 + 1), "en", "s", 1) for i in range(1, 120)],
        "doc_id string, text string, lang string, source string, n_chars int",
    )
    split = pack_sequences(docs, budget=9, range_splits=8).collect()
    single = pack_sequences(docs, budget=9, range_splits=1).collect()
    assert sorted(map(tuple, split)) == sorted(map(tuple, single))


def test_lm_perplexity_open_vocab_fallback(spark):
    """broadcast_limit=0 forces the open-vocabulary shuffled-join path:
    values are identical to the broadcast path, and the initial physical
    plan carries no broadcast join for the count tables."""
    from tagminder_spark.operators.curation import lm_perplexity

    docs = spark.createDataFrame(
        [(i, f"the quick fox number {i} jumps the fence") for i in range(30)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
        + [(200, "the fence is high and the fox is quick")],
        "doc_id long, text string",
    )
    bcast = {tuple(r) for r in lm_perplexity(docs, ref).collect()}
    fb_df = lm_perplexity(docs, ref, broadcast_limit=0)
    fallback = {tuple(r) for r in fb_df.collect()}
    assert fallback == bcast
    # the fallback carries NO broadcast hint (the planner may still pick
    # a broadcast join for genuinely tiny frames — that is statistics,
    # not the operator forcing vocabulary-sized tables onto every
    # executor); the default path must carry the hint
    assert "broadcast" not in fb_df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "broadcast" in (
        lm_perplexity(docs, ref)._jdf.queryExecution().optimizedPlan().toString().lower()
    )
