"""Training-data curation operators: the filtering / sampling / packing
passes a large-scale LLM data pipeline runs between raw ingest and
tokenization.  All column-expression or narrow-shuffle implementations —
no Python in the hot path.

Family (each has an exact DuckDB oracle in queries/curation_q.py):

- **Repetition metrics** (Gopher-style, Rae et al. 2021 §A1.1): fraction
  of tokens taken by the single most frequent word, by the most frequent
  bigram, and the fraction of trigram occurrences that are duplicates.
  Documents exceeding the thresholds are flagged, not dropped — the flag
  composes with any downstream policy.
- **Benchmark decontamination** (GPT-3 paper §C / PaLM §7): any document
  sharing a word 8-gram with a held-out benchmark set is flagged.  The
  benchmark n-gram set is tiny relative to the corpus → broadcast
  semi-join; the corpus side is a map-side explode with no shuffle of
  document text.
- **Deterministic hash sampling** with per-stratum temperature rates
  (multilingual mixture balancing à la mT5): keep-decision is a pure
  function of the stable document id (md5-prefix as uniform[0,1)), so
  the sample is reproducible across runs/engines and needs no RNG state.
- **Sequence packing**: documents are packed into fixed token-budget
  shards per language partition via a cumulative-sum window — the
  pre-tokenization sharding step of a training run.
- **Per-source quota** (domain capping): top-k documents per source by
  a deterministic priority, bounding any one domain's contribution.
- **Quality buckets** (CCNet, Wenzek et al. 2020): per-language ntile
  into head/middle/tail by quality score.

Scale notes (100 TB): repetition metrics and decontamination are the two
that touch every token — both are a single explode + partial-aggregated
groupBy(doc_id, gram) whose key cardinality is bounded by corpus token
count; no pairwise joins anywhere.  The three per-stratum orderings
(packing's cumulative sum, the source quota's rank, the quality
terciles) are the operators a naive window would serialize onto one
reducer when a single language / crawl domain holds most of the corpus;
each is rewritten skew-safe IN CODE:

- packing: two-level cumulative sum — rows are range-tagged by
  broadcast approximate-quantile boundaries of the order key
  (:func:`_range_tag`), each (stratum, range) computes its local
  exclusive cumsum in parallel, and a tiny per-range totals frame
  (|strata| x |ranges| rows) supplies the exact global offset.  The
  result is BIT-IDENTICAL to the single-window plan (addition is
  associative over exact longs), so the oracle is untouched — the
  decomposition changes only the shuffle layout, never the answer.
- source quota: two-phase salted top-k — local rank inside
  (source, salt) discards all but ``buckets * k`` survivors per source,
  then the exact rank is computed over that bounded set.  A hot domain
  never funnels its full row set through one reducer.
- quality terciles: exact global rank via the same range-tag + offset
  decomposition, then ntile's bucket boundaries computed in closed form
  from the stratum count (sizes ceil-split exactly as SQL ntile).

``range_splits`` controls the fan-out (default 16); 1 falls back to the
plain single-window plan.  Boundary quality only affects load balance,
never values — percentile_approx nondeterminism across partition merge
order is therefore harmless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tagminder_spark.cache import scoped_persist

# ---------------------------------------------------------------------------
# shared primitives


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of a whitespace-tokenized text column, as an array of
    space-joined strings.  Guarded: Spark's ``sequence(1, 0)`` counts
    DOWN (yielding [1, 0]), so short documents must short-circuit to an
    empty array rather than rely on an empty sequence."""
    toks = F.split(F.trim(col), " ")
    n_grams = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), n_grams)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(n_grams >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def fan_out(df: DataFrame) -> DataFrame:
    """Adaptive parallelism guard for CPU-heavy map-only passes: a small
    corpus often arrives as ONE indivisible parquet row group (the sf0.1
    documents table is a single 580 KB row group), pinning the whole op
    to one core while 31 idle.  When the scan yields fewer partitions
    than the cluster's default parallelism, pay one tiny round-robin
    shuffle to spread the rows; at real scale (thousands of row groups ≥
    parallelism) this is a no-op and the fact table never reshuffles.

    Streaming frames pass through untouched (no ``.rdd`` on a stream;
    micro-batch parallelism is the source's concern), which also keeps
    every map-only curation op usable as a streaming stage as-is."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


#: default per-stratum fan-out for the skew-safe window decompositions —
#: at 100 TB one language can be most of the corpus; 16 sub-ranges per
#: stratum bounds any single sort task at ~1/16 of the hot stratum while
#: adding only a |strata| x 16-row broadcast frame.
DEFAULT_RANGE_SPLITS = 16


def _range_tag(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    n_ranges: int,
    *,
    descending: bool = False,
) -> DataFrame:
    """Tag each row with an order-preserving range id ``__rng`` within its
    stratum, via broadcast approximate-quantile boundaries of the
    (numeric) order column.

    Order-preserving means: within a stratum, ``order_col`` a before b
    (in the requested direction) implies ``__rng(a) <= __rng(b)``, and
    ties always land in the same range — so a per-(stratum, range)
    window plus an exact per-range offset reproduces the global window
    EXACTLY.  Boundary placement (percentile_approx is a sketch, and its
    merge order is partition-dependent) affects only balance, never
    values.  NULL order keys go to the range Spark's default null
    ordering puts them (first for asc, last for desc).

    Non-numeric order keys (cast → NULL) therefore degrade GRACEFULLY
    to a single range per stratum — the plain-window plan, exact but
    unsplit; callers with string ids that need the fan-out should pass
    a numeric derivation of the id as the order column."""
    if n_ranges <= 1:
        return df.withColumn("__rng", F.lit(0))
    probs = [i / n_ranges for i in range(1, n_ranges)]
    # try_cast, not cast: under ANSI a non-numeric key must DEGRADE to
    # the single-range plan (all NULL -> one range), not throw
    bounds = df.groupBy(partition_col).agg(
        F.percentile_approx(
            F.col(order_col).try_cast("double"),
            F.array(*[F.lit(p) for p in probs]),
        ).alias("__bnds")
    )
    v = F.col(order_col).try_cast("double")
    if descending:
        rng = F.size(F.filter(F.col("__bnds"), lambda b: b > v))
        null_rng = F.lit(n_ranges - 1)  # desc => nulls last
    else:
        rng = F.size(F.filter(F.col("__bnds"), lambda b: b < v))
        null_rng = F.lit(0)  # asc => nulls first
    return (
        df.join(F.broadcast(bounds), partition_col)
        .withColumn("__rng", F.when(v.isNull(), null_rng).otherwise(rng))
        .drop("__bnds")
    )


def uniform_hash(col: Column) -> Column:
    """Deterministic uniform[0, 1) from any key column: the first 8 hex
    digits of md5 as an integer over 16^8.  Identical in DuckDB
    (``CAST('0x' || substring(md5(x),1,8) AS BIGINT) / 4294967296.0``)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return h.cast("long") / F.lit(4294967296.0)


# ---------------------------------------------------------------------------
# repetition metrics (Gopher rules)


def _gram_stats(grams: Column) -> Column:
    """struct(total, top, dup) of an n-gram array, computed WITHIN the
    row: sort the array, then one run-length fold — ``top`` is the
    longest run (= the most frequent gram's count; using the count, not
    the gram, keeps ties deterministic), ``dup`` the occurrences inside
    runs of length ≥ 2.  Pure higher-order functions ⇒ the whole
    repetition pass is map-only with zero shuffle at any scale."""
    acc0 = F.struct(
        F.lit("").alias("prev_g"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dups"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev_g"] == g
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        closed = F.when(
            same | (acc["run"] < 2), acc["dups"]
        ).otherwise(acc["dups"] + acc["run"])
        return F.struct(
            g.alias("prev_g"),
            (acc["cnt"] + 1).alias("cnt"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            closed.alias("dups"),
        )

    def finish(acc: Column) -> Column:
        # everything derives from the accumulator alone (total is counted
        # during the fold — referencing `grams` here would re-evaluate the
        # whole gram construction a second time), and the fractions are
        # computed HERE, inside the single fold expression: Catalyst's
        # project collapse re-evaluates an expensive expression once per
        # downstream struct-field access (measured ~0.7 s per extra
        # access at sf0.1), so the struct carries exactly the fields the
        # caller reads once each.
        nz = F.when(acc["cnt"] > 0, acc["cnt"])
        dup = acc["dups"] + F.when(acc["run"] >= 2, acc["run"]).otherwise(0)
        return F.struct(
            acc["cnt"].alias("total"),
            acc["best"].alias("top"),
            dup.alias("dup"),
            F.round(acc["best"] / nz, 6).cast("double").alias("top_frac"),
            F.round(dup / nz, 6).cast("double").alias("dup_frac"),
        )

    return F.aggregate(F.array_sort(grams), acc0, step, finish)


def repetition_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_word_max: float = 0.20,
    top_bigram_max: float = 0.18,
    dup_trigram_max: float = 0.30,
) -> DataFrame:
    """Per-document repetition statistics + a pass/fail flag.

    Every metric is computed inside the row via ``_gram_stats`` (sorted
    array + run-length fold): ONE parquet scan, ZERO shuffles, zero
    joins — the plan a 100 TB repetition filter wants, vs the naive
    explode → groupBy(doc, gram) → rejoin (4 scans + 6 shuffles).
    Documents too short for an order (e.g. 2 words, no trigrams) get
    NULL fractions and fail the flag, matching SQL CASE semantics.
    """
    s1 = _gram_stats(word_ngrams(F.col(text_col), 1))
    s2 = _gram_stats(word_ngrams(F.col(text_col), 2))
    s3 = _gram_stats(word_ngrams(F.col(text_col), 3))
    staged = fan_out(docs).select(
        F.col(id_col),
        s1["total"].cast("int").alias("n_words"),
        s1["top_frac"].alias("top_word_frac"),
        s2["top_frac"].alias("top_bigram_frac"),
        s3["dup_frac"].alias("dup_trigram_frac"),
    )
    return staged.select(
        id_col,
        "n_words",
        "top_word_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        F.when(
            (F.col("top_word_frac") <= top_word_max)
            & (F.col("top_bigram_frac") <= top_bigram_max)
            & (F.col("dup_trigram_frac") <= dup_trigram_max),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("passes_repetition"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with the
    benchmark set.

    The benchmark gram set is distinct-ed and **broadcast** — at 100 TB
    the corpus side never shuffles; contamination is decided map-side and
    only the (doc_id, hit-count) pairs are aggregated."""
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    corpus_grams = fan_out(docs).select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
        .cast("int")
        .alias("n_contaminated_grams"),
        (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0)
        .cast("int")
        .alias("is_contaminated"),
    )


# ---------------------------------------------------------------------------
# deterministic temperature sampling


def temperature_sample(
    docs: DataFrame,
    strata: list[str],
    id_col: str = "doc_id",
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Deterministic stratified sampling with temperature-balanced rates.

    Stratum weight ∝ N^alpha (alpha<1 upweights small strata, mT5 §3.2);
    per-stratum keep-rate is (N_s / N_min)^(alpha-1) so the smallest
    stratum keeps everything.  The keep decision hashes the document id —
    reproducible, engine-independent, and purely map-side after one tiny
    aggregate (stratum counts) that broadcasts back."""
    counts = docs.groupBy(*strata).agg(F.count("*").alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        *strata,
        F.pow(F.col("n_s") / F.col("n_min"), F.lit(alpha - 1.0)).alias(
            "keep_rate"
        ),
    )
    u = uniform_hash(F.col(id_col))
    return (
        docs.join(F.broadcast(rates), strata, "inner")
        .where(u < F.col("keep_rate"))
        .select(
            id_col,
            *strata,
            F.round(F.col("keep_rate"), 6).cast("double").alias("keep_rate"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing


def _shard_tagged(
    docs: DataFrame,
    id_col: str,
    partition_col: str,
    budget: int,
    range_splits: int,
) -> DataFrame:
    """All input columns (which must include ``n_tokens``) + ``shard_id``
    via the skew-safe two-level cumulative sum (see module docstring).
    ``start_offset`` = exact tokens before this doc in (stratum, id-asc)
    order = per-range exclusive cumsum + the summed totals of all
    earlier ranges — equal to the single global window for every row,
    any boundary placement.

    The within-range window orders by the SAME ``try_cast(id, double)``
    expression :func:`_range_tag` buckets by (raw id as tiebreak) — if
    it ordered by the raw column instead, numeric-castable STRING ids
    ('9' vs '10') would be bucketed numerically but ranked lexically and
    the two-level plan would silently diverge from the single window.
    Net document order: numeric ids → numeric (cast is order-preserving,
    tiebreak never fires); non-castable strings → cast is NULL for every
    row (one range, constant key) so pure lexical order; castable
    strings → numeric-then-lexical, consistently in both levels."""
    tagged = _range_tag(docs, partition_col, id_col, range_splits)
    idnum = F.col(id_col).try_cast("double")
    w = Window.partitionBy(partition_col, "__rng").orderBy(
        idnum.asc_nulls_first(), F.col(id_col).asc()
    )
    totals = tagged.groupBy(partition_col, "__rng").agg(
        F.sum("n_tokens").alias("__rng_tokens")
    )
    wo = Window.partitionBy(partition_col).orderBy("__rng")
    offsets = totals.withColumn(
        "__rng_offset",
        F.coalesce(
            F.sum("__rng_tokens").over(
                wo.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).select(partition_col, "__rng", "__rng_offset")
    return (
        tagged.join(F.broadcast(offsets), [partition_col, "__rng"])
        .withColumn(
            "start_offset",
            F.col("__rng_offset")
            + F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("shard_id", F.floor(F.col("start_offset") / F.lit(budget)))
        .drop("__rng", "__rng_offset", "start_offset")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str = "lang",
    *,
    budget: int = 512,
    range_splits: int = DEFAULT_RANGE_SPLITS,
) -> DataFrame:
    """Pack documents into fixed token-budget shards, per partition
    column, in stable ``id_col`` order: a document starts a new shard
    when its start offset crosses a budget boundary (contiguous fill —
    the streaming-friendly packing a tokenizer shard-writer uses).

    Output: one row per shard with document/token rollups.  The
    cumulative sum is the two-level range decomposition (module
    docstring): ~``range_splits`` parallel sort tasks per stratum even
    when one language is the whole corpus, bit-identical results.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long")
    slim = docs.select(
        F.col(partition_col), F.col(id_col), toks.alias("n_tokens")
    )
    packed = _shard_tagged(slim, id_col, partition_col, budget, range_splits)
    return packed.groupBy(partition_col, "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunker — split each document into
    ``window``-token chunks stepping ``window - overlap``, the standard
    context-window preparation for LM training data.

    Chunk count is the closed form ``max(1, ceil((n - overlap)/step))``
    so the final chunk always contributes new tokens (no fully-redundant
    tail chunk).  Map-only: tokenize → sequence → explode → slice, zero
    shuffle — at 100 TB this runs at scan speed and parallelism is the
    input split count.

    Output: (id, chunk_id, chunk_text, n_tokens), one row per chunk.
    """
    if not 0 <= overlap < window:
        raise ValueError("require 0 <= overlap < window")
    step = window - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    d = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    k = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(float(step))).cast("long"),
    )
    d = d.withColumn("__i", F.explode(F.sequence(F.lit(0).cast("long"), k - 1)))
    chunk = F.slice(
        F.col("__toks"), (F.col("__i") * step + 1).cast("int"), window
    )
    return d.select(
        F.col(id_col),
        F.col("__i").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# per-source quota


def source_quota(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    *,
    k: int = 25,
    buckets: int = 16,
) -> DataFrame:
    """Cap any one source's contribution at its top-``k`` documents by
    (n_chars desc, id asc) — the domain-balancing pass that stops one
    crawl host from dominating a mixture.

    Two-phase salted top-k (the `w_topk_salted`-proven shape from
    operators/scale.py): phase 1 ranks inside (source, salt) and keeps
    at most ``k`` rows per bucket, so a crawl domain holding half the
    corpus contributes at most ``buckets * k`` rows to phase 2; phase 2
    computes the EXACT rank over that bounded survivor set.  The
    (n_chars desc, id asc) order is total, so every phase-2 survivor
    set contains the true top-k and the output is identical to the
    direct single-window plan."""
    order = [F.col("n_chars").desc(), F.col(id_col).asc()]
    slim = docs.select(id_col, source_col, "n_chars").withColumn(
        "__salt", F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(buckets))
    )
    w1 = Window.partitionBy(source_col, "__salt").orderBy(*order)
    survivors = (
        slim.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (
        # long, not int: the oracle's ROW_NUMBER() is BIGINT and the
        # driver's value hash is type-sensitive (tools/type_sweep.py)
        survivors.withColumn(
            "rank_in_source", F.row_number().over(w2).cast("long")
        )
        .where(F.col("rank_in_source") <= k)
        .select(id_col, source_col, "n_chars", "rank_in_source")
    )


# ---------------------------------------------------------------------------
# PII scrubbing

#: mask patterns chosen to parse identically under Java regex (Spark)
#: and RE2 (DuckDB): character classes, bounded repetition, \b, \d only.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d?[- ]?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
}


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails / IPv4s / phone-shaped numbers and count each — the
    privacy-scrub pass of a training-data pipeline.  Pure regexp
    expressions, map-only, zero shuffle; the masked text is returned
    whole (callers hash or store it) plus per-kind counts and a clean
    flag.  Mask order is fixed (email → ip → phone) so overlapping
    matches resolve identically everywhere."""
    out = docs.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    masked = F.col("__t")
    for kind, (pat, mask) in PII_PATTERNS.items():
        # group 0 = the whole match (the patterns carry no capture groups)
        counts.append(
            F.size(F.regexp_extract_all(F.col("__t"), F.lit(pat), F.lit(0)))
            .alias(f"n_{kind}s")
        )
        masked = F.regexp_replace(masked, pat, mask)
    total = sum(
        F.size(F.regexp_extract_all(F.col("__t"), F.lit(p), F.lit(0)))
        for p, _ in PII_PATTERNS.values()
    )
    return out.select(
        id_col,
        *counts,
        masked.alias("masked_text"),
        F.when(total == 0, F.lit(1)).otherwise(F.lit(0)).alias("is_clean"),
    )


# ---------------------------------------------------------------------------
# CCNet-style quality buckets


def quality_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    partition_col: str = "lang",
    score_col: str = "quality",
    *,
    range_splits: int = DEFAULT_RANGE_SPLITS,
) -> DataFrame:
    """Per-language head/middle/tail terciles by quality score (CCNet's
    perplexity-bucket split, with this engine's quality score standing in
    for the LM perplexity).  Fully tie-broken ordering (score desc, id
    asc) keeps the split deterministic across engines.

    Skew-safe: the global per-language rank is the two-level range
    decomposition (module docstring) — score-range tag via broadcast
    quantile boundaries, per-(lang, range) local row_number, plus the
    exact count of rows in better ranges.  The tercile then comes from
    ntile's own bucket-size rule computed in closed form: with n rows,
    bucket t holds floor(n/3) rows plus one extra for t <= n mod 3, so
    the cumulative cutoffs are c_t = t*floor(n/3) + min(t, n mod 3) and
    tercile = CASE rank <= c1 / <= c2 / else — exactly SQL ntile(3) for
    every n, without ever sorting a whole language in one task."""
    base = scored.select(
        F.col(id_col),
        F.col(partition_col),
        F.col(score_col).cast("double").alias(score_col),
    )
    tagged = _range_tag(
        base, partition_col, score_col, range_splits, descending=True
    )
    counts = tagged.groupBy(partition_col, "__rng").agg(
        F.count(F.lit(1)).alias("__rng_n")
    )
    wo = Window.partitionBy(partition_col).orderBy("__rng")
    offsets = (
        counts.withColumn(
            "__prior",
            F.coalesce(
                F.sum("__rng_n").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "__n", F.sum("__rng_n").over(Window.partitionBy(partition_col))
        )
        .select(partition_col, "__rng", "__prior", "__n")
    )
    w = Window.partitionBy(partition_col, "__rng").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = tagged.join(
        F.broadcast(offsets), [partition_col, "__rng"]
    ).withColumn("__rank", F.col("__prior") + F.row_number().over(w))
    q3 = F.floor(F.col("__n") / 3)
    m3 = F.col("__n") % 3
    c1 = q3 + F.least(F.lit(1).cast("long"), m3)
    c2 = 2 * q3 + F.least(F.lit(2).cast("long"), m3)
    tile = (
        F.when(F.col("__rank") <= c1, F.lit(1))
        .when(F.col("__rank") <= c2, F.lit(2))
        .otherwise(F.lit(3))
    )
    return ranked.select(
        id_col,
        partition_col,
        score_col,
        tile.cast("long").alias("tercile"),
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tile
        ).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# exact duplicated-span flagging (substring-level dedup)


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_df: int = 2,
    max_dup_frac: float = 0.3,
) -> DataFrame:
    """Per-document coverage by word spans duplicated ANYWHERE in the
    corpus — the substring-level dedup of Lee et al., "Deduplicating
    Training Data Makes Language Models Better".

    A duplicated span of ≥ k tokens contains a duplicated k-gram and
    vice versa, so corpus-wide k-gram position matching finds exactly
    the tokens covered by ≥k-token duplicated spans: positions of grams
    whose corpus DF ≥ ``min_df`` are merged as [pos, pos+k) intervals
    via one lead() window (union length = Σ min(k, next-pos)).

    At 100 TB the single corpus-wide groupBy on the 8-byte gram hash is
    the honest cost of substring dedup — the distributed analogue of the
    suffix-array pass — and everything downstream touches only the
    duplicated positions. Within-document repeats count (they are
    duplicated text to a trainer too).
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    base = fan_out(docs).select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens"),
        word_ngrams(F.col(text_col), k).alias("grams"),
    )
    # (id, pos, h) feeds BOTH the corpus-wide DF aggregate and the
    # coverage join; without the persist the k-gram build + md5 hashing
    # (the expensive map) runs twice. ~20 bytes/row — the same compact
    # derived artifact hashed_shingles persists for the jaccard family.
    grams = scoped_persist(
        base.select(
            id_col, F.posexplode("grams").alias("pos", "gram")
        ).select(
            id_col,
            "pos",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    cov = (
        grams.join(dup, "h")
        .withColumn("nxt", F.lead("pos").over(w))
        .withColumn(
            "contrib",
            F.when(F.col("nxt").isNull(), F.lit(k)).otherwise(
                F.least(F.lit(k), F.col("nxt") - F.col("pos"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("contrib").alias("dup_tokens"),
        )
    )
    return (
        base.select(id_col, "n_tokens")
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
                6,
            ).alias("dup_frac"),
        )
        .withColumn(
            "passes_dup_spans",
            F.when(F.col("dup_frac") <= max_dup_frac, F.lit(1)).otherwise(F.lit(0)),
        )
    )


def write_curated_shards(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str = "lang",
    *,
    budget: int = 512,
    range_splits: int = DEFAULT_RANGE_SPLITS,
) -> None:
    """Ship the curated corpus: every document tagged with its
    token-budget shard (same assignment as :func:`pack_sequences`) and
    written as parquet partitioned by (partition column, shard).

    Directory-partitioned output is the contract a downstream tokenizer
    fleet wants — each worker claims whole shard directories, no global
    coordination. The write itself is Spark-native (no custom sink);
    at 100 TB the only wide work is the skew-safe two-level packing
    decomposition the shard assignment already needs (full rows ride
    the per-range window shuffle once; the offset frame broadcasts).
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long")
    tagged = _shard_tagged(
        docs.withColumn("n_tokens", toks),
        id_col,
        partition_col,
        budget,
        range_splits,
    )
    # AQE coalesces the packing shuffle (a few MB) down to ONE
    # partition, and a dynamic-partition write then creates every
    # (partition, shard) directory's file from that single task —
    # hundreds of serial parquet writer inits (measured: 530 dirs
    # ≈ 7-10 s in one task). Hash-distributing whole directories
    # across the cores (explicit numPartitions — AQE never coalesces
    # a user-specified count) keeps the exact same one-file-per-
    # directory layout while the writer inits run in parallel.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    tagged = tagged.repartition(
        n_parts, F.col(partition_col), F.col("shard_id")
    )
    tagged.write.mode("overwrite").partitionBy(partition_col, "shard_id").parquet(
        out_dir
    )


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: float = 0.5,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document perplexity under an add-k smoothed bigram LM trained
    on ``reference`` — the actual CCNet quality signal (Wenzek et al.
    2020 train a KenLM on Wikipedia and bucket the crawl by perplexity;
    the engine's heuristic ``quality_score`` is the cheap stand-in, this
    is the mechanism).

    LM: p(w | prev) = (c(prev, w) + k) / (c(prev) + k·V) with V =
    |reference vocab| + 1 (the OOV bucket) and a sentence-start token
    before the first word. Training is two partial-aggregated groupBys
    over the reference; scoring joins the (broadcast) count tables and
    then folds log-probs **in token order** per document
    (sort_array(collect_list(struct(pos, logp))) + left fold) — an
    ordered IEEE sum, NOT an unordered SQL SUM, so the result is
    bit-reproducible and engine-portable (the same left-fold-float rule
    every other gate follows). Output: n_bigrams, avg_logprob (round
    6), perplexity = exp(-avg) (round 4).

    100 TB shape: the count tables are vocabulary-bounded, and HOW they
    join is decided by measurement, not hope — one count over the
    (persisted) bigram-type table picks the path:

    - ≤ ``broadcast_limit`` bigram types → broadcast map-side joins
      (scoring is one explode + two map-side joins + one groupBy(doc));
    - above it (open-vocabulary reference: web-scale n-gram tables) →
      plain shuffled joins on (prev, w)/(prev), which Spark partitions
      like any fact-fact join. Values are identical either way (the
      per-document fold is unchanged) — the threshold moves bytes, not
      results, which is what lets the same gate oracle check both paths
      (tests force the fallback with broadcast_limit=0).
    """
    bos = F.lit("<s>")
    toks = F.split(F.trim(F.col(text_col)), " ")
    prevs = F.concat(F.array(bos), F.slice(toks, 1, F.size(toks) - 1))

    def bigram_rows(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.posexplode(F.arrays_zip(prevs.alias("p"), toks.alias("w"))).alias(
                "pos", "bg"
            ),
        ).select(
            id_col, "pos", F.col("bg.p").alias("prev"), F.col("bg.w").alias("w")
        )

    ref_bg = bigram_rows(reference)
    # persisted: consumed by the type-count probe AND the scoring join
    c2 = scoped_persist(
        ref_bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = ref_bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        reference.select(F.explode(toks).alias("w")).distinct().count() + 1
    )  # +1 = OOV bucket
    if c2.count() <= broadcast_limit:
        c2j, c1j = F.broadcast(c2), F.broadcast(c1)
    else:
        c2j, c1j = c2, c1  # open vocabulary: shuffled joins

    scored = (
        bigram_rows(docs)
        .join(c2j, ["prev", "w"], "left")
        .join(c1j, "prev", "left")
        .select(
            id_col,
            "pos",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * v))
            ).alias("logp"),
        )
    )
    folded = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("logp")))
                ),
                lambda s: s["logp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_logp"),
    )
    avg = F.col("sum_logp") / F.col("n_bigrams")
    return folded.select(
        id_col,
        "n_bigrams",
        F.round(avg, 6).cast("double").alias("avg_logprob"),
        F.round(F.exp(-avg), 4).cast("double").alias("perplexity"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    *,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
) -> DataFrame:
    """Deterministic train/val/test assignment from the stable document
    id — reproducible across runs/engines with no RNG state, the split
    every training pipeline needs to survive re-sharding: u = md5-prefix
    uniform[0,1); u < val_frac → val, u < val+test → test, else train.
    Map-only; the same :func:`uniform_hash` the temperature sampler
    uses (so a doc's u is consistent across curation passes)."""
    u = uniform_hash(F.col(id_col))
    return docs.select(
        F.col(id_col),
        F.round(u, 6).cast("double").alias("u"),
        F.when(u < val_frac, F.lit("val"))
        .when(u < val_frac + test_frac, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def mixture_plan(
    docs: DataFrame,
    strata: list[str],
    text_col: str = "text",
    *,
    alpha: float = 0.5,
    budget_tokens: int = 100_000,
) -> DataFrame:
    """The training-mixture allocation table: per stratum, available
    tokens, temperature weight ∝ N_tokens^alpha (normalized), the
    token allocation round(budget · weight), the sampling rate vs
    available, and an achievable flag (allocation ≤ available ⇔ rate ≤
    1 — an over-allocated stratum needs up-sampling/epochs).

    Exact integer/decimal arithmetic end to end (pow is the one float —
    the same engine-portable usage the temperature sampler gates), one
    token-count aggregate + a tiny per-stratum frame."""
    n_toks = F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long")
    counts = docs.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks).alias("n_tokens"),
    )
    # the normalizer is an ORDERED left fold over strata (sorted by the
    # stratum key), not an unordered SUM: float addition order would
    # otherwise depend on partition placement and could flip the
    # 6-decimal rounding / integer allocation against the oracle
    key = F.concat_ws("|", *[F.col(s).cast("string") for s in strata])
    tot = counts.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            key.alias("k"),
                            F.pow(F.col("n_tokens"), F.lit(alpha)).alias("p"),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z")
    )
    w = F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("z")
    alloc = F.round(w * budget_tokens).cast("long")
    return counts.crossJoin(F.broadcast(tot)).select(
        *strata,
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        F.round(w, 6).cast("double").alias("weight"),
        alloc.alias("allocated_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).cast("double").alias("sample_rate"),
        (alloc <= F.col("n_tokens")).cast("int").alias("achievable"),
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words_per_line: int = 3,
    min_kept_lines: int = 2,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2), line-granular:
    keep only lines that end in terminal punctuation AND have at least
    ``min_words_per_line`` words; drop the whole page if it contains
    "lorem ipsum" or a curly brace (code/boilerplate tells), or if
    fewer than ``min_kept_lines`` lines survive.

    Pure higher-order functions over the split line array — map-only,
    zero shuffle, the same single-pass shape as the other quality
    filters. Output: the cleaned text (kept lines re-joined), line
    accounting, and the page-level keep flag.
    """
    raw = F.col(text_col)
    lines = F.split(raw, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r"[.!?\"']$")
        & (
            F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        ),
    )
    has_lorem = F.lower(raw).contains("lorem ipsum")
    has_brace = raw.contains("{") | raw.contains("}")
    n_kept = F.size(kept)
    page_keep = (
        ~has_lorem & ~has_brace & (n_kept >= min_kept_lines)
    ).cast("int")
    return docs.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        page_keep.alias("page_keep"),
    )


#: entity → replacement, applied after tag removal, in this order (the
#: &amp; rule runs LAST so "&amp;lt;" decodes to "&lt;", not "<" — the
#: single-pass decode real extractors use to avoid double-decoding)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """WET-style text extraction: drop <script>/<style> blocks wholesale,
    remove remaining tags, decode the common entities (single pass,
    &amp; last), collapse runs of whitespace — the markup-to-text step a
    web-crawl corpus runs before any quality scoring.

    Pure regexp expressions (Java-regex ∩ RE2 subset: case-insensitive
    groups, lazy dot-all via [\\s\\S], no backrefs), map-only, zero
    shuffle. Output keeps the cleaned text plus n_tags_removed so a
    markup-density filter can gate on it.
    """
    raw = F.col(text_col)
    # per-tag patterns rather than a <(script|style)>...</\1> backref:
    # backreferences are outside the RE2 subset the oracle can replay
    block_script = r"(?i)<script\b[^>]*>[\s\S]*?</script\s*>"
    block_style = r"(?i)<style\b[^>]*>[\s\S]*?</style\s*>"
    tag = r"<[^>]+>"
    n_tags = F.size(F.regexp_extract_all(raw, F.lit(tag), F.lit(0)))
    cleaned = F.regexp_replace(raw, block_script, " ")
    cleaned = F.regexp_replace(cleaned, block_style, " ")
    cleaned = F.regexp_replace(cleaned, tag, " ")
    for ent, rep in HTML_ENTITIES:
        cleaned = F.regexp_replace(cleaned, ent, rep)
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return docs.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        n_tags.cast("int").alias("n_tags_removed"),
        F.length(cleaned).cast("int").alias("n_clean_chars"),
    )


#: scheme://host[:port]/... — host captured; RE2-safe (no lookarounds)
_URL_RE = r"(?i)\bhttps?://([A-Za-z0-9.-]+)(?::\d+)?(?:/[^\s]*)?"


def extract_domains(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document URL/domain bookkeeping for crawl curation: URL
    count, distinct registrable-ish domains (host lowercased, leading
    'www.' stripped), sorted + joined for determinism. Map-only regexp
    pass; the domain list is what per-source quotas and link-density
    filters key on when the corpus carries inline URLs."""
    raw = F.col(text_col)
    hosts = F.transform(
        F.regexp_extract_all(raw, F.lit(_URL_RE), F.lit(1)),
        lambda h: F.regexp_replace(F.lower(h), r"^www\.", ""),
    )
    distinct_sorted = F.array_sort(F.array_distinct(hosts))
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(raw, F.lit(_URL_RE), F.lit(0)))
        .cast("int")
        .alias("n_urls"),
        F.size(distinct_sorted).cast("int").alias("n_domains"),
        F.array_join(distinct_sorted, ",").alias("domains"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    top_k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Adjacent character-pair frequencies — the statistic BPE tokenizer
    training maximizes on its first merge step — computed the way a
    corpus-scale BPE trainer actually does it: tokens are first
    collapsed to a (token, count) histogram (shuffle keyed on the token,
    cardinality = vocabulary, NOT corpus size), then each DISTINCT token
    contributes its within-token character pairs weighted by its corpus
    count. The second aggregate runs over |vocab| x avg_token_len rows —
    at 100 TB that is orders of magnitude below touching every token
    occurrence again, and it is the exact same counts.
    """
    tok_counts = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # tokens of length 1 have no pairs: sequence(1, 0) counts DOWN, so
    # guard to an empty array (same trap as word_ngrams)
    idx = F.sequence(F.lit(1), F.length("token") - 1)
    pair_arr = F.when(
        F.length("token") >= 2,
        F.transform(
            idx,
            lambda i: F.concat(
                F.substr(F.col("token"), i, F.lit(1)),
                F.substr(F.col("token"), i + F.lit(1), F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = tok_counts.select(F.explode(pair_arr).alias("pair"), F.col("n"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
) -> DataFrame:
    """The REVERSE direction of :func:`decontaminate`: per benchmark
    document, how much of the corpus collides with it — the report an
    eval owner reads to decide which benchmark items are burned.

    Output per benchmark doc: number of distinct corpus documents
    sharing >= 1 word n-gram, and total shared gram occurrences.
    The (gram -> benchmark id) map is tiny and broadcast; the corpus
    side is decided map-side and only (bench_id, corpus_id) hits are
    aggregated — same 100 TB shape as decontaminate.
    """
    bench_grams = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).distinct()
    corpus_grams = fan_out(docs).select(
        F.col(id_col).alias("corpus_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram", "inner")
    agg = hits.groupBy("bench_id").agg(
        F.count_distinct("corpus_id").alias("n_corpus_docs"),
        F.count(F.lit(1)).alias("n_shared_grams"),
    )
    return (
        benchmark.select(F.col(id_col).alias("bench_id"))
        # bounded by |benchmark| — broadcast so the assembly never sorts
        .join(F.broadcast(agg), "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce("n_corpus_docs", F.lit(0))
            .cast("long")
            .alias("n_corpus_docs"),
            F.coalesce("n_shared_grams", F.lit(0))
            .cast("long")
            .alias("n_shared_grams"),
        )
    )


def vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    *,
    top_k: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Corpus vocabulary for tokenizer training: token → (count,
    doc_frequency), top-k by count with deterministic token tie-break.

    One explode + one groupBy keyed on the token — map-side partial
    aggregation does the heavy lifting, so the shuffle carries one row
    per distinct (partition, token), not per occurrence. The top-k is a
    single driver-bounded sort; ``min_count`` prunes the hapax tail
    BEFORE the sort (at web scale the tail is most of the vocabulary).
    """
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("token")
    )
    # doc frequency needs the doc identity; recompute with distinct per doc
    per_doc = docs.select(
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), " "))
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("doc_frequency"))
    return (
        counts.join(dfreq, "token")
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(top_k)
    )
