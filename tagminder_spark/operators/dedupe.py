"""Deduplication operator family for large-scale document pipelines.

All variants share two design rules:
1. **Portable deterministic hashing** — the base hash of a token/shingle is
   the first 15 hex digits of its md5, read as a 60-bit integer. Both the
   JVM (``conv(substr(md5(s),1,15),16,10)``) and ANSI-SQL engines
   (``('0x' || substr(md5(s),1,15))::BIGINT``) produce the identical value,
   so every approximate operator here is *exactly* reproducible by the
   DuckDB oracle — no "approximately matches" hand-waving.
2. **Candidate generation before verification** — pairs are proposed by an
   equi-join (shared shingle / LSH band / IVF cell), then verified exactly.
   The joins are plain shuffles on small keys; nothing is O(n²) in the
   corpus. At 100 TB the band join is the only wide shuffle and it carries
   (band_id, signature) keys only.

The reference's one fuzzy operator (string_grouper TF-IDF cosine,
/root/reference/scripts/pipeline/10-normalize-genres-and-styles.py:344-394
and 15-contributor-similarity-analysis.py:225-313) maps onto the same
candidate→verify shape; MinHash-LSH here is its scalable stand-in
(SURVEY.md §2.8 "fuzzy similarity").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagminder_spark.cache import scoped_persist
from tagminder_spark.session import spread

MERSENNE31 = 2_147_483_647  # 2^31 - 1; keeps a*h+b inside int64


def portable_hash60(c: Column) -> Column:
    """60-bit integer from md5 hex — identical in Spark and ANSI SQL."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`portable_hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Fixed (a, b) coefficients for the k permutation hashes.

    Deterministic small odd multipliers/offsets; shared verbatim by the
    Spark plan and the generated oracle SQL.
    """
    return [(2 * i + 1, 7919 * (i + 1) % MERSENNE31) for i in range(k)]


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------

def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Pure expression pipeline: split → slide a window via transform over
    index sequence → distinct. No UDFs, fully codegen'd.
    """
    # Materialize the token array once: element_at inside a transform
    # lambda would otherwise re-evaluate split() per element (O(len²)).
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("toks")
    ).where(F.size("toks") >= n)
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    shingles = F.transform(idx, lambda i: shingle_at(i))
    return base.select("id", F.explode(shingles).alias("shingle")).distinct()


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, h) with h = 60-bit portable shingle hash.

    The hash is computed *before* the distinct/shuffle so every downstream
    exchange, sort, and join key is an 8-byte long instead of a ~20-byte
    string — at 100 TB that halves shuffle volume and makes the sort-merge
    compares branchless. Collisions (~n²/2⁶¹) are negligible; the DuckDB
    oracle runs the same hashed pipeline so parity is exact by
    construction.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("toks")
    ).where(F.size("toks") >= n)
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    hashes = F.transform(idx, lambda i: portable_hash60(shingle_at(i)))
    return base.select("id", F.explode(hashes).alias("h")).distinct()


def shingle_intersections(sh: DataFrame) -> DataFrame:
    """(id_a, id_b, n_common) for every pair sharing ≥1 hashed shingle."""
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def jaccard_for_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set only.

    The shingle table is rolled up ONCE into per-id sorted arrays (one
    groupBy; array length bounded by document length), then each pair
    joins two id-keyed rows and intersects in-row — cost
    O(|pairs| · shingles/doc), and the corpus-proportional shingle table
    is never re-shuffled per pair (the old shape joined it twice). This
    is the verification half of any LSH scheme at scale. Pairs with no
    common shingle drop out (jaccard would be 0), preserving the
    contract of the previous join-based implementation.
    """
    sets = sh.groupBy("id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("card"),
    )
    sa = sets.select(
        F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("card").alias("card_a")
    )
    sb = sets.select(
        F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("card").alias("card_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "n_common", F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
        )
        .filter(F.col("n_common") > 0)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("card_a") + F.col("card_b") - F.col("n_common")),
                6,
            ),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def jaccard_from_shingles(
    sh: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard for all shingle-sharing pairs of a hashed-shingle set."""
    card = sh.groupBy("id").agg(F.count(F.lit(1)).alias("card"))
    inter = shingle_intersections(sh)
    ca = card.alias("ca")
    cb = card.alias("cb")
    out = (
        inter.join(ca, F.col("id_a") == F.col("ca.id"))
        .join(cb, F.col("id_b") == F.col("cb.id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("ca.card") + F.col("cb.card") - F.col("n_common")),
                6,
            ),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_keepers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: every row mapped to the keeper (min id)
    of its normalized-text group, plus membership stats."""
    from pyspark.sql import Window as W

    norm = F.md5(F.lower(F.trim(F.col(text_col))))
    w = W.partitionBy("text_hash")
    return (
        df.select(F.col(id_col).alias("id"), norm.alias("text_hash"))
        .withColumn("keeper_id", F.min("id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_dup", (F.col("id") != F.col("keeper_id")).cast("int"))
        .select("id", "text_hash", "keeper_id", "group_size", "is_dup")
    )


# --------------------------------------------------------------------------
# exact n-gram jaccard over shared-shingle candidates
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold (exact).

    Any pair with Jaccard > 0 shares ≥1 shingle, so the shared-shingle
    equi-join proposes a superset of qualifying pairs; intersection counts
    come free from the join's groupBy.

    ``max_df`` is the web-scale fan-out bound: shingles appearing in more
    than ``max_df`` documents are excluded from the *candidate join keys*
    (a hot shingle otherwise produces O(df²) candidate pairs — quadratic
    blow-up on boilerplate text). Verification still runs on the FULL
    shingle sets, so every reported Jaccard is exact; the only possible
    loss is a pair whose common shingles are ALL hot. A qualifying pair
    (j ≥ t) shares ≥ t/(1+t) of its smaller set — near-dup text virtually
    always includes rare shingles — and the cap is tuned so that loss is
    empirically zero at gate scale (max observed DF ≪ cap; see
    tests/test_dedupe.py::test_ngram_df_cap_lossless_and_bounded).
    """
    sh = hashed_shingles(df, id_col, text_col, n)
    if max_df is None:
        return jaccard_from_shingles(sh, threshold)
    sh = sh.persist()
    counts = (
        sh.groupBy("h").agg(F.count(F.lit(1)).alias("df")).persist()
    )
    try:
        # Adaptive fast path: one cheap reduction over the (persisted)
        # per-shingle DF counts tells us whether any shingle exceeds the
        # cap. On clean corpora (no hot shingles) the capped plan is
        # IDENTICAL to the uncapped one, so skip the anti-join +
        # distinct + pair-verify machinery entirely — measured 4.3×
        # overhead at gate scale for zero benefit. The one-row max is a
        # legitimate driver-side scalar (same class as k-means' k-row
        # centroid collect); the counts frame is persisted so the hot
        # list on the slow path reuses the same aggregation.
        observed = counts.agg(F.max("df")).first()[0]
        if observed is None or observed <= max_df:
            return jaccard_from_shingles(sh, threshold)
        # Candidate keys = shingles with DF <= cap; verification
        # reconstructs the EXACT full-set intersection as
        #   n_common = n_capped + |hot_a ∩ hot_b|
        # so the full shingle table is never re-shuffled per pair (the
        # old path ran distinct over candidates and then joined ALL
        # shingles twice — three extra wide shuffles). The self-join's
        # groupBy doubles as the capped share-count, the hot set is
        # broadcast-tiny by construction (≤ Σdf/max_df entries), and the
        # per-id hot-shingle arrays are a slim frame that joins against
        # the pair-sized candidate output only.
        hot = counts.filter(F.col("df") > max_df).select("h")
        capped = sh.join(F.broadcast(hot), "h", "left_anti")
        inter_capped = (
            capped.alias("a")
            .join(
                capped.alias("b"),
                (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_capped"))
        )
        hot_sets = (
            sh.join(F.broadcast(hot), "h")
            .groupBy("id")
            .agg(F.collect_set("h").alias("hs"))
        )
        card = sh.groupBy("id").agg(F.count(F.lit(1)).alias("card"))
        no_hot = F.array().cast("array<long>")
        # hot_sets/card are per-id frames: tiny at gate scale (AQE
        # broadcasts them), but O(n_docs) at 100 TB — no forced broadcast.
        out = (
            inter_capped.join(
                hot_sets.select(
                    F.col("id").alias("id_a"), F.col("hs").alias("hs_a")
                ),
                "id_a",
                "left",
            )
            .join(
                hot_sets.select(
                    F.col("id").alias("id_b"), F.col("hs").alias("hs_b")
                ),
                "id_b",
                "left",
            )
            .withColumn(
                "n_hot",
                F.size(
                    F.array_intersect(
                        F.coalesce(F.col("hs_a"), no_hot),
                        F.coalesce(F.col("hs_b"), no_hot),
                    )
                ),
            )
            .withColumn("n_common", F.col("n_capped") + F.col("n_hot"))
            .join(
                card.select(
                    F.col("id").alias("id_a"), F.col("card").alias("card_a")
                ),
                "id_a",
            )
            .join(
                card.select(
                    F.col("id").alias("id_b"), F.col("card").alias("card_b")
                ),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common")
                    / (F.col("card_a") + F.col("card_b") - F.col("n_common")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "n_common", "jaccard")
        )
        # Eager localCheckpoint pins the (pair-sized, small) verified
        # output so the shingle cache can be released here instead of
        # leaking for the session lifetime (the returned DataFrame's
        # lazy plan would otherwise be the only handle on the cache).
        return out.localCheckpoint(eager=True)
    finally:
        counts.unpersist()
        sh.unpersist()


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

def minhash_signatures(
    hashed: DataFrame, k: int = 32
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) from hashed shingles: min over shingles of
    (a_i*(h mod p) + b_i) mod p — one groupBy computing all k mins."""
    base = hashed.select("id", F.pmod(F.col("h"), F.lit(MERSENNE31)).alias("hm"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("hm") + F.lit(b), F.lit(MERSENNE31))).alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return base.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exactly verified.

    Shingle → k minhashes → ``bands`` bands of k/bands rows each; a pair
    sharing any full band becomes a candidate; candidates are verified
    with the exact Jaccard (so precision is exact; banding only governs
    recall — r=4 rows/band ⇒ P(candidate) = 1-(1-j^4)^8, ~0.97 at j=0.6).
    """
    rows_per_band = k // bands
    # The hashed-shingle set feeds three consumers (signatures, pair
    # intersections, cardinalities); persist it so the expensive
    # explode+distinct runs once. 16 bytes/row — at 100 TB input this is
    # the compact derived artifact you'd materialize anyway.
    sh = scoped_persist(hashed_shingles(df, id_col, text_col, n))
    sigs = minhash_signatures(sh, k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = scoped_persist(
        sigs.select("id", F.explode(band_structs).alias("bb")).select(
            "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        # both sides of the self-join would otherwise re-run the
        # 32-way min-aggregation over the shingle table
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Verify ONLY the candidates — cost scales with |candidates|, not with
    # corpus-wide shingle sharing.
    return (
        jaccard_for_pairs(sh, candidates)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# incremental MinHash-LSH (new batch vs standing index)
# --------------------------------------------------------------------------

def lsh_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 32,
    bands: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(banded, hashed_shingles) — the standing dedup index for a corpus.

    At 100 TB these two frames are what you PERSIST (bucketed by
    (band, bucket) and by id respectively); each new ingest batch then
    joins against them instead of re-mining the whole corpus. Both are
    pure derivations of the corpus, so the gate recomputes them; a real
    deployment reads them back from parquet.
    """
    rows_per_band = k // bands
    sh = hashed_shingles(df, id_col, text_col, n)
    sigs = minhash_signatures(sh, k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("id", F.explode(band_structs).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    return banded, sh


def compact_lsh_index(
    standing_index: tuple[DataFrame, DataFrame],
    new_index: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Fold a new batch's index into the standing index — the periodic
    compaction job the streaming probe's docstring names as the recall
    backstop (pairs straddling micro-batches become visible once both
    sides are in the standing index).

    New-version-wins on re-ingested ids (broadcast anti-join of the new
    batch's id set, same rule as :func:`incremental_lsh_pairs`), so
    ``compact(standing(A), index(B)) == lsh_index(A ∪ B)`` whenever B's
    ids replace any overlap — the identity the unit test pins. Cost is
    O(|standing| + |new|) map-side; in production the result is what
    gets re-persisted (bucketed) as the next standing artifact.
    """
    new_banded, new_sh = new_index
    old_banded, old_sh = standing_index
    new_ids = new_sh.select("id").dropDuplicates()
    return (
        old_banded.join(F.broadcast(new_ids), "id", "left_anti").unionByName(
            new_banded
        ),
        old_sh.join(F.broadcast(new_ids), "id", "left_anti").unionByName(new_sh),
    )


def incremental_lsh_pairs(
    new_index: tuple[DataFrame, DataFrame],
    standing_index: tuple[DataFrame, DataFrame],
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs TOUCHING a new batch: new x standing plus new x new.

    The candidate join probes only the new batch's bands against the
    union of both band indexes, so per-ingest cost is
    O(|new| + touched buckets) — independent of corpus size. This is the
    shape that keeps fuzzy dedup affordable when 100 TB grows daily:
    the standing index is an artifact, not a recomputation.

    Identity: over the combined corpus this emits exactly the pairs of
    the batch operator whose candidates include >=1 new id (same bands,
    same buckets, same exact verification) — the equivalence the gate's
    oracle states as a WHERE clause over the full-corpus SQL.

    Re-ingested ids (present in BOTH indexes — an update) are resolved
    new-version-wins: the standing index's rows for ids in the new batch
    are anti-joined away before the union, so a doc is never compared
    against its own stale shingles (which would silently understate
    Jaccard by doubling the union cardinality). The anti-join's right
    side is just the new batch's id set — O(|new|), broadcast at scale.
    """
    new_banded, new_sh = new_index
    old_banded, old_sh = standing_index
    new_ids = new_sh.select("id").dropDuplicates()
    old_banded = old_banded.join(F.broadcast(new_ids), "id", "left_anti")
    old_sh = old_sh.join(F.broadcast(new_ids), "id", "left_anti")
    all_banded = old_banded.unionByName(new_banded)
    a = new_banded.alias("a")
    b = all_banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    sh = old_sh.unionByName(new_sh)
    return (
        jaccard_for_pairs(sh, candidates)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def cross_batch_lsh_pairs(
    indexes: list[tuple[DataFrame, DataFrame]],
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs whose members sit in DIFFERENT batches of a
    window — the pairs the per-batch probes structurally cannot see
    (each micro-batch compares only against itself and the standing
    index; a pair split across two not-yet-folded batches is invisible
    to both probes).  Candidates are blocked on ``batch_a < batch_b``,
    so in-batch pairs and pairs against the standing index — both
    already emitted — never reappear; together with the per-batch
    probes this makes the streamed pair set EQUAL to the batch
    operator's (the recall-equality contract
    ``streaming_dedup_probe(fold_every=…)`` tests pin).

    Cost: one banded union over the window (bounded by the fold
    cadence), bucket-keyed candidate join, exact verification over the
    window's shingles — the same sub-linear shape as the per-batch
    probe, amortized once per fold."""
    banded = None
    sh = None
    for i, (b, s) in enumerate(indexes):
        tb = b.withColumn("__batch", F.lit(i))
        banded = tb if banded is None else banded.unionByName(tb)
        sh = s if sh is None else sh.unionByName(s)
    if banded is None:
        raise ValueError("cross_batch_lsh_pairs needs >= 1 index")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__batch") < F.col("b.__batch"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    return (
        jaccard_for_pairs(sh.dropDuplicates(["id", "h"]), candidates)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # from the 60-bit portable hash
SIMHASH_BAND_BITS = 15


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 60-bit SimHash over distinct word tokens.

    bit_j(sig) = 1 iff sum over tokens of (±1 by token-hash bit j) > 0.
    Expressed as 60 conditional-sum aggregates — one shuffle, no UDF.
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", portable_hash60(F.col("tok")))
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long") * (1 << j)).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    max_bucket: int | None | str = "auto",
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of 4 15-bit bands
    (guarantees recall for hamming ≤ 3; wider radii trade recall), then
    exact hamming distance filter.

    Saturation guard (round 6 — same rule as :func:`embedding_lsh_pairs`):
    the 15-bit bands have 2^15 buckets, so by the engine's own sizing
    rule they saturate around n ≈ 32768 · LSH_BUCKET_TARGET ≈ 5·10⁵
    docs — and exact-duplicate clusters land in ONE bucket at any n.
    ``max_bucket`` (default :data:`DEFAULT_MAX_BUCKET`) drops buckets
    with occupancy above the cap from candidate generation, bounding the
    self-join at bands · 2^15 · cap²/2 pairs regardless of corpus size;
    capped output ⊆ uncapped by construction (pinned by test). Pass
    ``None`` for exact banding semantics (the fixed-param oracle gates).
    """
    if max_bucket == "auto":
        max_bucket = DEFAULT_MAX_BUCKET
    sigs = simhash_signatures(df, id_col, text_col)
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                .alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    banded = scoped_persist(
        sigs.select("id", "simhash", F.explode(bands).alias("bb")).select(
            "id", "simhash", F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        # both join sides would re-run the 60-way conditional-sum
        # signature aggregation otherwise (same rule as minhash/LSH)
    )
    if max_bucket is not None:
        saturated = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("occ"))
            .filter(F.col("occ") > max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(saturated), ["band", "bucket"], "left_anti"
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# embedding LSH (random-hyperplane SimHash over vectors)
# --------------------------------------------------------------------------

def hyperplane_signs(bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components from md5 — shared verbatim by
    the Spark plan and the generated oracle SQL (like minhash_params)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()[:2], 16) & 1 else -1
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def signed_sum_expr(signs: list[int], elem: str) -> str:
    """``±elem(1) ± elem(2) ...`` with identical left-assoc structure in any
    engine (elem is a format string with ``{i}``, 1-based). Identical text
    structure ⇒ identical IEEE rounding ⇒ bit-equal signatures."""
    first = elem.format(i=1)
    expr = first if signs[0] > 0 else f"(0.0 - {first})"
    for i, s in enumerate(signs[1:], start=2):
        expr += (" + " if s > 0 else " - ") + elem.format(i=i)
    return expr


#: target mean bucket occupancy the banding derivation aims for: a band
#: of width r has 2^r buckets, so r ≈ log2(n / LSH_BUCKET_TARGET) keeps
#: the expected occupancy — and with it the per-bucket candidate
#: quadratic — constant as the corpus grows.
LSH_BUCKET_TARGET = 16

#: default saturation cap for band buckets (embedding LSH + SimHash):
#: a bucket holding more than this many members contributes up to
#: cap²/2 candidate pairs, so with the cap the WHOLE candidate join is
#: bounded by bands · 2^r · cap²/2 — independent of n. 256 is ~16× the
#: derivation's target occupancy: only buckets the banding has stopped
#: discriminating (degenerate/boilerplate signatures) ever reach it
#: (measured at gate scale: max occupancy 36 under derived bands, 61
#: even under the deliberately-narrow 4-bit gate bands).
DEFAULT_MAX_BUCKET = 256


def derive_banding(
    n: int, bands: int = 8, bucket_target: int = LSH_BUCKET_TARGET
) -> tuple[int, int]:
    """(bits, bands) sized for a corpus of ``n`` vectors.

    r = clamp(ceil(log2(n / bucket_target)), 4, 24): mean bucket
    occupancy stays ≈ ``bucket_target`` at any n, which is what keeps
    candidate generation linear (BASELINE §8 measured the fixed-r=4
    alternative at exponent 1.52 — O(n²) once the 16-bucket signature
    space saturated). The floor keeps tiny corpora sensible; the cap
    keeps the int bucket arithmetic comfortable and recall meaningful.
    """
    import math

    if n <= bucket_target:
        r = 4
    else:
        r = min(24, max(4, math.ceil(math.log2(n / bucket_target))))
    return bands * r, bands


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bits: int | None = None,
    bands: int | None = None,
    threshold: float = 0.4,
    max_bucket: int | None | str = "auto",
    n: int | None = None,
) -> DataFrame:
    """Near-dup vector pairs via random-hyperplane LSH — the bucketed
    replacement for the all-pairs cosine join.

    sign-bit_j = [Σ_i ±v_i > 0] with deterministic ±1 hyperplanes; ``bits``
    bits → ``bands`` bands; pairs sharing any full band become candidates
    (equi-join on (band, bucket) — NO nested-loop anywhere); candidates are
    verified with the exact left-fold cosine. Banding governs recall only
    (r=4, b=8 ⇒ ~75% at cos=0.4, ~98% at cos=0.8); precision is exact.
    At 100 TB: signature computation is a map, the band join shuffles
    (band, int-bucket, id) triples only, and verification touches vectors
    for candidate ids alone.

    **The defaults are scale-safe IN CODE** (round-6 close of the one
    measured super-linear shape, BASELINE §8): when ``bits``/``bands``
    are not given, band width is derived from the corpus count via
    :func:`derive_banding` (one cheap ``df.count()`` — pass ``n`` to
    skip it when the caller already knows the cardinality), and
    ``max_bucket`` defaults to the finite :data:`DEFAULT_MAX_BUCKET`
    saturation cap: buckets with occupancy > cap are dropped from
    candidate generation before the self-join — the same
    boilerplate-bucket guard as the n-gram DF cap, trading recall ONLY
    inside buckets that banding had stopped discriminating anyway.
    Fixed narrow bands (the measured 4-bit saturation: exponent 1.5 at
    just 20k vectors) now require BOTH explicit params and an explicit
    ``max_bucket=None`` — the combination the fixed-param oracle gates
    pin deliberately.
    """
    if bits is None or bands is None:
        bits, bands = derive_banding(
            n if n is not None else df.count(), bands=bands or 8
        )
    if max_bucket == "auto":
        max_bucket = DEFAULT_MAX_BUCKET
    r = bits // bands
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    signs = hyperplane_signs(bits, dim)
    # Signs-matrix literal + nested higher-order functions, NOT bits×dim
    # inline ± terms: the flat expansion is a ~2k-node expression tree that
    # janino re-compiles in every stage the signature frame appears in
    # (both sides of the band self-join) — measured 2.6 s vs 0.3 s for the
    # signature stage alone at sf0.1. The fold keeps the IDENTICAL
    # left-to-right IEEE summation as the oracle's ± chain (fold seeds
    # 0.0, and 0.0 + x == x, 0.0 - x == -x, ±1.0 * x exact), so
    # signatures stay bit-equal to the generated oracle SQL.
    signs_lit = F.array(
        *[F.array(*[F.lit(float(s)) for s in row]) for row in signs]
    )
    sums = F.transform(
        signs_lit,
        lambda row: F.aggregate(
            F.zip_with(row, F.col("v"), lambda s, x: s * x),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
    )
    sigs = v.select("id", "v", sums.alias("s"))
    bucket_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    (F.element_at(F.col("s"), b * r + k + 1) > 0).cast("int")
                    * (1 << (r - 1 - k))
                    for k in range(r)
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = scoped_persist(
        sigs.select("id", F.explode(bucket_structs).alias("bb")).select(
            "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        # both sides of the self-join would otherwise recompute the whole
        # scan + signature fold; the triples frame is bits/8 rows per
        # vector (tiny relative to the vectors themselves)
    )
    if max_bucket is not None:
        saturated = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("occ"))
            .filter(F.col("occ") > max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(saturated), ["band", "bucket"], "left_anti"
        )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )
    # consumed once per pair side — cache instead of re-folding the norms
    norms = scoped_persist(
        v.withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    )
    va = norms.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    vb = norms.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    # spread the BARE candidate pairs before attaching vectors: the
    # left-fold dot products (interpreted HOFs, one allocation per
    # element) dominate CPU while AQE sizes the join output at a
    # handful of tasks. The round-robin exchange carries 16 bytes/pair;
    # when the norms side broadcasts (it is dim·8 bytes/vector), the
    # folds inherit the full parallelism with no heavy exchange at all
    # (guide §2.5/§2.3 — shuffle keys, not payloads). ASSUMPTION: the
    # spread only pays while the norms side fits the broadcast
    # threshold; past it the planner hash-partitions the pairs right
    # after the round-robin exchange (one extra 16-byte/pair shuffle —
    # bounded overhead, and the fold parallelism then comes from the
    # hash exchange itself).
    return (
        spread(candidates).join(va, "id_a").join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact cosine near-duplicate pairs (brute force baseline).

    Left-fold dot products over double-cast arrays give bit-identical
    results across engines. The O(n²) pair join is the correctness
    baseline; the scale path is IVF bucketing (similarity.ivf_topk).
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )
    # both sides of the all-pairs join re-fold the norms otherwise
    norms = scoped_persist(
        v.withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    )
    a = norms.alias("a")
    b = norms.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
