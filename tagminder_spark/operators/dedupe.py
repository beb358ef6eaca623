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
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    shingles = F.transform(idx, lambda i: shingle_at(i))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .where(F.size(toks) >= n)
        .distinct()
    )


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
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold (exact).

    Any pair with Jaccard > 0 shares ≥1 shingle, so the shared-shingle
    equi-join proposes a superset of qualifying pairs; intersection counts
    come free from the join's groupBy. Scale note: shingle document
    frequency bounds the fan-out; for web-scale corpora add a DF cap on
    the join key (drops only pairs whose every common shingle is a
    stop-shingle — tune cap to keep that impossible above threshold).
    """
    sh = word_shingles(df, id_col, text_col, n)
    card = sh.groupBy("id").agg(F.count(F.lit(1)).alias("card"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = card.alias("ca")
    cb = card.alias("cb")
    return (
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
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

def minhash_signatures(
    shingles: DataFrame, k: int = 32
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over shingles of (a_i*h + b_i) mod p."""
    h = F.pmod(portable_hash60(F.col("shingle")), F.lit(MERSENNE31)).alias("h")
    base = shingles.select("id", h)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))).alias(
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
    sh = word_shingles(df, id_col, text_col, n)
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
    exact = ngram_jaccard_pairs(df, id_col, text_col, n, threshold=0.0)
    return (
        candidates.join(exact, ["id_a", "id_b"])
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
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of 4 15-bit bands
    (guarantees recall for hamming ≤ 3; wider radii trade recall), then
    exact hamming distance filter."""
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
    banded = sigs.select("id", "simhash", F.explode(bands).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
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
    norms = v.withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
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
