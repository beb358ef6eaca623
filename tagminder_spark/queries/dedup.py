"""Deduplication query suite over the documents/embeddings tables.

Every variant — including MinHash-LSH and SimHash — carries an *exact*
DuckDB oracle: the operators are built on a portable md5-derived hash
(tagminder_spark.operators.dedupe.portable_hash60), so the approximate
algorithms are bit-for-bit reproducible in ANSI SQL. The oracle SQL for
the signature schemes is generated from the same constants the Spark plan
uses (single source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tagminder_spark.operators.dedupe import (
    MERSENNE31,
    SIMHASH_BAND_BITS,
    SIMHASH_BITS,
    derive_banding,
    embedding_lsh_pairs,
    embedding_neardup_pairs,
    exact_dup_keepers,
    hyperplane_signs,
    minhash_lsh_pairs,
    minhash_params,
    ngram_jaccard_pairs,
    signed_sum_expr,
    simhash_pairs,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table, spread

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# shared CTE fragments -----------------------------------------------------

_SHINGLES_CTE = """
toks AS (SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents),
u AS (SELECT id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
sh AS (SELECT DISTINCT a.id, a.w || ' ' || b.w || ' ' || c.w AS shingle
       FROM u a JOIN u b ON a.id = b.id AND b.i = a.i + 1
                JOIN u c ON a.id = c.id AND c.i = a.i + 2),
card AS (SELECT id, COUNT(*) AS card FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY 1, 2),
jac AS (SELECT id_a, id_b, n_common,
               ROUND(n_common * 1.0 / (ca.card + cb.card - n_common), 6) AS jaccard
        FROM inter JOIN card ca ON ca.id = id_a JOIN card cb ON cb.id = id_b)
"""

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

_EXACT_SQL = """
WITH h AS (SELECT doc_id AS id, md5(lower(trim(text))) AS text_hash FROM documents)
SELECT id, text_hash,
       MIN(id) OVER (PARTITION BY text_hash) AS keeper_id,
       COUNT(*) OVER (PARTITION BY text_hash) AS group_size,
       CASE WHEN id <> MIN(id) OVER (PARTITION BY text_hash) THEN 1 ELSE 0 END AS is_dup
FROM h
"""


@q("d_exact_dup", _EXACT_SQL)
def d_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (the A7 duplicate-tracks shape,
    scripts/reports/96-...py:182-205): normalized-text hash → window
    keeper assignment. At 100 TB: one shuffle on the 32-byte hash."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dup_keepers(d, "doc_id", "text")


# --------------------------------------------------------------------------
# exact n-gram jaccard
# --------------------------------------------------------------------------

_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE}
SELECT id_a, id_b, n_common, jaccard FROM jac WHERE jaccard >= 0.5
"""


@q("d_ngram_jaccard", _JACCARD_SQL)
def d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via the shared-shingle
    equi-join (candidate superset is provably complete for j > 0)."""
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


# --------------------------------------------------------------------------
# n-gram jaccard with shingle DF cap (the web-scale fan-out bound)
# --------------------------------------------------------------------------

_DF_CAP = 20

_JACCARD_CAP_SQL = f"""
WITH {_SHINGLES_CTE},
hh AS (SELECT id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM sh),
hot AS (SELECT h FROM hh GROUP BY h HAVING COUNT(*) > {_DF_CAP}),
keys AS (SELECT hh.id, hh.h FROM hh LEFT JOIN hot USING (h) WHERE hot.h IS NULL),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM keys a JOIN keys b ON a.h = b.h AND a.id < b.id)
SELECT j.id_a, j.id_b, j.n_common, j.jaccard
FROM jac j JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
WHERE j.jaccard >= 0.5
"""


@q("d_ngram_jaccard_capped", _JACCARD_CAP_SQL)
def d_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DF-capped shared-shingle candidate join: shingles in more than
    {cap} documents are excluded from the JOIN KEYS (bounding fan-out to
    O(cap²) pairs per shingle — the quadratic-blow-up guard for web-scale
    boilerplate), while Jaccard verification runs on the full shingle
    sets so precision stays exact. Cap ≫ max observed DF at gate scale,
    so the result equals the uncapped gate (proved by test)."""
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_df=_DF_CAP
    )


# --------------------------------------------------------------------------
# MinHash + LSH (generated oracle)
# --------------------------------------------------------------------------

_K, _BANDS, _ROWS = 32, 8, 4


def _minhash_sql() -> str:
    params = minhash_params(_K)
    sig_exprs = ",\n       ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE31}) AS sig_{i}"
        for i, (a, b) in enumerate(params)
    )
    # candidates as a UNION of per-band EQUI-joins (identical semantics
    # to the OR-of-band-conds form, but hash-joinable: the OR form is a
    # nested-loop in DuckDB and turns quadratic at the sf1 sweep scale)
    band_joins = "\n  UNION\n  ".join(
        "SELECT a.id AS id_a, b.id AS id_b FROM sig a JOIN sig b ON "
        + " AND ".join(
            f"a.sig_{bnd * _ROWS + r} = b.sig_{bnd * _ROWS + r}" for r in range(_ROWS)
        )
        + " AND a.id < b.id"
        for bnd in range(_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
h AS (SELECT id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {MERSENNE31} AS h
      FROM sh),
sig AS (SELECT id, {sig_exprs} FROM h GROUP BY id),
cand AS (
  {band_joins}
)
SELECT j.id_a, j.id_b, j.jaccard
FROM jac j JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
WHERE j.jaccard >= 0.5
"""


@q("d_minhash_lsh", _minhash_sql())
def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 8×4 LSH banding + exact verification — the scalable
    stand-in for the reference's string_grouper fuzzy matching (§2.8,
    scripts/pipeline/10-...py:344-394). The oracle replays the identical
    signature arithmetic, so this 'approximate' operator is exactly
    checked: banding governs recall, verification keeps precision exact."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5
    )


# --------------------------------------------------------------------------
# SimHash (generated oracle)
# --------------------------------------------------------------------------


def _simhash_sql() -> str:
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    sums = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    bucket_cols = ", ".join(
        f"(simhash >> {b * SIMHASH_BAND_BITS}) & {mask} AS bk_{b}"
        for b in range(n_bands)
    )
    band_joins = "\n  UNION\n  ".join(
        f"SELECT a.id AS id_a, b.id AS id_b FROM bk a JOIN bk b "
        f"ON a.bk_{b} = b.bk_{b} AND a.id < b.id"
        for b in range(n_bands)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents
), h AS (
  SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
  FROM toks WHERE tok <> ''
), sums AS (
  SELECT id, {sums} FROM h GROUP BY id
), sig AS (
  SELECT id, {sig} AS simhash FROM sums
), bk AS (
  SELECT id, simhash, {bucket_cols} FROM sig
), cand AS (
  {band_joins}
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM cand c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


@q("d_simhash", _simhash_sql())
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs: per-bit ±1 token votes → signature →
    15-bit-band LSH candidates → exact Hamming filter. Like MinHash, the
    portable hash makes the whole approximate pipeline oracle-exact."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(
        d, "doc_id", "text", max_hamming=6, max_bucket=None
    ).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------

_EMB_SQL = """
WITH v AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM v
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
                         (p, s) -> p + s) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.id < b.id
WHERE ROUND(list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
                        (p, s) -> p + s) / (a.nrm * b.nrm), 6) >= 0.4
"""


@q("d_embedding_neardup", _EMB_SQL)
def d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force exact baseline; IVF in
    simsearch is the scale path). Left-fold dot products keep IEEE
    ordering identical across engines."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, "vec_id", "embedding", threshold=0.4)


# --------------------------------------------------------------------------
# embedding LSH (generated oracle)
# --------------------------------------------------------------------------

_EMB_DIM, _EMB_BITS, _EMB_BANDS = 64, 32, 8


def _embedding_lsh_sql(bits: int = _EMB_BITS, bands: int = _EMB_BANDS) -> str:
    r = bits // bands
    signs = hyperplane_signs(bits, _EMB_DIM)
    bit_exprs = ",\n         ".join(
        f"CASE WHEN {signed_sum_expr(signs[j], 'v[{i}]')} > 0 THEN 1 ELSE 0 END AS bit_{j}"
        for j in range(bits)
    )
    bucket_exprs = ", ".join(
        " + ".join(f"bit_{b * r + k} * {1 << (r - 1 - k)}" for k in range(r))
        + f" AS bucket_{b}"
        for b in range(bands)
    )
    band_joins = "\n  UNION\n  ".join(
        f"SELECT a.id AS id_a, b.id AS id_b FROM bk a JOIN bk b "
        f"ON a.bucket_{b} = b.bucket_{b} AND a.id < b.id"
        for b in range(bands)
    )
    return f"""
WITH v AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), sig AS (
  SELECT id, v,
         {bit_exprs}
  FROM v
), bk AS (
  SELECT id, v, {bucket_exprs} FROM sig
), cand AS (
  {band_joins}
), n AS (
  SELECT id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM v
)
SELECT c.id_a, c.id_b,
       ROUND(list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
                         (p, s) -> p + s) / (a.nrm * b.nrm), 6) AS cosine
FROM cand c JOIN n a ON a.id = c.id_a JOIN n b ON b.id = c.id_b
WHERE ROUND(list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
                        (p, s) -> p + s) / (a.nrm * b.nrm), 6) >= 0.4
"""


@q("d_embedding_lsh", _embedding_lsh_sql())
def d_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed embedding pair-mining: random-hyperplane LSH (32 bits, 8×4
    bands) proposes candidates via an equi-join on (band, bucket) — no
    nested-loop join anywhere — then the exact left-fold cosine verifies.
    The deterministic ±1 hyperplanes are shared with the oracle, so the
    approximate pipeline is exactly checked. This is the scale path that
    replaces d_embedding_neardup's all-pairs join for pair mining."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return embedding_lsh_pairs(
        e, "vec_id", "embedding", dim=_EMB_DIM, bits=_EMB_BITS,
        bands=_EMB_BANDS, threshold=0.4, max_bucket=None,
    )


# --------------------------------------------------------------------------
# embedding LSH, DEFAULT (scale-safe) call path — corpus-derived banding
# --------------------------------------------------------------------------
# The driver's correctness corpus has 500 embeddings at every gate sf, so
# the derivation is pinned for the oracle: r = ceil(log2(500/16)) = 5 →
# 40 bits / 8 bands, generated from the SAME signs matrix. The gate fn
# always runs the TRUE default path (derive from the live count) — at
# bench/sf1 scales the derivation picks wider bands and there is no
# oracle to disagree with; if the correctness corpus ever changed
# cardinality, the derived params would diverge from the pinned oracle
# and the driver's hash check would flag it. The default
# DEFAULT_MAX_BUCKET=256 cap is active on the Spark side and the
# plain-banded SQL is still exact because no bucket comes near it at gate
# scale (measured max occupancy 36) — which is the point of the cap: it
# only bites where banding has degenerated.

_SCALED_N = 500
_SCALED_BITS, _SCALED_BANDS = derive_banding(_SCALED_N)


@q("d_embedding_lsh_scaled", _embedding_lsh_sql(_SCALED_BITS, _SCALED_BANDS))
def d_embedding_lsh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT embedding-LSH call path (round-6 VERDICT #1): no
    explicit bits/bands — the operator derives band width from the
    corpus count (one cheap aggregate) so occupancy, and with it the
    candidate-join cost per bucket, stays constant as n grows — and the
    finite max_bucket saturation cap is live. This is the configuration
    a user gets without reading the sizing docstring; the fixed-4-bit
    variant (d_embedding_lsh) stays gated as the deliberate narrow-band
    recall configuration."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return embedding_lsh_pairs(
        e, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.4
    )


# --------------------------------------------------------------------------
# connected components (pair → duplicate-cluster resolution)
# --------------------------------------------------------------------------
# Edge structure: star edges (block hub 8b → members 8b+1..8b+7); blocks
# with ordinal ≡ 0 (mod 10) bridge their last member to the next hub, so
# components span one or two blocks with diameter ≤ 4 (min-label
# propagation converges in a handful of rounds) — component id is a
# closed-form expression the oracle states directly, while the Spark side
# actually iterates.

_CC_SQL = """
WITH nodes AS (
  SELECT CAST(range AS BIGINT) AS node FROM range(4000)
), labeled AS (
  SELECT node, node // 8 AS blk FROM nodes
)
SELECT node,
       CASE WHEN blk % 10 = 1 THEN (blk - 1) * 8 ELSE blk * 8 END
         AS component
FROM labeled
"""


@q("d_connected_components", _CC_SQL)
def d_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: iterative min-label propagation over
    near-dup pair edges (operators/components.py). The synthesized graph
    (8-node chains, every 10th block bridged to the next) gives a
    closed-form oracle while the engine converges by iteration."""
    from tagminder_spark.operators.components import connected_components

    nodes = spark.range(4000).select(F.col("id").alias("node"))
    blk = (F.col("node") / 8).cast("long")
    star = nodes.filter(F.col("node") % 8 != 0).select(
        (blk * 8).alias("id_a"), F.col("node").alias("id_b")
    )
    bridge = nodes.filter(
        (blk % 10 == 0) & (F.col("node") % 8 == 7)
    ).select(F.col("node").alias("id_a"), (F.col("node") + 1).alias("id_b"))
    pairs = star.unionByName(bridge)
    cc = connected_components(pairs, max_iter=10)
    # every node of the fixed universe appears as an edge endpoint (hubs
    # via their members, bridged hubs via the bridge), so no isolated-
    # node union-back is needed here
    return cc.select("node", "component")

# --------------------------------------------------------------------------
# end-to-end dedup compositions: pairs → clusters → keeper election
# --------------------------------------------------------------------------
# A real training-data pipeline does not stop at pair mining: the pairs
# feed transitive closure and one canonical document is elected per
# cluster. These two gates run the WHOLE chain on the driver's tables —
# candidate generation (MinHash-LSH / hyperplane-LSH), exact verification,
# iterative connected components, keeper election — and the oracle
# replays it with a recursive CTE (min-label closure), so the composition
# is value-exact, not just each stage in isolation.


def _cc_closure_sql(pairs_sql: str, universe_sql: str, id_name: str) -> str:
    """Recursive-CTE oracle for pairs→clusters→keeper over a universe.

    ``reach`` seeds every universe id with itself and propagates labels one
    hop per iteration over the symmetrized edge list; UNION dedups, so the
    recursion terminates at the transitive closure. MIN(lab) per node is
    the min-reachable id — exactly the engine's min-label fixpoint — and
    doubles as the keeper (cluster id = smallest member id)."""
    return f"""
WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ({pairs_sql}) p),
und AS (SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
reach(node, lab) AS (
    SELECT {id_name}, {id_name} FROM ({universe_sql}) uni
    UNION
    SELECT und.u, r.lab FROM und JOIN reach r ON r.node = und.v
),
comp AS (SELECT node AS {id_name}, MIN(lab) AS cluster_id
         FROM reach GROUP BY node)
SELECT {id_name}, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       CASE WHEN {id_name} <> cluster_id THEN 1 ELSE 0 END AS is_dup
FROM comp
"""


def _cluster_and_elect(
    universe: DataFrame, pairs: DataFrame, id_name: str
) -> DataFrame:
    """Shared Spark tail of both e2e gates: components over the verified
    pairs, isolated ids unioned back as singleton clusters, cluster size
    attached by window. One shuffle on cluster_id beyond the components
    rounds; keeper = cluster_id (min member) by construction.

    Convergence is REQUIRED, not budgeted: min-label propagation exits
    at its fixpoint (organic near-dup diameters are a handful of hops —
    ~6 rounds at sf0.1, and cheaper per round than star contraction),
    and require_convergence turns a diameter beyond the 50-round cap
    into an error instead of labels silently diverging from the
    oracle's exact transitive closure. Corpora with adversarial chain
    diameters should swap in connected_components_star (O(log d))."""
    from tagminder_spark.operators.components import connected_components

    cc = connected_components(pairs, max_iter=50, require_convergence=True)
    labeled = universe.join(
        cc, universe[id_name] == cc["node"], "left"
    ).select(
        universe[id_name],
        F.coalesce(cc["component"], universe[id_name]).alias("cluster_id"),
    )
    return (
        labeled.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(W.partitionBy("cluster_id")),
        )
        .withColumn(
            "is_dup", (F.col(id_name) != F.col("cluster_id")).cast("int")
        )
        .select(id_name, "cluster_id", "cluster_size", "is_dup")
    )


def _fuzzy_e2e_sql() -> str:
    # the minhash gate's full SQL as the pair generator, nested verbatim
    # (DuckDB allows WITH inside a derived table), over all documents
    return _cc_closure_sql(
        _minhash_sql(), "SELECT doc_id FROM documents", "doc_id"
    )


@q("d_fuzzy_dedup_e2e", _fuzzy_e2e_sql())
def d_fuzzy_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup pipeline on documents: MinHash(32)+8×4 banding →
    exact Jaccard ≥ 0.5 verification → iterative connected components →
    keeper election (min doc_id per cluster) with cluster sizes. The
    string_grouper-shaped dedup (§2.8) taken all the way to the decision
    a 100 TB curation run actually ships: keep/drop per document."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5
    )
    return _cluster_and_elect(d.select("doc_id"), pairs, "doc_id")


def _semantic_e2e_sql() -> str:
    return _cc_closure_sql(
        _embedding_lsh_sql(), "SELECT vec_id FROM embeddings", "vec_id"
    )


@q("d_semantic_dedup_e2e", _semantic_e2e_sql())
def d_semantic_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup, end-to-end: hyperplane-LSH buckets
    propose embedding pairs, exact cosine ≥ 0.4 verifies, connected
    components group semantic near-duplicates, and the min vec_id is
    elected keeper per cluster. Same candidate→verify→cluster→elect
    chain as the text path, over the embedding modality."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    pairs = embedding_lsh_pairs(
        e, "vec_id", "embedding", dim=_EMB_DIM, bits=_EMB_BITS,
        bands=_EMB_BANDS, threshold=0.4, max_bucket=None,
    ).select("id_a", "id_b")
    return _cluster_and_elect(e.select("vec_id"), pairs, "vec_id")


# --------------------------------------------------------------------------
# incremental dedup: new ingest batch vs standing LSH index
# --------------------------------------------------------------------------

def _incremental_sql() -> str:
    # over the combined corpus the incremental probe emits exactly the
    # full-corpus pairs with >=1 "new" side (same bands/buckets/verify) —
    # so the oracle is the batch SQL plus that WHERE clause
    return f"""
SELECT id_a, id_b, jaccard FROM ({_minhash_sql()}) full_pairs
WHERE id_a % 5 = 0 OR id_b % 5 = 0
"""


def _lsh_roundtrip_sql() -> str:
    # after compacting batch1 into the standing index, probing batch2
    # (doc_id % 5 == 0) over the on-disk artifacts emits exactly the
    # full-corpus pairs with >=1 batch2 side — the same equivalence the
    # in-memory incremental gate states, now across the disk boundary
    return f"""
SELECT id_a, id_b, jaccard FROM ({_minhash_sql()}) full_pairs
WHERE id_a % 5 = 0 OR id_b % 5 = 0
"""


@q("d_lsh_roundtrip", _lsh_roundtrip_sql())
def d_lsh_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing-artifact lifecycle ON DISK (round-6 VERDICT #3): the
    exact loop a daily-growing 100 TB corpus runs.

    1. standing corpus (doc_id % 5 ∉ {0, 3}) → ``lsh_index`` → PERSISTED:
       banded index bucketed on (band, bucket) [the zero-standing-side-
       exchange layout the plan-diff test pins], shingles bucketed on id.
    2. batch 1 (doc_id % 5 == 3) probes the on-disk index
       (``incremental_lsh_pairs``, materialized like a real ingest), then
       ``compact_lsh_index`` folds batch 1 in and the compacted artifacts
       are RE-PERSISTED — the periodic compaction job.
    3. batch 2 (doc_id % 5 == 0) probes the compacted on-disk artifacts;
       that probe is the gated value.

    Oracle: the full-corpus batch SQL filtered to pairs touching batch 2
    — valid because after compaction the standing artifacts hold exactly
    corpus ∖ batch2, so probe(batch2) ≡ full-corpus pairs with a batch-2
    side (the compact≡rebuild identity the unit test pins, here carried
    across the parquet boundary)."""
    import tempfile

    from tagminder_spark.operators.dedupe import (
        compact_lsh_index,
        incremental_lsh_pairs,
        lsh_index,
    )
    from tagminder_spark.operators.scale import write_bucketed

    base = tempfile.mkdtemp(prefix="tm_lsh_rt_")
    d = load_table(spark, sf_dir, "documents")
    m5 = F.col("doc_id") % 5
    standing = d.filter((m5 != 0) & (m5 != 3))
    batch1 = d.filter(m5 == 3)
    batch2 = d.filter(m5 == 0)

    def persist_index(index, tag: str):
        banded, sh = index
        write_bucketed(
            banded, f"tm_rt_banded_{tag}", ["band", "bucket"], 8,
            f"{base}/banded_{tag}",
        )
        write_bucketed(sh, f"tm_rt_sh_{tag}", ["id"], 8, f"{base}/sh_{tag}")
        return spark.table(f"tm_rt_banded_{tag}"), spark.table(f"tm_rt_sh_{tag}")

    standing_disk = persist_index(
        lsh_index(standing, "doc_id", "text", n=3, k=_K, bands=_BANDS), "v1"
    )
    b1_index = lsh_index(batch1, "doc_id", "text", n=3, k=_K, bands=_BANDS)
    # ingest batch 1 for real (a daily run acts on these pairs)
    incremental_lsh_pairs(b1_index, standing_disk, threshold=0.5).count()
    compacted_disk = persist_index(
        compact_lsh_index(standing_disk, b1_index), "v2"
    )
    return incremental_lsh_pairs(
        lsh_index(batch2, "doc_id", "text", n=3, k=_K, bands=_BANDS),
        compacted_disk,
        threshold=0.5,
    )


@q("d_incremental_dedup", _incremental_sql())
def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy dedup: documents with doc_id % 5 == 0 play the
    new ingest batch, the rest the standing corpus. The new batch's bands
    probe the union band index, so per-ingest cost is O(|new| + touched
    buckets), not O(corpus) — the only affordable shape when a 100 TB
    corpus grows daily. Verification is the exact Jaccard; the oracle is
    the full-corpus SQL filtered to pairs touching the batch, stating the
    incremental≡batch equivalence as a value-exact check."""
    from tagminder_spark.operators.dedupe import incremental_lsh_pairs, lsh_index

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    old = d.filter(F.col("doc_id") % 5 != 0)
    return incremental_lsh_pairs(
        lsh_index(new, "doc_id", "text", n=3, k=_K, bands=_BANDS),
        lsh_index(old, "doc_id", "text", n=3, k=_K, bands=_BANDS),
        threshold=0.5,
    )
