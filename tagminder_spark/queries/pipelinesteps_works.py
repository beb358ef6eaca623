"""Correctness-gate queries for the scoring/ER steps: 22 (work
inference) and 15 (contributor similarity).

The step-22 oracle replicates the full candidate→score→rank→tier
pipeline in SQL over the same synthesized works dimension; the step-15
oracle mirrors the bigram-Jaccard shared-shingle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    step15_contributor_similarity,
    step22_work_inference,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table, spread

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

D = "\\\\"


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# step 22: work inference
# --------------------------------------------------------------------------
# works (from part p): title-norm families of p%1000, alias families of
# p%1500 (bounded candidate fan-out at every SF), two composer people
# keyed p%40, one lyricist keyed p%30.
# tracks (orders k): k%3==0 title match, k%3==1 workid 'wm-<k%1000>',
# k%3==2 alias match; composer tokens 0/1/2 by k%4,k%2; lyricist when
# k%5==0. Exercises tiers A (90/95 exact-workid), B (80/85), C, D,
# multi-candidate margins, and the guarded auto-apply rule.

_S22_SQL = r"""
WITH works AS (
  SELECT p_partkey AS work_id, 'wm-' || p_partkey AS work_mbid,
         'wt' || CAST(p_partkey % 1000 AS VARCHAR) AS work_title_norm,
         'al' || CAST(p_partkey % 1500 AS VARCHAR) AS alias_tok
  FROM part
), tracks AS (
  SELECT 'p' || o_orderkey AS __path, o_orderkey AS k,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'wt' || CAST(o_orderkey % 1000 AS VARCHAR)
           WHEN 2 THEN 'al' || CAST(o_orderkey % 1500 AS VARCHAR)
           ELSE 'plain ' || o_orderkey END AS title_norm,
         CASE WHEN o_orderkey % 3 = 1
              THEN 'wm-' || CAST(o_orderkey % 1000 AS VARCHAR) END AS workid,
         CASE WHEN o_orderkey % 4 = 0 THEN 2
              WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS n_comp,
         CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS n_lyr
  FROM orders
), cand AS (
  SELECT t.__path, w.work_id, 35 AS ts, 0 AS als, 0 AS ws,
         TRUE AS et, FALSE AS ew
  FROM tracks t JOIN works w ON t.title_norm = w.work_title_norm
  UNION ALL
  SELECT t.__path, w.work_id, 0, 0, 70, FALSE, TRUE
  FROM tracks t JOIN works w ON t.workid = w.work_mbid
  UNION ALL
  SELECT t.__path, w.work_id, 0, 20, 0, FALSE, FALSE
  FROM tracks t JOIN works w ON t.title_norm = w.alias_tok
), grouped AS (
  SELECT __path, work_id, SUM(ts) AS ts, SUM(als) AS als, SUM(ws) AS ws,
         BOOL_OR(et) AS et, BOOL_OR(ew) AS ew
  FROM cand GROUP BY 1, 2
), scored AS (
  SELECT __path, work_id, ts + als + ws + comp_score + lyr_score AS total,
         et, ew, (comp_score > 0 OR lyr_score > 0) AS pm
  FROM (
    SELECT g.*,
      CASE WHEN t.n_comp > 0 AND (t.k % 40) = (g.work_id % 40)
           THEN LEAST(20, t.n_comp * 10) ELSE 0 END AS comp_score,
      CASE WHEN t.n_lyr > 0 AND (t.k % 30) = (g.work_id % 30)
           THEN 5 ELSE 0 END AS lyr_score
    FROM grouped g JOIN tracks t USING (__path)
  )
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY __path ORDER BY total DESC, work_id ASC) AS rn
  FROM scored
), agg AS (
  SELECT __path, SUM(CASE WHEN et THEN 1 ELSE 0 END) AS etc,
         MAX(CASE WHEN rn = 2 THEN total END) AS runner
  FROM ranked GROUP BY 1
), best AS (
  SELECT r.__path, r.work_id, r.total,
         COALESCE(a.runner, 0) AS runner, a.etc, r.et, r.ew, r.pm,
         CASE WHEN r.ew AND r.total >= 90
                   AND r.total - COALESCE(a.runner, 0) >= 20 THEN 'A'
              WHEN r.total >= 80 AND r.total - COALESCE(a.runner, 0) >= 20
                   AND r.pm THEN 'B'
              WHEN r.total >= 60 THEN 'C' ELSE 'D' END AS tier
  FROM ranked r JOIN agg a USING (__path) WHERE r.rn = 1
)
SELECT t.__path,
       b.work_id AS best_work_id,
       CAST(COALESCE(b.total, 0) AS BIGINT) AS best_score,
       CAST(COALESCE(b.runner, 0) AS BIGINT) AS runner_up_score,
       COALESCE(b.tier, 'D') AS confidence_tier,
       COALESCE(CASE WHEN b.tier IN ('A', 'B') AND b.total >= 80
                      AND b.total - b.runner >= 20
                      AND (b.ew OR (b.et AND b.etc = 1))
                     THEN 1 ELSE 0 END, 0) AS auto_apply
FROM tracks t LEFT JOIN best b USING (__path)
"""


@q("pl_step22_works", _S22_SQL)
def pl_step22_works(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 22 (22-infer-works-in-library.py:846-1140, 1340-1405):
    title/workid/alias candidate joins, per-(track,work) score summation,
    role-pivoted person corroboration, ranked best/runner-up with
    deterministic tie-break, confidence tiers A-D, guarded auto-apply."""
    p = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    works = p.select(
        pk.alias("work_id"),
        F.concat(F.lit("wm-"), pk).alias("work_mbid"),
        F.concat(F.lit("wt"), (pk % 1000).cast("string")).alias("work_title_norm"),
        F.concat(F.lit("al"), (pk % 1500).cast("string")).alias("alias_norm"),
        F.concat(
            F.lit("comp "),
            (pk % 40).cast("string"),
            F.lit(D),
            F.lit("compb "),
            (pk % 40).cast("string"),
        ).alias("people_composer"),
        F.concat(F.lit("lyr "), (pk % 30).cast("string")).alias("people_lyricist"),
    )
    # fixture-level spread (optimization round 14): the single-split
    # orders scan otherwise computes the tracks synthesis AND the
    # person-array normalization (regex per role token, broadcast-built
    # for the corroboration join) in 1-3 tasks; round-robin the bare
    # 8-byte key first (guide §2.5 — shuffle keys, not payloads). An
    # earlier whole-fixture spread was a net loss when the corroboration
    # path still exploded per-person rows; re-measured after the round-14
    # array-intersect restructure: 4.1/3.6 s control vs 3.0 s spread.
    o = spread(load_table(spark, sf_dir, "orders").select("o_orderkey"))
    k = F.col("o_orderkey")
    tracks = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(k % 3 == 0, F.concat(F.lit("wt"), (k % 1000).cast("string")))
        .when(k % 3 == 2, F.concat(F.lit("al"), (k % 1500).cast("string")))
        .otherwise(F.concat(F.lit("plain "), k))
        .alias("title"),
        F.when(k % 3 == 1, F.concat(F.lit("wm-"), (k % 1000).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("musicbrainz_workid"),
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("Comp "),
                (k % 40).cast("string"),
                F.lit(D),
                F.lit("CompB "),
                (k % 40).cast("string"),
            ),
        )
        .when(k % 2 == 0, F.concat(F.lit("Comp "), (k % 40).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("composer"),
        F.when(k % 5 == 0, F.concat(F.lit("Lyr "), (k % 30).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("lyricist"),
    )
    out = step22_work_inference(tracks, works)
    return out.select(
        "__path",
        "best_work_id",
        "best_score",
        "runner_up_score",
        "confidence_tier",
        "auto_apply",
    )


# --------------------------------------------------------------------------
# step 15: contributor similarity workspace
# --------------------------------------------------------------------------

_S15_SQL = r"""
WITH pool AS (
  SELECT DISTINCT name FROM (
    SELECT 'Name' || CAST(s_suppkey % 60 AS VARCHAR) AS name FROM supplier
    UNION ALL
    SELECT CASE WHEN s_suppkey % 3 = 0
                THEN 'Name' || CAST(s_suppkey % 60 AS VARCHAR) || 'x'
                ELSE 'Other' || s_suppkey END FROM supplier
  )
), normed AS (
  SELECT name, lower(name) AS norm FROM pool
), grams AS (
  SELECT DISTINCT name, g
  FROM normed,
       UNNEST(list_transform(range(1, length(norm)),
                             i -> substr(norm, CAST(i AS INT), 2))) AS t(g)
), sizes AS (
  SELECT name, COUNT(*) AS n FROM grams GROUP BY 1
), shared AS (
  SELECT a.name AS na_, b.name AS nb_, COUNT(*) AS sh
  FROM grams a JOIN grams b USING (g)
  WHERE a.name < b.name
  GROUP BY 1, 2
)
SELECT na_ AS name_a, nb_ AS name_b,
       sh / CAST(x.n + y.n - sh AS DOUBLE) AS similarity
FROM shared s JOIN sizes x ON s.na_ = x.name JOIN sizes y ON s.nb_ = y.name
WHERE sh / CAST(x.n + y.n - sh AS DOUBLE) >= 0.6
"""


@q("pl_step15_similarity", _S15_SQL)
def pl_step15_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 15 (15-contributor-similarity-analysis.py:120-330): pool
    distinct contributor names, character-bigram Jaccard via the
    shared-shingle equi-join, pairs ≥ threshold with a<b dedup — the
    deterministic analogue of the reference's TF-IDF cosine 0.85."""
    s = load_table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey")
    alib = s.select(
        F.concat(F.lit("Name"), (sk % 60).cast("string")).alias("artist"),
        F.when(
            sk % 3 == 0,
            F.concat(F.lit("Name"), (sk % 60).cast("string"), F.lit("x")),
        )
        .otherwise(F.concat(F.lit("Other"), sk))
        .alias("composer"),
    )
    return step15_contributor_similarity(
        alib, cols=("artist", "composer"), threshold=0.6
    )
