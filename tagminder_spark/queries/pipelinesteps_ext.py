"""Correctness-gate queries for the lookup/dictionary pipeline steps
(03 features, 07 vetted mappings, 14 releasetype, 19 album DR).

Same contract as ``pipelinesteps``: each query synthesizes an alib-shaped
frame deterministically from the star schema (mirrored in the oracle SQL),
runs the real step implementation, and returns the transformed columns.
The synthesized variants are chosen so each oracle can state the expected
output per variant directly instead of re-implementing the engine in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    parse_dr_scores,
    step03_title_features,
    step07_vetted_mappings,
    step14_releasetype,
    step19_album_dr,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# step 03: title/artist feature extraction
# --------------------------------------------------------------------------
# Variants (k = o_orderkey): title v=k%5, artist a=k%3, subtitle s=k%4.
#  v0 'Song (feat. Guest k)'  → title stripped, guest appended to artist
#  v1 'Song (Live at Venue k)'→ title stripped, subtitle+=[..] w/ live-at
#                               guard, live=1
#  v2 'Song (Remastered)'     → title stripped, subtitle+=[Remastered]
#  v3 'Song (2011 Remaster)'  → trailing-word rule, subtitle+=[2011 Remaster]
#  v4 plain                   → untouched
#  a0 'Artist A feat. Artist B' → split to MV; a1 'artist c' → case map
#  s0 NULL, s1 'Note', s2 'Live at Somewhere', s3 '[Remastered]' (dedup hit)

_S03_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CAST(o_orderkey % 5 AS INT) AS v,
         CAST(o_orderkey % 3 AS INT) AS a,
         CAST(o_orderkey % 4 AS INT) AS s,
         'Song ' || o_orderkey AS base,
         o_orderkey AS k
  FROM orders
), built AS (
  SELECT __path, v, a, s, base, k,
         base || CASE v WHEN 0 THEN ' (feat. Guest ' || k || ')'
                        WHEN 1 THEN ' (Live at Venue ' || k || ')'
                        WHEN 2 THEN ' (Remastered)'
                        WHEN 3 THEN ' (2011 Remaster)'
                        ELSE '' END AS title,
         CASE a WHEN 0 THEN 'Artist A feat. Artist B'
                WHEN 1 THEN 'artist c' ELSE 'Artist D' END AS artist,
         CASE s WHEN 0 THEN NULL WHEN 1 THEN 'Note'
                WHEN 2 THEN 'Live at Somewhere' ELSE '[Remastered]' END
           AS subtitle,
         '0' AS live
  FROM alib
), artist1 AS (
  SELECT *,
         CASE a WHEN 0 THEN 'Artist A' || '\\' || 'Artist B'
                WHEN 1 THEN 'Artist C' ELSE 'Artist D' END AS art1
  FROM built
)
SELECT __path,
       CASE WHEN v IN (0, 1, 2, 3) THEN base ELSE title END AS title,
       CASE WHEN v = 0 THEN art1 || '\\' || 'Guest ' || k ELSE art1 END
         AS artist,
       CASE WHEN v = 1 THEN
              CASE WHEN s = 2 THEN subtitle
                   WHEN s = 0 THEN '[Live at Venue ' || k || ']'
                   ELSE subtitle || '; [Live at Venue ' || k || ']' END
            WHEN v = 2 THEN
              CASE WHEN s = 3 THEN subtitle
                   WHEN s = 0 THEN '[Remastered]'
                   ELSE subtitle || '; [Remastered]' END
            WHEN v = 3 THEN
              CASE WHEN s = 0 THEN '[2011 Remaster]'
                   ELSE subtitle || '; [2011 Remaster]' END
            ELSE subtitle END AS subtitle,
       CASE WHEN v = 1 THEN '1' ELSE live END AS live
FROM artist1
"""


@q("pl_step03_features", _S03_SQL)
def pl_step03_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 03 (03-normalize-title-artist-features.py:105-279): bracketed
    title-suffix extraction to artist/subtitle/live plus feature-prefix
    artist splitting with a canonical-case dictionary — all as one
    codegen'd when-chain, no per-row Python."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = (k % 5).cast("int")
    a = (k % 3).cast("int")
    s = (k % 4).cast("int")
    base = F.concat(F.lit("Song "), k)
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.concat(
            base,
            F.when(v == 0, F.concat(F.lit(" (feat. Guest "), k, F.lit(")")))
            .when(v == 1, F.concat(F.lit(" (Live at Venue "), k, F.lit(")")))
            .when(v == 2, F.lit(" (Remastered)"))
            .when(v == 3, F.lit(" (2011 Remaster)"))
            .otherwise(F.lit("")),
        ).alias("title"),
        F.when(a == 0, F.lit("Artist A feat. Artist B"))
        .when(a == 1, F.lit("artist c"))
        .otherwise(F.lit("Artist D"))
        .alias("artist"),
        F.when(s == 0, F.lit(None).cast("string"))
        .when(s == 1, F.lit("Note"))
        .when(s == 2, F.lit("Live at Somewhere"))
        .otherwise(F.lit("[Remastered]"))
        .alias("subtitle"),
        F.lit("0").alias("live"),
    )
    out = step03_title_features(alib, case_map={"artist c": "Artist C"})
    return out.select("__path", "title", "artist", "subtitle", "live")


# --------------------------------------------------------------------------
# step 07: vetted contributor mappings
# --------------------------------------------------------------------------
# Variants (k = c_custkey % 4):
#  0 'old name a'                     → whole-field → 'New Name A'
#  1 'Old Name A\\keeper\\old name b' → item-level: New A, keeper, New B
#  2 'Old Name B\\new name b'         → both map to 'New Name B' → dedup
#  3 'Untouched Name'                 → unchanged

_S07_SQL = r"""
WITH alib AS (
  SELECT 'p' || c_custkey AS __path, CAST(c_custkey % 4 AS INT) AS v
  FROM customer
)
SELECT __path,
       CASE v WHEN 0 THEN 'New Name A'
              WHEN 1 THEN 'New Name A' || '\\' || 'keeper' || '\\' || 'New Name B'
              WHEN 2 THEN 'New Name B'
              ELSE 'Untouched Name' END AS artist
FROM alib
"""

_S07_MAPPING = {
    "old name a": "New Name A",
    "old name b": "New Name B",
    "new name b": "New Name B",
}


@q("pl_step07_vetted", _S07_SQL)
def pl_step07_vetted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 07 (07-apply-vetted-contributor-mappings.py:146-214):
    whole-field then item-level current→replacement rewrite with
    first-seen dedup; the vetted table rides as a map literal (zero
    shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    v = (F.col("c_custkey") % 4).cast("int")
    d = "\\\\"
    alib = c.select(
        F.concat(F.lit("p"), "c_custkey").alias("__path"),
        F.when(v == 0, F.lit("old name a"))
        .when(v == 1, F.lit(f"Old Name A{d}keeper{d}old name b"))
        .when(v == 2, F.lit(f"Old Name B{d}new name b"))
        .otherwise(F.lit("Untouched Name"))
        .alias("artist"),
    )
    out = step07_vetted_mappings(alib, _S07_MAPPING, cols=("artist",))
    return out.select("__path", "artist")


# --------------------------------------------------------------------------
# step 14: releasetype normalization
# --------------------------------------------------------------------------
# Three directory families exercise every null-assignment branch: even
# keys → tiny '/m/a' dirs (Single), odd multiples of 3 → seven big
# '/m/OST' dirs (OST / Studio Album), other odd keys → ~10-row '/m/e'
# dirs (Single/EP boundary). releasetype variants (k%6): 0 'Album',
# 1 'Album\\Compilation', 2 'ep', 3 'Anthology', 4/5 NULL (null-assignment
# path). genre: k%7==0 → 'Classical', else 'Rock'. isgreatesthits:
# k%11==0 → '1'.

_S14_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CASE WHEN o_orderkey % 2 = 0
                THEN '/m/a' || CAST(o_orderkey // 8 AS VARCHAR)
              WHEN o_orderkey % 3 = 0
                THEN '/m/OST' || CAST(o_orderkey % 7 AS VARCHAR)
              ELSE '/m/e' || CAST(o_orderkey % 500 AS VARCHAR) END
           AS __dirpath,
         CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN 'Album' WHEN 1 THEN 'Album' || '\\' || 'Compilation'
           WHEN 2 THEN 'ep' WHEN 3 THEN 'Anthology' ELSE NULL END
           AS releasetype,
         CASE WHEN o_orderkey % 7 = 0 THEN 'Classical' ELSE 'Rock' END AS genre,
         CASE WHEN o_orderkey % 11 = 0 THEN '1' ELSE '0' END AS isgreatesthits
  FROM orders
), mapped AS (
  SELECT *,
         CASE lower(trim(releasetype))
           WHEN 'album' THEN 'Studio Album'
           WHEN 'album' || '\\' || 'compilation' THEN 'Greatest Hits & Anthologies'
           WHEN 'ep' THEN 'Extended Play'
           WHEN 'anthology' THEN 'Greatest Hits & Anthologies'
           ELSE NULL END AS m
  FROM alib
), counted AS (
  SELECT *,
         SUM(CASE WHEN m IS NULL AND genre NOT LIKE '%Classical%' THEN 1
                  ELSE 0 END) OVER (PARTITION BY __dirpath) AS null_cnt
  FROM mapped
), assigned AS (
  SELECT *,
         CASE WHEN m IS NOT NULL THEN m
              WHEN genre NOT LIKE '%Classical%' AND null_cnt <= 3 THEN 'Single'
              WHEN genre NOT LIKE '%Classical%' AND null_cnt <= 6
                THEN 'Extended Play'
              WHEN __dirpath LIKE '%/OST%' THEN 'Soundtrack'
              ELSE 'Studio Album' END AS rt
  FROM counted
)
SELECT __path,
       CASE WHEN isgreatesthits = '1'
              AND NOT contains(lower(rt), 'greatest hits & anthologies')
            THEN rt || '\\' || 'Greatest Hits & Anthologies'
            ELSE rt END AS releasetype
FROM assigned
"""


@q("pl_step14_releasetype", _S14_SQL)
def pl_step14_releasetype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 14 (14-normalize-releasetype.py:46-114, 232-470): rule-table
    mapping, per-directory null-assignment heuristics (one window), and
    truthy-flag component enforcement."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = "\\\\"
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(
            k % 2 == 0,
            F.concat(F.lit("/m/a"), F.floor(k / 8).cast("long").cast("string")),
        )
        .when(k % 3 == 0, F.concat(F.lit("/m/OST"), (k % 7).cast("string")))
        .otherwise(F.concat(F.lit("/m/e"), (k % 500).cast("string")))
        .alias("__dirpath"),
        F.when((k % 6).cast("int") == 0, F.lit("Album"))
        .when((k % 6).cast("int") == 1, F.lit(f"Album{d}Compilation"))
        .when((k % 6).cast("int") == 2, F.lit("ep"))
        .when((k % 6).cast("int") == 3, F.lit("Anthology"))
        .otherwise(F.lit(None).cast("string"))
        .alias("releasetype"),
        F.when(k % 7 == 0, F.lit("Classical")).otherwise(F.lit("Rock")).alias("genre"),
        F.when(k % 11 == 0, F.lit("1")).otherwise(F.lit("0")).alias("isgreatesthits"),
    )
    out = step14_releasetype(alib)
    return out.select("__path", "releasetype")


# --------------------------------------------------------------------------
# step 19: album DR population
# --------------------------------------------------------------------------
# DR feed synthesized from supplier (one line per potential dir, some
# malformed); alib dirs from orders. s%5: 0 valid 'dir|DR<n>', 1 missing
# pipe, 2 bad prefix, 3 comment, 4 non-numeric score.

_S19_SQL = r"""
WITH feed AS (
  SELECT '/m/d' || s_suppkey || CASE CAST(s_suppkey % 5 AS INT)
           WHEN 0 THEN '|DR' || CAST(s_suppkey % 20 AS VARCHAR)
           WHEN 1 THEN ' DR7' WHEN 2 THEN '|XR9' WHEN 3 THEN '|DR5'
           ELSE '|DRx' END AS value,
         CAST(s_suppkey % 5 AS INT) AS fv,
         s_suppkey
  FROM supplier
), dim AS (
  SELECT '/m/d' || s_suppkey AS __dirpath,
         CAST(s_suppkey % 20 AS VARCHAR) AS dr
  FROM feed WHERE fv = 0
  UNION ALL
  SELECT '/m/d' || s_suppkey AS __dirpath, '5' AS dr
  FROM feed WHERE fv = 3
), alib AS (
  SELECT 'p' || o_orderkey AS __path,
         '/m/d' || CAST(o_orderkey % 400 AS VARCHAR) AS __dirpath,
         CASE WHEN o_orderkey % 3 = 0 THEN '9' ELSE NULL END AS album_dr
  FROM orders
)
SELECT a.__path,
       CASE WHEN d.dr IS NOT NULL
              AND (a.album_dr IS NULL OR trim(a.album_dr) = ''
                   OR trim(a.album_dr) = '""' OR a.album_dr <> d.dr)
            THEN d.dr ELSE a.album_dr END AS album_dr
FROM alib a LEFT JOIN dim d USING (__dirpath)
"""


@q("pl_step19_album_dr", _S19_SQL)
def pl_step19_album_dr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 19 (19-populate-album-dr.py:61-204): validate the pipe-
    delimited DR feed, then one broadcast left join keyed by directory.
    Comment lines here carry a valid payload shape ('#' rows are dropped
    by the parser in real feeds; the synthetic feed has no leading-#
    variant because every line starts with a path)."""
    s = load_table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey")
    fv = (sk % 5).cast("int")
    raw = s.select(
        F.concat(
            F.lit("/m/d"),
            sk,
            F.when(fv == 0, F.concat(F.lit("|DR"), (sk % 20).cast("string")))
            .when(fv == 1, F.lit(" DR7"))
            .when(fv == 2, F.lit("|XR9"))
            .when(fv == 3, F.lit("|DR5"))
            .otherwise(F.lit("|DRx")),
        ).alias("value")
    )
    dr = parse_dr_scores(raw)
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.concat(F.lit("/m/d"), (k % 400).cast("string")).alias("__dirpath"),
        F.when(k % 3 == 0, F.lit("9")).otherwise(F.lit(None).cast("string")).alias(
            "album_dr"
        ),
    )
    out = step19_album_dr(alib, dr)
    return out.select("__path", "album_dr")
