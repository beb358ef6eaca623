"""Correctness-gate queries for the group-based / id steps already in
``pipeline.steps`` but not yet driver-visible: 05 (composer inference),
08 (subtitles), 13 (discnumber), 16 (track UUID).

step16 generates random UUIDv7s, so its query projects only the
*deterministic* consequences (version nibble, changed-flag) — giving even
the random step a value-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    step05_infer_composers,
    step08_subtitles,
    step13_discnumber,
    step16_track_uuid,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

D = "\\\\"


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# step 05: composer inference by majority vote
# --------------------------------------------------------------------------

_S05_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         'T' || CAST(o_orderkey % 100 AS VARCHAR) AS title,
         'A' || CAST(o_orderkey % 5 AS VARCHAR) AS artist,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL
              ELSE 'C' || CAST(o_orderkey % 3 AS VARCHAR) END AS composer
  FROM orders
), votes AS (
  SELECT lower(trim(title)) AS norm_title, artist, composer,
         COUNT(*) AS n
  FROM alib
  WHERE composer IS NOT NULL AND trim(title) <> ''
  GROUP BY 1, 2, 3
), majority AS (
  SELECT norm_title, artist, composer AS inferred
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY norm_title, artist ORDER BY n DESC, composer ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT a.__path,
       COALESCE(a.composer, m.inferred) AS composer
FROM alib a
LEFT JOIN majority m
  ON lower(trim(a.title)) = m.norm_title AND a.artist = m.artist
"""


@q("pl_step05_infer", _S05_SQL)
def pl_step05_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 05 (05-infer-composers-from-library.py:97-213): explode
    artists, majority vote per (normalized title, artist) with
    deterministic tie-break, fill blank composers via left join."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.concat(F.lit("T"), (k % 100).cast("string")).alias("title"),
        F.concat(F.lit("A"), (k % 5).cast("string")).alias("artist"),
        F.when(k % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("C"), (k % 3).cast("string")))
        .alias("composer"),
    )
    return step05_infer_composers(alib).select("__path", "composer")


# --------------------------------------------------------------------------
# step 08: subtitle extraction from bracketed title suffixes
# --------------------------------------------------------------------------

_S08_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CAST(o_orderkey % 4 AS INT) AS v,
         CAST(o_orderkey % 3 AS INT) AS s
  FROM orders
), built AS (
  SELECT __path, v, s,
         CASE v WHEN 0 THEN 'Song [Acoustic]'
                WHEN 1 THEN 'Song [Live] [Demo]'
                WHEN 2 THEN 'Song plain'
                ELSE 'Song [Note]' END AS title,
         CASE s WHEN 0 THEN NULL WHEN 1 THEN 'Note' ELSE 'Old; Note' END
           AS subtitle
  FROM alib
)
SELECT __path,
       CASE WHEN v = 2 THEN title ELSE 'Song' END AS title,
       CASE v
         WHEN 0 THEN CASE s WHEN 0 THEN 'Acoustic'
                            WHEN 1 THEN 'Note; Acoustic'
                            ELSE 'Old; Note; Acoustic' END
         WHEN 1 THEN CASE s WHEN 0 THEN 'Live; Demo'
                            WHEN 1 THEN 'Note; Live; Demo'
                            ELSE 'Old; Note; Live; Demo' END
         WHEN 2 THEN subtitle
         ELSE CASE s WHEN 0 THEN 'Note' WHEN 1 THEN 'Note'
                     ELSE 'Old; Note' END
       END AS subtitle
FROM built
"""


@q("pl_step08_subtitles", _S08_SQL)
def pl_step08_subtitles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 08 (08-normalize-subtitles.py:60-130): move [bracketed] title
    items into the subtitle cell with caseless first-seen dedup."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = (k % 4).cast("int")
    s = (k % 3).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(v == 0, F.lit("Song [Acoustic]"))
        .when(v == 1, F.lit("Song [Live] [Demo]"))
        .when(v == 2, F.lit("Song plain"))
        .otherwise(F.lit("Song [Note]"))
        .alias("title"),
        F.when(s == 0, F.lit(None).cast("string"))
        .when(s == 1, F.lit("Note"))
        .otherwise(F.lit("Old; Note"))
        .alias("subtitle"),
    )
    return step08_subtitles(alib).select("__path", "title", "subtitle")


# --------------------------------------------------------------------------
# step 13: discnumber cleanup
# --------------------------------------------------------------------------

_S13_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CASE CAST((o_orderkey // 8) % 4 AS INT)
           WHEN 0 THEN '/m/a' || CAST(o_orderkey // 8 AS VARCHAR)
           WHEN 1 THEN '/m/b' || CAST(o_orderkey // 8 AS VARCHAR) || '/cd2'
           WHEN 2 THEN '/m/c' || CAST(o_orderkey // 8 AS VARCHAR)
           ELSE '/m/d' || CAST(o_orderkey // 8 AS VARCHAR) END AS __dirpath,
         CASE CAST((o_orderkey // 8) % 4 AS INT)
           WHEN 0 THEN '1'
           WHEN 1 THEN '2'
           WHEN 2 THEN CAST(o_orderkey % 2 + 1 AS VARCHAR)
           ELSE NULL END AS discnumber
  FROM orders
), counts AS (
  SELECT __dirpath, COUNT(DISTINCT discnumber) AS nd
  FROM alib GROUP BY __dirpath
)
SELECT a.__path,
       CASE WHEN c.nd = 1
              AND NOT regexp_matches(a.__dirpath,
                    '/(?:[Cc][Dd]|[Dd][Ii][Ss][Cc])\s*0*[0-9]{1,3}$')
              AND a.discnumber IS NOT NULL AND trim(a.discnumber) <> ''
            THEN NULL ELSE a.discnumber END AS discnumber
FROM alib a JOIN counts c USING (__dirpath)
"""


@q("pl_step13_discnumber", _S13_SQL)
def pl_step13_discnumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 13 (13-cleanup-discnumber.py:77-183): clear discnumbers that
    are constant across a non-disc-subfolder directory (one window, no
    rejoin)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    g = F.floor(k / 8).cast("long")
    fam = (g % 4).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(fam == 0, F.concat(F.lit("/m/a"), g))
        .when(fam == 1, F.concat(F.lit("/m/b"), g, F.lit("/cd2")))
        .when(fam == 2, F.concat(F.lit("/m/c"), g))
        .otherwise(F.concat(F.lit("/m/d"), g))
        .alias("__dirpath"),
        F.when(fam == 0, F.lit("1"))
        .when(fam == 1, F.lit("2"))
        .when(fam == 2, (k % 2 + 1).cast("string"))
        .otherwise(F.lit(None).cast("string"))
        .alias("discnumber"),
    )
    return step13_discnumber(alib).select("__path", "discnumber")


# --------------------------------------------------------------------------
# step 16: track UUID — deterministic consequences of a random generator
# --------------------------------------------------------------------------

_S16_SQL = r"""
SELECT 'p' || o_orderkey AS __path,
       '7' AS ver,
       CASE WHEN o_orderkey % 3 = 2 THEN '0' ELSE '1' END AS changed
FROM orders
"""


@q("pl_step16_uuid", _S16_SQL)
def pl_step16_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 16 (16-populate-track-uuid.py:38-85): UUIDv7 where the cell
    is blank or not v7. Values are random, so the query asserts the
    deterministic contract instead: every output is v7, and only rows
    that already carried a v7 id are unchanged."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    orig = (
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .when(k % 3 == 1, F.lit("not-a-uuid"))
        .otherwise(
            F.concat(
                F.lit("00000000-0000-7000-8000-"),
                F.lpad(k.cast("string"), 12, "0"),
            )
        )
    )
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"), orig.alias("track_uuid")
    )
    out = step16_track_uuid(alib)
    return out.join(
        o.select(F.concat(F.lit("p"), k).alias("__path"), orig.alias("__orig")),
        "__path",
    ).select(
        "__path",
        F.substring("track_uuid", 15, 1).alias("ver"),
        F.when(
            F.col("__orig").isNotNull() & (F.col("track_uuid") == F.col("__orig")),
            F.lit("0"),
        )
        .otherwise(F.lit("1"))
        .alias("changed"),
    )
