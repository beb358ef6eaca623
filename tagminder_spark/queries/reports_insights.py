"""Library-insights report queries (SURVEY §2.4 A12/A13/A16/A17) and the
cross-DB metadata sync (§2.1 S13).

Each synthesizes the alib-shaped inputs deterministically from the star
schema (mirrored in the oracle SQL) and returns the report aggregate the
reference's 92-library-insights.py / 98-sync-metadata-by-track-uuid.py
computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tagminder_spark.functions.core import truthy
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
# A12: album stats
# --------------------------------------------------------------------------

_A12_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 500 AS VARCHAR) AS album_root,
         CAST(l_quantity AS DOUBLE) AS duration,
         CAST(l_orderkey % 5 + 1 AS DOUBLE) AS rating,
         CASE WHEN l_partkey % 7 = 0 THEN '1' ELSE '0' END AS compilation,
         CAST(l_shipdate AS DATE) AS added
  FROM lineitem
)
SELECT album_root,
       COUNT(*) AS n_tracks,
       CAST(ROUND(SUM(duration), 4) AS DOUBLE) AS total_secs,
       CAST(ROUND(AVG(rating), 4) AS DOUBLE) AS avg_rating,
       CAST(MAX(CASE WHEN compilation IN ('1') THEN 1 ELSE 0 END) AS INT)
         AS is_compilation,
       CAST(MIN(added) AS VARCHAR) AS acquired
FROM alib GROUP BY album_root
"""


@q("r92_album_stats", _A12_SQL)
def r92_album_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (92-library-insights.py:795-846): per-album track count, total
    duration, mean rating, compilation flag, acquisition date — one hash
    aggregate keyed by album_root."""
    li = load_table(spark, sf_dir, "lineitem")
    alib = li.select(
        F.concat(F.lit("alb"), (F.col("l_orderkey") % 500).cast("string")).alias(
            "album_root"
        ),
        F.col("l_quantity").cast("double").alias("duration"),
        (F.col("l_orderkey") % 5 + 1).cast("double").alias("rating"),
        F.when(F.col("l_partkey") % 7 == 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("compilation"),
        F.col("l_shipdate").cast("date").alias("added"),
    )
    return alib.groupBy("album_root").agg(
        F.count(F.lit(1)).alias("n_tracks"),
        F.round(F.sum("duration"), 4).cast("double").alias("total_secs"),
        F.round(F.avg("rating"), 4).cast("double").alias("avg_rating"),
        F.max(truthy(F.col("compilation")).cast("int")).alias("is_compilation"),
        F.min("added").cast("string").alias("acquired"),
    )


# --------------------------------------------------------------------------
# A13: format mix with pct-of-total within class
# --------------------------------------------------------------------------

_A13_SQL = r"""
WITH alib AS (
  SELECT l_linestatus AS filetype, l_returnflag AS quality_class,
         CAST(l_quantity AS DOUBLE) AS duration
  FROM lineitem
), grouped AS (
  SELECT quality_class, filetype, COUNT(*) AS n_tracks,
         SUM(duration) / 3600.0 AS hours
  FROM alib GROUP BY 1, 2
)
SELECT quality_class, filetype, n_tracks,
       CAST(ROUND(hours, 4) AS DOUBLE) AS hours,
       CAST(ROUND(100.0 * n_tracks /
            SUM(n_tracks) OVER (PARTITION BY quality_class), 4) AS DOUBLE)
         AS pct_of_class
FROM grouped
"""


@q("r92_format_mix", _A13_SQL)
def r92_format_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 (92-library-insights.py:979-1160): counts + hours per
    (quality class, filetype) and percent-of-class via a window over the
    aggregate — no second scan or rejoin."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = (
        li.select(
            F.col("l_linestatus").alias("filetype"),
            F.col("l_returnflag").alias("quality_class"),
            F.col("l_quantity").cast("double").alias("duration"),
        )
        .groupBy("quality_class", "filetype")
        .agg(
            F.count(F.lit(1)).alias("n_tracks"),
            (F.sum("duration") / 3600.0).alias("hours_raw"),
        )
    )
    w = W.partitionBy("quality_class")
    return grouped.select(
        "quality_class",
        "filetype",
        "n_tracks",
        F.round("hours_raw", 4).cast("double").alias("hours"),
        F.round(100.0 * F.col("n_tracks") / F.sum("n_tracks").over(w), 4)
        .cast("double")
        .alias("pct_of_class"),
    )


# --------------------------------------------------------------------------
# A16: top-N entities from multi-value cells
# --------------------------------------------------------------------------

_A16_SQL = r"""
WITH alib AS (
  SELECT 'Prod ' || CAST(l_partkey % 97 AS VARCHAR)
         || CASE WHEN l_orderkey % 4 = 0
                 THEN '\\' || 'Prod ' || CAST(l_suppkey % 97 AS VARCHAR)
                 ELSE '' END AS producer
  FROM lineitem
), exploded AS (
  SELECT trim(tok) AS producer
  FROM alib, UNNEST(string_split(producer, '\\')) AS t(tok)
  WHERE trim(tok) <> ''
), counted AS (
  SELECT producer, COUNT(*) AS n FROM exploded GROUP BY 1
)
SELECT producer, n FROM counted
ORDER BY n DESC, producer ASC LIMIT 20
"""


@q("r92_top_entities", _A16_SQL)
def r92_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 (92-library-insights.py:1883-1939 and five siblings): explode
    multi-value entity cells → count → deterministic top-N
    (count desc, name asc). Note: the synthesized cells can repeat a
    token, so tokenization here splits WITHOUT the dedup step —
    value_counts over occurrences, as the reference does."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = F.concat(
        F.lit("Prod "),
        (F.col("l_partkey") % 97).cast("string"),
        F.when(
            F.col("l_orderkey") % 4 == 0,
            F.concat(F.lit(D), F.lit("Prod "), (F.col("l_suppkey") % 97).cast("string")),
        ).otherwise(F.lit("")),
    )
    toks = F.filter(
        F.transform(F.split(cell, D.replace("\\", "\\\\")), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return (
        li.select(F.explode(toks).alias("producer"))
        .groupBy("producer")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("producer"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# A17: producer↔engineer collaboration pairs
# --------------------------------------------------------------------------

_A17_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 400 AS VARCHAR) AS album_root,
         'P' || CAST(l_partkey % 10 AS VARCHAR) AS producer,
         'E' || CAST(l_suppkey % 8 AS VARCHAR) AS engineer
  FROM lineitem
), per_album AS (
  SELECT DISTINCT album_root, producer, engineer FROM alib
)
SELECT producer, engineer, COUNT(*) AS n_albums
FROM per_album GROUP BY 1, 2
"""


@q("r92_collab_pairs", _A17_SQL)
def r92_collab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 (92-library-insights.py:2507): producer↔engineer pair counts
    at album grain — distinct (album, pair) then count, so repeat tracks
    on one album don't inflate the collaboration."""
    li = load_table(spark, sf_dir, "lineitem")
    alib = li.select(
        F.concat(F.lit("alb"), (F.col("l_orderkey") % 400).cast("string")).alias(
            "album_root"
        ),
        F.concat(F.lit("P"), (F.col("l_partkey") % 10).cast("string")).alias(
            "producer"
        ),
        F.concat(F.lit("E"), (F.col("l_suppkey") % 8).cast("string")).alias(
            "engineer"
        ),
    )
    return (
        alib.dropDuplicates(["album_root", "producer", "engineer"])
        .groupBy("producer", "engineer")
        .agg(F.count(F.lit(1)).alias("n_albums"))
    )


# --------------------------------------------------------------------------
# S13: cross-DB metadata sync by track_uuid
# --------------------------------------------------------------------------

_S13_SQL = r"""
WITH target AS (
  SELECT 'p' || o_orderkey AS __path,
         'u' || CAST(o_orderkey % 5000 AS VARCHAR) AS track_uuid,
         'T' || CAST(o_orderkey % 7 AS VARCHAR) AS title,
         'A' || CAST(o_orderkey % 11 AS VARCHAR) AS artist
  FROM orders
), src_raw AS (
  SELECT 'u' || CAST(l_orderkey % 5000 AS VARCHAR) AS track_uuid,
         CASE WHEN l_orderkey % 2 = 0
              THEN 'S' || CAST(l_orderkey % 7 AS VARCHAR) END AS title,
         'A' || CAST(l_orderkey % 11 AS VARCHAR) AS artist,
         l_orderkey, l_linenumber
  FROM lineitem
), src AS (
  SELECT track_uuid, title, artist FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY track_uuid ORDER BY l_orderkey, l_linenumber) AS rn
    FROM src_raw
  ) WHERE rn = 1
)
SELECT t.__path,
       CASE WHEN s.title IS NOT NULL AND s.title <> t.title
            THEN s.title ELSE t.title END AS title,
       CASE WHEN s.artist IS NOT NULL AND s.artist <> t.artist
            THEN s.artist ELSE t.artist END AS artist,
       CAST((CASE WHEN s.title IS NOT NULL AND s.title <> t.title
                  THEN 1 ELSE 0 END)
          + (CASE WHEN s.artist IS NOT NULL AND s.artist <> t.artist
                  THEN 1 ELSE 0 END) AS INT) AS n_changed
FROM target t LEFT JOIN src s USING (track_uuid)
"""


@q("s13_sync_by_uuid", _S13_SQL)
def s13_sync_by_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 (scripts/export/98-sync-metadata-by-track-uuid.py:111-240):
    source deduped per track_uuid by a deterministic keeper window
    (GROUP BY uuid, MIN(rowid) in the reference), then a left join onto
    the target updating only columns that actually differ, with a
    changed-field count per row (the reference's update log)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    target = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.concat(F.lit("u"), (k % 5000).cast("string")).alias("track_uuid"),
        F.concat(F.lit("T"), (k % 7).cast("string")).alias("title"),
        F.concat(F.lit("A"), (k % 11).cast("string")).alias("artist"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    lk = F.col("l_orderkey")
    src_raw = li.select(
        F.concat(F.lit("u"), (lk % 5000).cast("string")).alias("track_uuid"),
        F.when(lk % 2 == 0, F.concat(F.lit("S"), (lk % 7).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("s_title"),
        F.concat(F.lit("A"), (lk % 11).cast("string")).alias("s_artist"),
        lk.alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    keeper_w = W.partitionBy("track_uuid").orderBy(F.asc("ok"), F.asc("ln"))
    src = (
        src_raw.withColumn("rn", F.row_number().over(keeper_w))
        .filter(F.col("rn") == 1)
        .select("track_uuid", "s_title", "s_artist")
    )
    joined = target.join(src, "track_uuid", "left")
    title_chg = F.col("s_title").isNotNull() & (F.col("s_title") != F.col("title"))
    artist_chg = F.col("s_artist").isNotNull() & (
        F.col("s_artist") != F.col("artist")
    )
    return joined.select(
        "__path",
        F.when(title_chg, F.col("s_title")).otherwise(F.col("title")).alias("title"),
        F.when(artist_chg, F.col("s_artist"))
        .otherwise(F.col("artist"))
        .alias("artist"),
        (title_chg.cast("int") + artist_chg.cast("int")).alias("n_changed"),
    )
