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


# --------------------------------------------------------------------------
# A19: ReplayGain derived loudness metrics
# --------------------------------------------------------------------------

_RG_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 400 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 9 = 0 THEN NULL
              ELSE (CASE WHEN l_orderkey % 2 = 0 THEN '-' ELSE '+' END)
                   || CAST(l_orderkey % 10 AS VARCHAR) || '.'
                   || CAST(l_partkey % 100 AS VARCHAR) || ' dB' END
           AS replaygain_album_gain,
         CASE WHEN l_partkey % 11 = 0 THEN ''
              WHEN l_orderkey % 3 = 0
                THEN '1.0' || CAST(l_partkey % 10 AS VARCHAR)
              ELSE '0.9' || CAST(l_partkey % 10 AS VARCHAR) END
           AS replaygain_album_peak,
         CASE WHEN l_suppkey % 7 = 0 THEN NULL
              ELSE (CASE WHEN l_suppkey % 2 = 0 THEN '-' ELSE '' END)
                   || CAST(l_suppkey % 12 AS VARCHAR) || '.'
                   || CAST(l_linenumber AS VARCHAR) || ' dB' END
           AS replaygain_track_gain
  FROM lineitem
), parsed AS (
  SELECT album_root,
         TRY_CAST(regexp_extract(replaygain_album_gain,
            '([+-]?\d+(?:\.\d+)?)', 1) AS DOUBLE) AS rg_album_gain_db,
         TRY_CAST(regexp_extract(replaygain_album_peak,
            '(\d+(?:\.\d+)?)', 1) AS DOUBLE) AS rg_album_peak,
         TRY_CAST(regexp_extract(replaygain_track_gain,
            '([+-]?\d+(?:\.\d+)?)', 1) AS DOUBLE) AS rg_track_gain_db
  FROM alib
), agg AS (
  SELECT album_root,
         QUANTILE_CONT(rg_album_gain_db, 0.5) AS gain_med,
         MAX(rg_album_peak) AS peak_max,
         CAST(COUNT(rg_album_gain_db) AS BIGINT) AS rg_album_gain_n,
         CAST(COUNT(rg_album_peak) AS BIGINT) AS rg_album_peak_n,
         QUANTILE_CONT(rg_track_gain_db, 0.90)
           - QUANTILE_CONT(rg_track_gain_db, 0.10) AS track_spread
  FROM parsed GROUP BY album_root
)
SELECT album_root,
       CAST(ROUND(gain_med, 4) AS DOUBLE) AS rg_album_gain_db,
       CAST(ROUND(peak_max, 4) AS DOUBLE) AS rg_album_peak,
       rg_album_gain_n, rg_album_peak_n,
       CAST(ROUND(track_spread, 4) AS DOUBLE) AS rg_track_gain_p90_p10_db,
       CAST(ROUND(CASE WHEN peak_max > 0 THEN 20.0 * log10(peak_max) END, 4)
            AS DOUBLE) AS rg_album_peak_dbfs,
       CAST(ROUND(-18.0 - gain_med, 4) AS DOUBLE) AS rg_album_lufs,
       CAST(ROUND((CASE WHEN peak_max > 0 THEN 20.0 * log10(peak_max) END)
                  - (-18.0 - gain_med), 4) AS DOUBLE) AS rg_album_plr
FROM agg
"""


@q("r92_replaygain", _RG_SQL)
def r92_replaygain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplayGain derived metrics (92-library-insights.py:1261-1390):
    parse '±N.NN dB' gains / linear peaks per track, aggregate per album
    (median gain, max peak, non-null counts, p90-p10 track-gain spread),
    then dBFS = 20·log10(peak), LUFS = -18 − gain, PLR = dBFS − LUFS.
    One hash aggregate; the exact `percentile` matches QUANTILE_CONT —
    at 100 TB swap to approx_percentile and record the tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk, ln = (
        F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey"),
        F.col("l_linenumber"),
    )
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 400).cast("string")).alias("album_root"),
        F.when(ok % 9 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.when(ok % 2 == 0, F.lit("-")).otherwise(F.lit("+")),
                (ok % 10).cast("string"), F.lit("."),
                (pk % 100).cast("string"), F.lit(" dB"),
            )
        )
        .alias("replaygain_album_gain"),
        F.when(pk % 11 == 0, F.lit(""))
        .when(ok % 3 == 0, F.concat(F.lit("1.0"), (pk % 10).cast("string")))
        .otherwise(F.concat(F.lit("0.9"), (pk % 10).cast("string")))
        .alias("replaygain_album_peak"),
        F.when(sk % 7 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.when(sk % 2 == 0, F.lit("-")).otherwise(F.lit("")),
                (sk % 12).cast("string"), F.lit("."),
                ln.cast("string"), F.lit(" dB"),
            )
        )
        .alias("replaygain_track_gain"),
    )
    parsed = alib.select(
        "album_root",
        F.regexp_extract("replaygain_album_gain", r"([+-]?\d+(?:\.\d+)?)", 1)
        .try_cast("double")
        .alias("g"),
        F.regexp_extract("replaygain_album_peak", r"(\d+(?:\.\d+)?)", 1)
        .try_cast("double")
        .alias("p"),
        F.regexp_extract("replaygain_track_gain", r"([+-]?\d+(?:\.\d+)?)", 1)
        .try_cast("double")
        .alias("tg"),
    )
    agg = parsed.groupBy("album_root").agg(
        F.percentile("g", F.lit(0.5)).alias("gain_med"),
        F.max("p").alias("peak_max"),
        F.count("g").alias("rg_album_gain_n"),
        F.count("p").alias("rg_album_peak_n"),
        (F.percentile("tg", F.lit(0.90)) - F.percentile("tg", F.lit(0.10))).alias(
            "track_spread"
        ),
    )
    dbfs = F.when(F.col("peak_max") > 0, F.lit(20.0) * F.log10("peak_max"))
    lufs = F.lit(-18.0) - F.col("gain_med")
    return agg.select(
        "album_root",
        F.round("gain_med", 4).cast("double").alias("rg_album_gain_db"),
        F.round("peak_max", 4).cast("double").alias("rg_album_peak"),
        "rg_album_gain_n",
        "rg_album_peak_n",
        F.round("track_spread", 4).cast("double").alias("rg_track_gain_p90_p10_db"),
        F.round(dbfs, 4).cast("double").alias("rg_album_peak_dbfs"),
        F.round(lufs, 4).cast("double").alias("rg_album_lufs"),
        F.round(dbfs - lufs, 4).cast("double").alias("rg_album_plr"),
    )


# --------------------------------------------------------------------------
# A20: acquisition timeline (ingest file-mod epoch → albums per year)
# --------------------------------------------------------------------------

_ACQ_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 500 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 13 = 0 THEN 'n/a'
              WHEN l_orderkey % 2 = 0
                THEN CAST((1100000000 + (l_orderkey % 700) * 86400 * 9
                           + l_partkey % 86400) * 1000 AS VARCHAR)
              ELSE CAST(1100000000 + (l_orderkey % 700) * 86400 * 9
                        + l_partkey % 86400 AS VARCHAR) END
           AS __file_mod_datetime_raw
  FROM lineitem
), parsed AS (
  SELECT album_root,
         TRY_CAST(regexp_extract(__file_mod_datetime_raw, '(\d+)', 1)
                  AS BIGINT) AS ts
  FROM alib
), stamped AS (
  SELECT album_root,
         CASE WHEN ts IS NOT NULL AND ts > 50000000000
                THEN make_timestamp(ts * 1000)
              WHEN ts IS NOT NULL AND ts > 0
                THEN make_timestamp(ts * 1000000)
              END AS mod_dt
  FROM parsed
), album_acq AS (
  SELECT album_root, MIN(mod_dt) AS acq_dt FROM stamped GROUP BY album_root
)
SELECT CAST(EXTRACT(year FROM acq_dt) AS INT) AS acquired_year,
       CAST((EXTRACT(year FROM acq_dt) // 10) * 10 AS INT) AS acquired_decade,
       CAST(COUNT(*) AS BIGINT) AS albums
FROM album_acq
WHERE acq_dt IS NOT NULL
GROUP BY acquired_year, acquired_decade
"""


@q("r92_acquisition", _ACQ_SQL)
def r92_acquisition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition timeline (92-library-insights.py:825-851, 1838-1877):
    parse the ingest file-mod epoch (heuristic: >5e10 ⇒ milliseconds),
    min per album = acquisition instant, then albums per acquired year
    (+decade). All UTC on both engines (naive timestamps)."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    sec = (
        F.lit(1100000000)
        + (ok % 700) * 86400 * 9
        + pk % 86400
    )
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 500).cast("string")).alias("album_root"),
        F.when(ok % 13 == 0, F.lit("n/a"))
        .when(ok % 2 == 0, (sec * 1000).cast("string"))
        .otherwise(sec.cast("string"))
        .alias("__file_mod_datetime_raw"),
    )
    ts = F.regexp_extract("__file_mod_datetime_raw", r"(\d+)", 1).try_cast("long")
    stamped = alib.select(
        "album_root",
        F.when(ts.isNotNull() & (ts > 50000000000), F.timestamp_millis(ts))
        .when(ts.isNotNull() & (ts > 0), F.timestamp_seconds(ts))
        .alias("mod_dt"),
    )
    acq = stamped.groupBy("album_root").agg(F.min("mod_dt").alias("acq_dt"))
    yr = F.year("acq_dt")
    return (
        acq.filter(F.col("acq_dt").isNotNull())
        .groupBy(
            yr.cast("int").alias("acquired_year"),
            (F.floor(yr / 10) * 10).cast("int").alias("acquired_decade"),
        )
        .agg(F.count(F.lit(1)).alias("albums"))
    )


# --------------------------------------------------------------------------
# A21: record-label reach (top labels + artist spread)
# --------------------------------------------------------------------------

_LBL_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 300 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 7 = 0 THEN NULL
              ELSE 'Label ' || CAST(l_partkey % 40 AS VARCHAR)
                || CASE WHEN l_orderkey % 5 = 0
                        THEN chr(92) || chr(92) || 'Label '
                             || CAST(l_suppkey % 40 AS VARCHAR)
                        ELSE '' END END AS label,
         CASE WHEN l_orderkey % 11 = 0 THEN NULL
              ELSE 'AA ' || CAST(l_orderkey % 120 AS VARCHAR) END
           AS albumartist
  FROM lineitem
), label_pairs AS (
  SELECT DISTINCT album_root, trim(tok) AS label_tok
  FROM alib, unnest(string_split(label, chr(92) || chr(92))) AS t(tok)
  WHERE label IS NOT NULL AND trim(tok) <> ''
), aa_pairs AS (
  SELECT DISTINCT album_root, trim(tok) AS albumartist_tok
  FROM alib, unnest(string_split(albumartist, chr(92) || chr(92))) AS t(tok)
  WHERE albumartist IS NOT NULL AND trim(tok) <> ''
)
SELECT label_tok,
       CAST(COUNT(*) AS BIGINT) AS albums,
       CAST(COUNT(DISTINCT albumartist_tok) AS BIGINT) AS artist_spread
FROM label_pairs lp
LEFT JOIN aa_pairs aa USING (album_root)
WHERE albumartist_tok IS NOT NULL
GROUP BY label_tok
HAVING COUNT(*) >= 5
"""


@q("r92_label_spread", _LBL_SQL)
def r92_label_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label reach (92-library-insights.py:2621-2641): explode the
    multi-value label tag to distinct (album, label) pairs, join distinct
    (album, albumartist) pairs, then per label count rows ('albums', the
    reference's pl.len() — deliberately aa-inflated, ported faithfully)
    and distinct artists; keep labels on >=5 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 300).cast("string")).alias("album_root"),
        F.when(ok % 7 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("Label "), (pk % 40).cast("string"),
                F.when(
                    ok % 5 == 0,
                    F.concat(F.lit("\\\\Label "), (sk % 40).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("label"),
        F.when(ok % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("AA "), (ok % 120).cast("string")))
        .alias("albumartist"),
    )
    label_pairs = (
        alib.filter(F.col("label").isNotNull())
        .select(
            "album_root",
            F.explode(F.split("label", r"\\\\")).alias("tok"),
        )
        .select("album_root", F.trim("tok").alias("label_tok"))
        .filter(F.col("label_tok") != "")
        .distinct()
    )
    aa_pairs = (
        alib.filter(F.col("albumartist").isNotNull())
        .select(
            "album_root",
            F.explode(F.split("albumartist", r"\\\\")).alias("tok"),
        )
        .select("album_root", F.trim("tok").alias("albumartist_tok"))
        .filter(F.col("albumartist_tok") != "")
        .distinct()
    )
    return (
        label_pairs.join(aa_pairs, "album_root", "left")
        .filter(F.col("albumartist_tok").isNotNull())
        .groupBy("label_tok")
        .agg(
            F.count(F.lit(1)).alias("albums"),
            F.count_distinct("albumartist_tok").alias("artist_spread"),
        )
        .filter(F.col("albums") >= 5)
    )


# --------------------------------------------------------------------------
# A22: genre drift by decade
# --------------------------------------------------------------------------

_DRIFT_SQL = r"""
WITH genres(gid, genre) AS (
  VALUES (0, 'Classical'), (1, 'Jazz'), (2, 'Rock'), (3, 'Pop'),
         (4, 'Electronic'), (5, 'Techno'), (6, 'Folk'), (7, 'Baroque'),
         (8, 'Indie'), (9, 'Ambient')
), albums AS (
  SELECT DISTINCT l_orderkey % 600 AS album_id,
         1950 + (l_orderkey % 600) % 75 AS album_year,
         CAST((l_orderkey % 600) % 10 AS INT) AS gid
  FROM lineitem
), bucketed AS (
  SELECT album_id, (album_year // 10) * 10 AS decade,
         CASE WHEN genre IN ('Classical', 'Baroque') THEN 'Classical'
              WHEN genre IN ('Jazz') THEN 'Jazz'
              WHEN genre IN ('Rock', 'Pop', 'Indie') THEN 'Rock/Pop'
              WHEN genre IN ('Electronic', 'Techno') THEN 'Electronic'
              ELSE 'Other' END AS bucket
  FROM albums JOIN genres USING (gid)
)
SELECT CAST(decade AS INT) AS decade, bucket,
       CAST(COUNT(*) AS BIGINT) AS albums
FROM bucketed GROUP BY decade, bucket
"""


@q("r92_genre_drift", _DRIFT_SQL)
def r92_genre_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genre drift by decade (92-library-insights.py:3280-3310): album
    decade × genre bucket (Classical/Jazz/Rock-Pop/Electronic/Other)
    album counts — the genre dimension is a broadcast lookup, the rest
    one hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    genres = li.sparkSession.createDataFrame(
        [
            (0, "Classical"), (1, "Jazz"), (2, "Rock"), (3, "Pop"),
            (4, "Electronic"), (5, "Techno"), (6, "Folk"), (7, "Baroque"),
            (8, "Indie"), (9, "Ambient"),
        ],
        "gid int, genre string",
    )
    aid = F.col("l_orderkey") % 600
    albums = li.select(
        aid.alias("album_id"),
        (F.lit(1950) + aid % 75).alias("album_year"),
        (aid % 10).cast("int").alias("gid"),
    ).distinct()
    bucket = (
        F.when(F.col("genre").isin("Classical", "Baroque"), F.lit("Classical"))
        .when(F.col("genre") == "Jazz", F.lit("Jazz"))
        .when(F.col("genre").isin("Rock", "Pop", "Indie"), F.lit("Rock/Pop"))
        .when(F.col("genre").isin("Electronic", "Techno"), F.lit("Electronic"))
        .otherwise(F.lit("Other"))
    )
    return (
        albums.join(F.broadcast(genres), "gid")
        .select(((F.col("album_year") / 10).cast("int") * 10).alias("decade"), bucket.alias("bucket"))
        .groupBy(F.col("decade").cast("int").alias("decade"), "bucket")
        .agg(F.count(F.lit(1)).alias("albums"))
    )
