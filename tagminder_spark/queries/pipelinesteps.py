"""Pipeline-step queries: the reference's numbered steps exercised through
the driver's correctness gate.

The testdata has no alib table, so each query synthesizes an alib-shaped
frame *deterministically* from the star schema (same construction in the
oracle SQL), runs the real step implementation from
``tagminder_spark.pipeline``, and returns the transformed columns.
step21 (title-case UDF) has no SQL oracle — rows-only check, by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    step02_clean_text,
    step04_merge_writers,
    step09_live_markers,
    step12_compilations,
    step20_dates,
    step21_titlecase,
)
from tagminder_spark.operators.diff_audit import diff_audit
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
# step 12: compilation detection
# --------------------------------------------------------------------------

_S12_SQL = """
WITH alib AS (
  SELECT 'p' || l_orderkey || '-' || l_linenumber AS __path,
         '/m/' || (CASE WHEN l_orderkey % 7 = 0 THEN 'VA - ' ELSE 'album' END)
               || CAST(l_orderkey AS VARCHAR) AS __dirpath,
         'Artist ' || CAST(l_partkey % 5 AS VARCHAR) AS artist,
         CASE CAST(l_orderkey % 3 AS INT)
           WHEN 0 THEN NULL WHEN 1 THEN 'various' ELSE 'Fixed Artist' END
           AS albumartist,
         '0' AS compilation
  FROM lineitem
), counts AS (
  SELECT __dirpath, COUNT(DISTINCT artist) AS n_artists, MIN(artist) AS first_artist
  FROM alib GROUP BY __dirpath
), joined AS (
  SELECT a.*, c.n_artists, c.first_artist,
         (a.albumartist IS NULL OR trim(a.albumartist) = ''
          OR trim(a.albumartist) = '""') AS aa_blank,
         lower(trim(a.albumartist)) IN ('various artists', 'various') AS aa_various,
         str_split(a.__dirpath, '/')[-1] AS last_seg
  FROM alib a JOIN counts c USING (__dirpath)
)
SELECT __path,
       CASE WHEN (aa_blank AND n_artists > 1) OR (aa_various AND n_artists > 1)
              THEN 'Various Artists'
            WHEN aa_blank AND n_artists = 1 THEN first_artist
            ELSE albumartist END AS albumartist,
       CASE WHEN (aa_blank AND n_artists > 1) OR (aa_various AND n_artists > 1)
              THEN '1'
            WHEN aa_blank AND n_artists = 1 THEN '0'
            WHEN last_seg LIKE 'VA - %' OR last_seg LIKE 'Various Artists - %'
              OR last_seg LIKE 'OST - %' THEN '1'
            ELSE '0' END AS compilation
FROM joined
"""


@q("pl_step12_compilations", _S12_SQL)
def pl_step12_compilations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 12 (12-detect-compilations.py:63-201) over a synthesized
    library: artist-cardinality rules via per-directory window, then
    path-pattern rules — no groupBy+rejoin."""
    li = load_table(spark, sf_dir, "lineitem")
    alib = li.select(
        F.concat(F.lit("p"), "l_orderkey", F.lit("-"), "l_linenumber").alias(
            "__path"
        ),
        F.concat(
            F.lit("/m/"),
            F.when(F.col("l_orderkey") % 7 == 0, F.lit("VA - ")).otherwise(
                F.lit("album")
            ),
            F.col("l_orderkey").cast("string"),
        ).alias("__dirpath"),
        F.concat(F.lit("Artist "), (F.col("l_partkey") % 5).cast("string")).alias(
            "artist"
        ),
        F.when((F.col("l_orderkey") % 3).cast("int") == 0, F.lit(None).cast("string"))
        .when((F.col("l_orderkey") % 3).cast("int") == 1, F.lit("various"))
        .otherwise(F.lit("Fixed Artist"))
        .alias("albumartist"),
        F.lit("0").alias("compilation"),
    )
    return step12_compilations(alib).select("__path", "albumartist", "compilation")


# --------------------------------------------------------------------------
# step 09: live markers
# --------------------------------------------------------------------------

_S09_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'Song ' || o_orderkey || ' (Live)'
           WHEN 1 THEN 'Song ' || o_orderkey || ' - live'
           ELSE 'Song ' || o_orderkey END AS title,
         CASE CAST(o_orderkey % 5 AS INT)
           WHEN 0 THEN NULL WHEN 1 THEN 'Live in Paris' ELSE 'Plain note' END
           AS subtitle,
         CASE WHEN o_orderkey % 6 = 0 THEN 'Album ' || o_custkey || ' [live]'
              ELSE 'Album ' || o_custkey END AS album,
         '0' AS live
  FROM orders
), marked AS (
  SELECT *,
         regexp_matches(title, '(?i)(?:[\(\[\{<]\s*live\s*[\)\]\}>]|- live)\s*$')
         OR regexp_matches(album, '(?i)(?:[\(\[\{<]\s*live\s*[\)\]\}>]|- live)\s*$')
         AS hit
  FROM alib
), sub AS (
  SELECT *,
         trim(regexp_replace(regexp_replace(subtitle, '\\\\', '; ', 'g'),
                             '\s*;\s*', '; ', 'g')) AS sub_norm
  FROM marked
)
SELECT __path,
       CASE WHEN hit THEN NULLIF(trim(regexp_replace(title,
              '(?i)(?:[\(\[\{<]\s*live\s*[\)\]\}>]|- live)\s*$', '')), '')
            ELSE title END AS title,
       CASE WHEN hit THEN NULLIF(trim(regexp_replace(album,
              '(?i)(?:[\(\[\{<]\s*live\s*[\)\]\}>]|- live)\s*$', '')), '')
            ELSE album END AS album,
       CASE WHEN NOT hit THEN subtitle
            WHEN subtitle IS NOT NULL AND regexp_matches(sub_norm, '(?i)\blive\b')
              THEN sub_norm
            WHEN subtitle IS NOT NULL THEN sub_norm || '; [Live]'
            ELSE '[Live]' END AS subtitle,
       CASE WHEN hit THEN '1' ELSE live END AS live
FROM sub
"""


@q("pl_step09_live_markers", _S09_SQL)
def pl_step09_live_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 09 (09-normalize-live-markers.py:41-135): strip trailing live
    markers, normalize subtitle separators, append [Live] once, set flag."""
    o = load_table(spark, sf_dir, "orders")
    m4 = (F.col("o_orderkey") % 4).cast("int")
    m5 = (F.col("o_orderkey") % 5).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), "o_orderkey").alias("__path"),
        F.when(m4 == 0, F.concat(F.lit("Song "), "o_orderkey", F.lit(" (Live)")))
        .when(m4 == 1, F.concat(F.lit("Song "), "o_orderkey", F.lit(" - live")))
        .otherwise(F.concat(F.lit("Song "), "o_orderkey"))
        .alias("title"),
        F.when(m5 == 0, F.lit(None).cast("string"))
        .when(m5 == 1, F.lit("Live in Paris"))
        .otherwise(F.lit("Plain note"))
        .alias("subtitle"),
        F.when(
            F.col("o_orderkey") % 6 == 0,
            F.concat(F.lit("Album "), "o_custkey", F.lit(" [live]")),
        )
        .otherwise(F.concat(F.lit("Album "), "o_custkey"))
        .alias("album"),
        F.lit("0").alias("live"),
    )
    return step09_live_markers(alib).select(
        "__path", "title", "album", "subtitle", "live"
    )


# --------------------------------------------------------------------------
# step 20: dates over multi-value cells
# --------------------------------------------------------------------------

_S20_SQL = f"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN strftime(o_orderdate, '%Y') || '{D}' ||
                       strftime(o_orderdate, '%Y-%m-%d') || '{D}junk'
           WHEN 1 THEN strftime(o_orderdate, '%Y%m%d')
           ELSE 'garbage' END AS year
  FROM orders
), toks AS (
  SELECT __path, trim(tok) AS tok, ord
  FROM alib, LATERAL (
    SELECT unnest(string_split(year, '{D}')) AS tok,
           generate_subscripts(string_split(year, '{D}'), 1) AS ord
  )
  WHERE trim(tok) <> ''
), norm AS (
  SELECT __path, ord,
    CASE
      WHEN tok ~ '^[0-9]{{4}}$' THEN tok
      WHEN tok ~ '^[0-9]{{4}}-[0-9]{{2}}$' THEN substr(tok, 1, 4)
      WHEN regexp_replace(regexp_replace(tok,
             '^([0-9]{{4}})([0-9]{{2}})([0-9]{{2}})$', '\\1-\\2-\\3'),
             '^([0-9]{{4}})[/.]([0-9]{{2}})[/.]([0-9]{{2}})$', '\\1-\\2-\\3')
           ~ '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$'
      THEN regexp_replace(regexp_replace(tok,
             '^([0-9]{{4}})([0-9]{{2}})([0-9]{{2}})$', '\\1-\\2-\\3'),
             '^([0-9]{{4}})[/.]([0-9]{{2}})[/.]([0-9]{{2}})$', '\\1-\\2-\\3')
      ELSE NULL END AS val
  FROM toks
), dedup AS (
  SELECT __path, val, MIN(ord) AS mo FROM norm WHERE val IS NOT NULL
  GROUP BY __path, val
), agg AS (
  SELECT __path, STRING_AGG(val, '{D}' ORDER BY mo) AS year FROM dedup
  GROUP BY __path
)
SELECT a.__path, g.year FROM alib a LEFT JOIN agg g USING (__path)
"""


@q("pl_step20_dates", _S20_SQL)
def pl_step20_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 20 (20-normalize-dates-and-years.py:95-221): canonicalize every
    token of multi-value date cells; unparseable tokens drop; blank⇒NULL."""
    o = load_table(spark, sf_dir, "orders")
    m3 = (F.col("o_orderkey") % 3).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), "o_orderkey").alias("__path"),
        F.when(
            m3 == 0,
            F.concat(
                F.date_format("o_orderdate", "yyyy"),
                F.lit(D),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit(D + "junk"),
            ),
        )
        .when(m3 == 1, F.date_format("o_orderdate", "yyyyMMdd"))
        .otherwise(F.lit("garbage"))
        .alias("year"),
    )
    return step20_dates(alib, ("year",)).select("__path", "year")


# --------------------------------------------------------------------------
# step 02 + diff-audit: changelog of a real cleaning pass
# --------------------------------------------------------------------------

_S02_SQL = """
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'Song ' || o_orderkey || chr(13) || chr(10)
           WHEN 1 THEN 'â€™' WHEN 2 THEN '   '
           ELSE 'Clean ' || o_orderkey END AS title
  FROM orders
), cleaned AS (
  SELECT __path,
         NULLIF(NULLIF(trim(
           CASE WHEN trim(regexp_replace(title, chr(13) || '?' || chr(10), '', 'g'))
                     IN ('â€™', 'Ì')
                THEN '''' ELSE regexp_replace(title, chr(13) || '?' || chr(10), '', 'g')
           END), ''), '""') AS title
  FROM alib
)
SELECT a.__path AS alib_path, 'title' AS alib_column,
       NULLIF(NULLIF(trim(a.title), ''), '""') AS old_value,
       c.title AS new_value,
       '02-clean-text' AS script
FROM alib a JOIN cleaned c USING (__path)
WHERE NULLIF(NULLIF(trim(a.title), ''), '""') IS DISTINCT FROM c.title
"""


@q("pl_step02_changelog", _S02_SQL)
def pl_step02_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 02 routed through diff-audit (the §2.10 lifecycle end-to-end):
    CRLF/mojibake cleanup emitting only genuinely-changed fields."""
    o = load_table(spark, sf_dir, "orders")
    m4 = (F.col("o_orderkey") % 4).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), "o_orderkey").alias("__path"),
        F.when(m4 == 0, F.concat(F.lit("Song "), "o_orderkey", F.lit("\r\n")))
        .when(m4 == 1, F.lit("â€™"))
        .when(m4 == 2, F.lit("   "))
        .otherwise(F.concat(F.lit("Clean "), "o_orderkey"))
        .alias("title"),
    )
    _, changelog = diff_audit(
        alib,
        step02_clean_text(alib, ("title",)),
        "__path",
        ["title"],
        script="02-clean-text",
    )
    return changelog


# --------------------------------------------------------------------------
# step 04: caseless ordered merge (pure-fold dedup)
# --------------------------------------------------------------------------

_S04_SQL = f"""
WITH alib AS (
  SELECT 'p' || p_partkey AS __path,
         p_name || '{D}' || upper(p_name) AS composer,
         p_type AS arranger,
         CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE NULL END AS lyricist,
         p_brand AS writer
  FROM part
), toks AS (
  SELECT __path, trim(tok) AS tok,
         (src * 1000 + ord) AS pos
  FROM alib, LATERAL (
    SELECT 1 AS src, unnest(string_split(composer, '{D}')) AS tok,
           generate_subscripts(string_split(composer, '{D}'), 1) AS ord
    UNION ALL
    SELECT 2, unnest(string_split(coalesce(arranger, ''), '{D}')),
           generate_subscripts(string_split(coalesce(arranger, ''), '{D}'), 1)
    UNION ALL
    SELECT 3, unnest(string_split(coalesce(lyricist, ''), '{D}')),
           generate_subscripts(string_split(coalesce(lyricist, ''), '{D}'), 1)
    UNION ALL
    SELECT 4, unnest(string_split(coalesce(writer, ''), '{D}')),
           generate_subscripts(string_split(coalesce(writer, ''), '{D}'), 1)
  )
  WHERE trim(tok) <> ''
), firsts AS (
  SELECT __path, lower(tok) AS key, MIN(pos) AS mp FROM toks
  GROUP BY __path, lower(tok)
), chosen AS (
  SELECT t.__path, t.tok, f.mp
  FROM toks t JOIN firsts f
    ON f.__path = t.__path AND f.key = lower(t.tok) AND f.mp = t.pos
)
SELECT __path, STRING_AGG(tok, '{D}' ORDER BY mp) AS composer
FROM chosen GROUP BY __path
"""


@q("pl_step04_merge_writers", _S04_SQL)
def pl_step04_merge_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 04 (04-merge-songwriter-fields-into-composer.py:31-89): ordered
    case-insensitive merge of four multi-value fields, first-seen spelling
    wins — a pure fold expression, no UDF."""
    p = load_table(spark, sf_dir, "part")
    alib = p.select(
        F.concat(F.lit("p"), "p_partkey").alias("__path"),
        F.concat("p_name", F.lit(D), F.upper("p_name")).alias("composer"),
        F.col("p_type").alias("arranger"),
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type")).alias("lyricist"),
        F.col("p_brand").alias("writer"),
    )
    return step04_merge_writers(alib).select("__path", "composer")


# --------------------------------------------------------------------------
# step 21: title case (UDF — value-checked against the golden corpus)
# --------------------------------------------------------------------------

# The casing engines can't be reimplemented in SQL, but their goldens —
# generated by executing the REFERENCE's pure functions
# (tm_titlecase.py:180, tm_contributor_case.py:96) — are a parquet
# fixture both engines can read. The oracle declares actual := expected,
# so the hash matches iff the Spark UDF output equals the reference's
# output on every case. This upgrades the round-2 rows-only slot to a
# full value check without a DuckDB reimplementation.
from pathlib import Path as _Path

_GOLDEN_PARQUET = str(
    _Path(__file__).resolve().parents[2] / "tests" / "goldens" / "textcase_golden.parquet"
)

_S21_SQL = f"""
SELECT kind, case_id, input, expected, expected AS actual,
       1 AS is_match
FROM read_parquet('{_GOLDEN_PARQUET}')
"""


@q("pl_step21_titlecase", _S21_SQL)
def pl_step21_titlecase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 21 (21-normalise-titles.py:100-118 → tm_titlecase.py:180,
    tm_contributor_case.py:96): conservative title-case + contributor
    smart-case pandas UDFs, value-checked against the reference-executed
    golden corpus (114 cases covering every rule family). `is_match` is
    computed Spark-side; the oracle pins it to 1, so any divergence from
    the reference's behavior fails the hash."""
    from tagminder_spark.functions.textcase import (  # noqa: PLC0415
        contributor_case_udf,
        title_case_udf,
    )

    g = spark.read.parquet(_GOLDEN_PARQUET)
    actual = F.when(
        F.col("kind") == "title_case", title_case_udf(F.col("input"))
    ).otherwise(contributor_case_udf(F.col("input")))
    out = g.select("kind", "case_id", "input", "expected", actual.alias("actual"))
    return out.withColumn(
        "is_match",
        (
            F.col("actual").eqNullSafe(F.col("expected"))
        ).cast("int"),
    )
