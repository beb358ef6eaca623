"""Rename-planner gate (98-rename-files-and-folders.py): the full plan —
filename build, directory-name derivation, collision detection, action —
value-checked against a DuckDB oracle that replays the identical
semantics over the same synthesized catalog.

The oracle SQL is generated from small Python helpers (one per ported
reference function) so each expression stays a line-for-line mirror of
operators/rename.py; parity pins: translate() deletion semantics,
min_by() null-key skipping, printf %0Nd, regexp_extract '' on no-match —
all verified identical between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.operators.rename import rename_plan
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table, spread

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# ---- SQL mirrors of operators/rename.py expression helpers ----------------


def _blank(e: str) -> str:
    return f"({e} IS NULL OR trim({e}) = '' OR trim({e}) = '\"\"')"


def _san(e: str) -> str:
    """sanitize_component: translate, trim spaces, strip outer dots,
    collapse whitespace (both regexp_replace need DuckDB's 'g' flag to
    match Spark's replace-all default)."""
    t = f"translate({e}, '/\\:|\"*?<>', '----''')"
    return (
        f"regexp_replace(regexp_replace(trim({t}), '^\\.+|\\.+$', '', 'g'),"
        f" '\\s+', ' ', 'g')"
    )


def _pad(track: str, max_track: str) -> str:
    n = f"TRY_CAST(trim({track}) AS INTEGER)"
    return (
        f"CASE WHEN {_blank(track)} THEN {track}"
        f" WHEN {n} IS NULL THEN {track}"
        f" WHEN {max_track} >= 100 THEN printf('%03d', {n})"
        f" ELSE printf('%02d', {n}) END"
    )


def _first_nonblank(value: str, order: str) -> str:
    return f"min_by({value}, CASE WHEN NOT {_blank(value)} THEN {order} END)"


_YEAR_RE = "'\\b(19|20)\\d{2}\\b'"


def _mk_rename_sql(alib_sql: str) -> str:
    ext = "regexp_extract(__filename, '\\.([^.]*)$', 1)"
    track_p = _san(_pad("track", "max_track"))
    disc_part = (
        f"CASE WHEN NOT {_blank('discnumber')} THEN trim(discnumber) || '-'"
        f" ELSE '' END"
    )
    track_part = (
        f"CASE WHEN NOT {_blank('track_p')} THEN trim(track_p) || ' - '"
        f" ELSE '' END"
    )
    artist_part = (
        f"CASE WHEN compilation = '1' AND NOT {_blank('artist_s')}"
        f" THEN artist_s || ' - ' ELSE '' END"
    )
    hi = (
        "(coalesce(TRY_CAST(__bitspersample AS DOUBLE), 0) > 16"
        " OR coalesce(TRY_CAST(__frequency_num AS DOUBLE), 0) > 44.1)"
    )
    year_c = (
        f"CASE WHEN NOT {_blank('year_first')}"
        f" THEN regexp_extract(year_first, {_YEAR_RE}, 0) END"
    )
    freq_s = "CAST(hi_freq AS VARCHAR)"
    fmt = (
        f"CAST(CAST(hi_bits AS INTEGER) AS VARCHAR) || "
        f"CASE WHEN contains({freq_s}, '.') THEN {freq_s}"
        f" ELSE {freq_s} || '.0' END"
    )
    va_name = (
        f"concat_ws(' - ', 'VA',"
        f" CASE WHEN NOT {_blank('year_c')} THEN {_san('year_c')} END,"
        f" CASE WHEN NOT {_blank('album_first')} THEN {_san('album_first')} END)"
    )
    aa_name = (
        f"concat_ws(' - ',"
        f" CASE WHEN NOT {_blank('aa_first')} THEN {_san('aa_first')} END,"
        f" CASE WHEN NOT {_blank('year_c')} THEN {_san('year_c')} END,"
        f" CASE WHEN NOT {_blank('album_first')} THEN {_san('album_first')} END)"
    )
    nf = "CASE WHEN " + _blank("new_filename") + " THEN old_filename ELSE new_filename END"
    # the MV delimiter is two literal backslashes; chr(92) sidesteps
    # DuckDB's '\\'-collapsing literal rules entirely
    aa_src = "replace(albumartist, chr(92) || chr(92), '')"
    aa_first_fn = _first_nonblank(aa_src, "__path")
    album_first_fn = _first_nonblank("album", "__path")
    year_first_fn = _first_nonblank("year", "__path")
    return f"""
WITH alib AS (
{alib_sql}
), rows0 AS (
  SELECT *,
         MAX(TRY_CAST(trim(track) AS INTEGER))
           OVER (PARTITION BY __dirpath) AS max_track
  FROM alib
), rows1 AS (
  SELECT *, {ext} AS ext, {track_p} AS track_p,
         {_san('artist')} AS artist_s, {_san('title')} AS title_s
  FROM rows0
), rows2 AS (
  SELECT *, trim({disc_part} || {track_part} || {artist_part}
           || coalesce(title_s, '')) AS base
  FROM rows1
), rows3 AS (
  SELECT *, CASE WHEN {_blank('base')} THEN ''
                 WHEN ends_with(base, '.' || ext) THEN base
                 ELSE base || '.' || ext END AS raw_name
  FROM rows2
), rows4 AS (
  SELECT *, CASE WHEN length(raw_name) <= 255 THEN raw_name
                 WHEN contains(raw_name, '.')
                      AND 255 - length(regexp_extract(raw_name, '\\.([^.]*)$', 1)) - 1 > 10
                   THEN substring(regexp_replace(raw_name, '\\.[^.]*$', ''), 1,
                          255 - length(regexp_extract(raw_name, '\\.([^.]*)$', 1)) - 1)
                        || '.' || regexp_extract(raw_name, '\\.([^.]*)$', 1)
                 ELSE substring(raw_name, 1, 255) END AS new_filename
  FROM rows3
), dir_facts0 AS (
  SELECT __dirpath,
         MAX(CASE WHEN compilation = '1' THEN 1 ELSE 0 END) AS is_comp,
         COUNT(DISTINCT CASE WHEN NOT {_blank('discnumber')}
                             THEN trim(discnumber) END) AS n_disc,
         MIN(CASE WHEN NOT {_blank('discnumber')}
                  THEN trim(discnumber) END) AS the_disc,
         {aa_first_fn} AS aa_first,
         {album_first_fn} AS album_first,
         {year_first_fn} AS year_first,
         MAX(CASE WHEN {hi} THEN 1 ELSE 0 END) AS needs_quality,
         COUNT(DISTINCT CASE WHEN {hi} THEN
             concat_ws('~', CAST(TRY_CAST(__bitspersample AS DOUBLE) AS VARCHAR),
                            CAST(TRY_CAST(__frequency_num AS DOUBLE) AS VARCHAR))
           END) AS n_qual,
         min_by(TRY_CAST(__bitspersample AS DOUBLE),
                CASE WHEN {hi} THEN __path END) AS hi_bits,
         min_by(TRY_CAST(__frequency_num AS DOUBLE),
                CASE WHEN {hi} THEN __path END) AS hi_freq
  FROM rows4 GROUP BY __dirpath
), dir_facts1 AS (
  SELECT *, {year_c} AS year_c FROM dir_facts0
), dir_facts2 AS (
  SELECT *, CASE WHEN is_comp = 1 THEN {va_name}
                 WHEN n_disc = 1 THEN 'cd' || the_disc
                 ELSE {aa_name} END AS base_dirname
  FROM dir_facts1
), dir_facts AS (
  SELECT __dirpath,
         base_dirname
         || (CASE WHEN needs_quality = 1 AND NOT {_blank('base_dirname')}
               THEN CASE WHEN n_qual > 1 THEN ' [Mixed Res]'
                         WHEN coalesce(hi_bits, 0) <> 0 AND coalesce(hi_freq, 0) <> 0
                           THEN ' [' || {fmt} || ' kHz]'
                         ELSE '' END
               ELSE '' END) AS new_dirname
  FROM dir_facts2
), planned0 AS (
  SELECT r.__path, r.__filename AS old_filename, r.__dirpath AS old_dirpath,
         r.new_filename, d.new_dirname,
         CASE WHEN {_blank('d.new_dirname')}
                   OR d.new_dirname = regexp_extract(r.__dirpath, '[^/]*$', 0)
              THEN r.__dirpath
              ELSE regexp_replace(r.__dirpath, '/[^/]*$', '') || '/' || d.new_dirname
         END AS new_dirpath
  FROM rows4 r JOIN dir_facts d USING (__dirpath)
), planned1 AS (
  SELECT *, new_dirpath || '/' ||
         (CASE WHEN {_blank('new_filename')} THEN old_filename
               ELSE new_filename END) AS new_path,
         {nf} AS nf_key
  FROM planned0
), planned1w AS (
  SELECT *, COUNT(*) OVER (PARTITION BY old_dirpath, nf_key) AS _nf_dupes
  FROM planned1
), planned2 AS (
  SELECT p.*, c.c_path
  FROM planned1w p
  LEFT JOIN (SELECT old_dirpath AS c_dir, old_filename AS c_name,
                    __path AS c_path FROM planned1w) c
    ON p.old_dirpath = c.c_dir AND p.nf_key = c.c_name
       AND p.__path <> c.c_path
)
SELECT __path, old_filename, old_dirpath, new_filename, new_dirname,
       new_dirpath, new_path,
       CAST(new_filename <> old_filename AS INTEGER) AS file_changed,
       CAST(new_dirpath <> old_dirpath AS INTEGER) AS dir_changed,
       CAST((_nf_dupes > 1 OR c_path IS NOT NULL)
            AND new_filename <> old_filename AS INTEGER) AS collision,
       CASE WHEN {_blank('new_filename')} THEN 'skip-empty'
            WHEN new_filename = old_filename AND new_dirpath = old_dirpath THEN 'noop'
            WHEN (_nf_dupes > 1 OR c_path IS NOT NULL)
                 AND new_filename <> old_filename THEN 'skip-collision'
            ELSE 'rename' END AS action
FROM planned2
"""


# ---- synthesized catalog: every dirname/filename branch exercised ---------

_ALIB_SQL = """
  SELECT '/mus/lib' || CAST(aid % 7 AS VARCHAR) || '/' ||
           CASE WHEN aid % 4 = 0 THEN 'VA comp ' ELSE 'band ' END
           || CAST(aid AS VARCHAR) AS __dirpath,
         'orig_' || CAST(fid AS VARCHAR) ||
           CASE WHEN fid % 17 = 0 THEN '' ELSE '.' || ext END AS __filename,
         '/mus/lib' || CAST(aid % 7 AS VARCHAR) || '/' ||
           CASE WHEN aid % 4 = 0 THEN 'VA comp ' ELSE 'band ' END
           || CAST(aid AS VARCHAR) || '/' ||
           'orig_' || CAST(fid AS VARCHAR) ||
           CASE WHEN fid % 17 = 0 THEN '' ELSE '.' || ext END AS __path,
         CASE WHEN aid % 4 = 0 THEN '1' ELSE '0' END AS compilation,
         CASE WHEN fid % 11 = 0 THEN ''
              WHEN fid % 13 = 0 THEN 'A' || CAST(fid % 9 AS VARCHAR)
              WHEN aid % 9 = 0 THEN CAST(100 + ln AS VARCHAR)
              ELSE CAST(ln AS VARCHAR) END AS track,
         CASE WHEN aid % 5 = 0 THEN '1'
              WHEN aid % 5 = 1 THEN CAST(1 + fid % 2 AS VARCHAR)
              ELSE '' END AS discnumber,
         CASE WHEN fid % 7 = 0 THEN ''
              ELSE 'Art/ist: ' || CAST(fid % 50 AS VARCHAR) END AS artist,
         CASE WHEN aid % 11 = 3 THEN 'same'
              WHEN fid % 19 = 0 THEN ''
              ELSE 'Ti*tle "N" <' || CAST(fid % 23 AS VARCHAR) || '>  sp .'
              END AS title,
         CASE WHEN aid % 6 = 0 THEN ''
              ELSE 'The' || chr(92) || chr(92) || 'Band ' || CAST(aid AS VARCHAR)
              END AS albumartist,
         CASE WHEN aid % 8 = 0 THEN '' ELSE 'Al:bum ' || CAST(aid AS VARCHAR)
              END AS album,
         CASE WHEN aid % 3 = 0 THEN '2001-05-03'
              WHEN aid % 3 = 1 THEN 'circa 1987!' ELSE 'none' END AS year,
         CASE WHEN aid % 10 = 0 THEN '24'
              WHEN aid % 10 = 5 THEN CASE WHEN fid % 2 = 0 THEN '24' ELSE '32' END
              ELSE '16' END AS __bitspersample,
         CASE WHEN aid % 10 IN (0, 5) THEN '96.0' ELSE '44.1' END
           AS __frequency_num
  FROM (
    SELECT l_orderkey % 300 AS aid, l_orderkey * 10 + l_linenumber AS fid,
           l_linenumber AS ln,
           CASE WHEN (l_orderkey % 300) % 11 = 3 THEN 'flac'
                ELSE CASE CAST((l_orderkey * 10 + l_linenumber) % 5 AS INT)
                  WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3' WHEN 2 THEN 'ape'
                  WHEN 3 THEN 'flac' ELSE 'm4a' END END AS ext
    FROM lineitem
  )
"""

_S98_SQL = _mk_rename_sql(_ALIB_SQL)


def _alib_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread first (round 13): lineitem is a single-split scan, so the
    # synthesized-catalog expressions AND the rename planner's map-side
    # aggregate partials (collect_set/min_by over every directory) ran on
    # 3 tasks; the round-robin exchange moves the raw columns once and
    # the regex-heavy planner work runs at full parallelism.
    li = spread(load_table(spark, sf_dir, "lineitem"))
    aid = F.col("l_orderkey") % 300
    fid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    ln = F.col("l_linenumber")
    ext = F.when(aid % 11 == 3, F.lit("flac")).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in ("flac", "mp3", "ape", "flac", "m4a")]),
            (fid % 5).cast("int") + 1,
        )
    )
    dirpath = F.concat(
        F.lit("/mus/lib"),
        (aid % 7).cast("string"),
        F.lit("/"),
        F.when(aid % 4 == 0, F.lit("VA comp ")).otherwise(F.lit("band ")),
        aid.cast("string"),
    )
    filename = F.concat(
        F.lit("orig_"),
        fid.cast("string"),
        F.when(fid % 17 == 0, F.lit("")).otherwise(F.concat(F.lit("."), ext)),
    )
    return li.select(
        dirpath.alias("__dirpath"),
        filename.alias("__filename"),
        F.concat(dirpath, F.lit("/"), filename).alias("__path"),
        F.when(aid % 4 == 0, F.lit("1")).otherwise(F.lit("0")).alias("compilation"),
        F.when(fid % 11 == 0, F.lit(""))
        .when(fid % 13 == 0, F.concat(F.lit("A"), (fid % 9).cast("string")))
        .when(aid % 9 == 0, (ln + 100).cast("string"))
        .otherwise(ln.cast("string"))
        .alias("track"),
        F.when(aid % 5 == 0, F.lit("1"))
        .when(aid % 5 == 1, (fid % 2 + 1).cast("string"))
        .otherwise(F.lit(""))
        .alias("discnumber"),
        F.when(fid % 7 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Art/ist: "), (fid % 50).cast("string")))
        .alias("artist"),
        F.when(aid % 11 == 3, F.lit("same"))
        .when(fid % 19 == 0, F.lit(""))
        .otherwise(
            F.concat(F.lit('Ti*tle "N" <'), (fid % 23).cast("string"), F.lit(">  sp ."))
        )
        .alias("title"),
        F.when(aid % 6 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("The\\\\Band "), aid.cast("string")))
        .alias("albumartist"),
        F.when(aid % 8 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Al:bum "), aid.cast("string")))
        .alias("album"),
        F.when(aid % 3 == 0, F.lit("2001-05-03"))
        .when(aid % 3 == 1, F.lit("circa 1987!"))
        .otherwise(F.lit("none"))
        .alias("year"),
        F.when(aid % 10 == 0, F.lit("24"))
        .when(aid % 10 == 5, F.when(fid % 2 == 0, F.lit("24")).otherwise(F.lit("32")))
        .otherwise(F.lit("16"))
        .alias("__bitspersample"),
        F.when((aid % 10 == 0) | (aid % 10 == 5), F.lit("96.0"))
        .otherwise(F.lit("44.1"))
        .alias("__frequency_num"),
    )


@q("s98_rename_plan", _S98_SQL)
def s98_rename_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full rename plan over a synthesized catalog exercising every
    branch: VA / cdN / albumartist dirnames, year extraction, quality
    suffixes incl. [Mixed Res], 2- vs 3-digit track padding, non-numeric
    tracks, extension-less files, sanitization, filename collisions
    (duplicate targets AND landing on a live file), and the
    noop/skip-empty/skip-collision/rename action split
    (98-rename-files-and-folders.py:285-660)."""
    return rename_plan(_alib_spark(spark, sf_dir), include_year=True)
