"""File/folder rename planner + sink (SURVEY §2.1 S-rename).

Reference: scripts/export/98-rename-files-and-folders.py — renames audio
files from tag metadata and their parent directories from album
metadata, dry-run by default (:66), with DB/changelog path rewrites to
preserve rollback connectivity (:173-285).

The Spark shape: a **pure plan DataFrame** — every row of the catalog
gets `(new_filename, new_dirname, new_path, collision, action)` derived
entirely from expressions, ONE per-directory aggregate (album facts +
track-pad width + live-filename set) rejoined to the rows, and one
duplicate-target count window. Nothing touches a filesystem; the actual
rename is an injected callable over the plan (`apply_renames`, same
pattern as sources/export.py `export_tags`), and the DB side
(`update_paths_after_rename`) is two joins.

At 100 TB the plan is map-heavy with exactly two `__dirpath`-keyed
exchanges: the facts aggregate and its rejoin (broadcast when the dir
count allows; the collision window reuses the join's partitioning via
the clustering-subset rule, costing a local sort only). Groups are
bounded — a directory holds tens of files, never millions. No
driver-side loops; the reference's per-row Python (`process_files`
:478-546) becomes one declarative pass.

Semantics ported (reference file:line cited per function):
- `extract_year` :285-303 — first ``(19|20)\\d{2}`` word in the date.
- `zero_pad_track` :305-326 — >=2-digit pad, 3 when the directory's max
  track >= 100; non-numeric tracks pass through unchanged.
- `sanitize_component` :329-364 — unsafe-char replacement, space/dot
  strip, whitespace collapse.
- `build filename` :366-422 — ``{disc}-{track} - [{artist} - ]{title}.ext``
  (artist only for compilation='1'), 255-char truncation preserving the
  extension (:117-143).
- `dirname` :548-660 — VA → ``VA - [year ]album``; single consistent
  discnumber → ``cd{n}``; else ``albumartist - [year ]album``; quality
  suffix ``[{bits}{freq} kHz]`` or ``[Mixed Res]``.
- collision/noop actions mirror rename_file :424-476 (target exists /
  unchanged-name short-circuits), lifted to plan level.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame, Row, Window as W
from pyspark.sql import functions as F

from tagminder_spark.functions.core import is_blank

MAX_FILENAME_LENGTH = 255
MAX_PATH_LENGTH = 4096

#: translate() source/replacement pair: / \ : | " map to - - - - ',
#: then * ? < > are deleted (98-rename...py:329-364 replacement table).
_SAN_SRC = '/\\:|"*?<>'
_SAN_DST = "----'"


def extract_year(c: Column) -> Column:
    """First 4-digit 19xx/20xx year in the string ('' if none), :285-303."""
    return F.regexp_extract(c, r"\b(19|20)\d{2}\b", 0)


def sanitize_component(c: Column) -> Column:
    """Filename-safe component (:329-364): replace/drop unsafe chars,
    strip outer spaces then outer dots, collapse internal whitespace."""
    out = F.translate(c, _SAN_SRC, _SAN_DST)
    out = F.trim(out)
    out = F.regexp_replace(out, r"^\.+|\.+$", "")
    return F.regexp_replace(out, r"\s+", " ")


def zero_pad_track(track: Column, max_track: Column) -> Column:
    """Zero-pad numeric tracks to the directory's width (:305-326):
    3 digits when max_track >= 100, else always 2; non-numeric
    unchanged. format_string matches Python's %0Nd (no truncation)."""
    n = F.trim(track).try_cast("int")
    return (
        F.when(is_blank(track), track)
        .when(n.isNull(), track)
        .when(max_track >= 100, F.format_string("%03d", n))
        .otherwise(F.format_string("%02d", n))
    )


def _truncate_filename(name: Column) -> Column:
    """255-char truncation preserving the extension when the stem keeps
    >10 chars (:117-143)."""
    ext = F.regexp_extract(name, r"\.([^.]*)$", 1)
    has_ext = name.contains(".")
    stem_budget = F.lit(MAX_FILENAME_LENGTH) - F.length(ext) - 1
    stem = F.expr(
        f"substring(regexp_replace(__new_filename_raw, '\\\\.[^.]*$', ''), 1, "
        f"{MAX_FILENAME_LENGTH} - length(regexp_extract(__new_filename_raw, "
        f"'\\\\.([^.]*)$', 1)) - 1)"
    )
    return (
        F.when(F.length(name) <= MAX_FILENAME_LENGTH, name)
        .when(
            has_ext & (stem_budget > 10),
            F.concat(stem, F.lit("."), ext),
        )
        .otherwise(F.substring(name, 1, MAX_FILENAME_LENGTH))
    )


def _first_nonblank(value: Column, order: Column) -> Column:
    """Aggregate: value of the first (by `order`) row where `value` is
    nonblank — min_by skips rows whose ordering key is NULL, so blanking
    the key on blank values reproduces the reference's 'first file that
    has it' scan (:580-592)."""
    return F.min_by(value, F.when(~is_blank(value), order))


def _freq_fmt(bits: Column, freq: Column) -> Column:
    """`{int(bits)}{freq}` with the frequency guaranteed one decimal
    (:644-657): 24/96.0 → '2496.0'."""
    fs = freq.cast("string")
    fs = F.when(fs.contains("."), fs).otherwise(F.concat(fs, F.lit(".0")))
    return F.concat(bits.cast("int").cast("string"), fs)


def rename_plan(alib: DataFrame, include_year: bool = False) -> DataFrame:
    """The planner: one row per catalog row with the proposed rename.

    Expects columns: __path, __dirpath, __filename, compilation,
    discnumber, track, artist, title, albumartist, album, year,
    __bitspersample, __frequency_num (missing quality/year columns may
    be supplied as NULL literals by the caller).

    Output: __path, old_filename, old_dirpath, new_filename,
    new_dirname, new_dirpath, new_path, file_changed, dir_changed,
    collision, action ∈ {rename, noop, skip-empty, skip-collision}.
    """
    # ---- per-directory album facts → new dirname (:548-660) ----
    # ONE aggregate carries everything per-directory state the plan
    # needs: the album facts, the track-pad width (max_track — round 3
    # computed it as a separate window, a redundant exchange), and the
    # live-filename set (collision target detection — round 3 used a
    # per-directory self-join, another exchange).  Directory groups are
    # bounded (tens of files), so collect_set stays small.
    hi = (
        (F.coalesce(F.col("__bitspersample").try_cast("double"), F.lit(0.0)) > 16)
        | (F.coalesce(F.col("__frequency_num").try_cast("double"), F.lit(0.0)) > 44.1)
    )
    dir_facts = alib.groupBy("__dirpath").agg(
        F.max(F.trim(F.col("track")).try_cast("int")).alias("__max_track"),
        F.collect_set(F.col("__filename")).alias("__dir_files"),
        F.max((F.col("compilation") == "1").cast("int")).alias("is_comp"),
        F.count_distinct(
            F.when(~is_blank(F.col("discnumber")), F.trim(F.col("discnumber")))
        ).alias("n_disc"),
        F.min(
            F.when(~is_blank(F.col("discnumber")), F.trim(F.col("discnumber")))
        ).alias("the_disc"),
        _first_nonblank(
            F.replace(F.col("albumartist"), F.lit("\\\\"), F.lit("")), F.col("__path")
        ).alias("aa_first"),
        _first_nonblank(F.col("album"), F.col("__path")).alias("album_first"),
        _first_nonblank(F.col("year"), F.col("__path")).alias("year_first"),
        F.max(hi.cast("int")).alias("needs_quality"),
        F.count_distinct(
            F.when(
                hi,
                F.concat_ws(
                    "~",
                    F.col("__bitspersample").try_cast("double").cast("string"),
                    F.col("__frequency_num").try_cast("double").cast("string"),
                ),
            )
        ).alias("n_qual"),
        F.min_by(
            F.col("__bitspersample").try_cast("double"), F.when(hi, F.col("__path"))
        ).alias("hi_bits"),
        F.min_by(
            F.col("__frequency_num").try_cast("double"), F.when(hi, F.col("__path"))
        ).alias("hi_freq"),
    )

    year_c = (
        F.when(~is_blank(F.col("year_first")), extract_year(F.col("year_first")))
        if include_year
        else F.lit("")
    )
    va_name = F.concat_ws(
        " - ",
        F.lit("VA"),
        F.when(~is_blank(year_c), sanitize_component(year_c)),
        F.when(
            ~is_blank(F.col("album_first")), sanitize_component(F.col("album_first"))
        ),
    )
    aa_name = F.concat_ws(
        " - ",
        F.when(~is_blank(F.col("aa_first")), sanitize_component(F.col("aa_first"))),
        F.when(~is_blank(year_c), sanitize_component(year_c)),
        F.when(
            ~is_blank(F.col("album_first")), sanitize_component(F.col("album_first"))
        ),
    )
    base_dirname = (
        F.when(F.col("is_comp") == 1, va_name)
        .when(F.col("n_disc") == 1, F.concat(F.lit("cd"), F.col("the_disc")))
        .otherwise(aa_name)
    )
    suffix = F.when(
        (F.col("needs_quality") == 1) & ~is_blank(base_dirname),
        F.when(F.col("n_qual") > 1, F.lit(" [Mixed Res]")).otherwise(
            F.when(
                (F.coalesce(F.col("hi_bits"), F.lit(0.0)) != 0)
                & (F.coalesce(F.col("hi_freq"), F.lit(0.0)) != 0),
                F.concat(
                    F.lit(" ["),
                    _freq_fmt(F.col("hi_bits"), F.col("hi_freq")),
                    F.lit(" kHz]"),
                ),
            ).otherwise(F.lit(""))
        ),
    ).otherwise(F.lit(""))
    dir_facts = dir_facts.select(
        "__dirpath",
        "__max_track",
        "__dir_files",
        F.concat(base_dirname, suffix).alias("new_dirname"),
    )

    # One equi-join on __dirpath distributes the directory facts to the
    # rows; every per-row expression below (filename build, collision
    # checks) then runs inside this partitioning — the plan has exactly
    # two __dirpath-keyed exchanges (the aggregate and this join).
    joined = alib.join(dir_facts, "__dirpath")

    ext = F.regexp_extract(F.col("__filename"), r"\.([^.]*)$", 1)
    track_p = sanitize_component(
        zero_pad_track(F.col("track"), F.col("__max_track"))
    )
    artist_s = sanitize_component(F.col("artist"))
    title_s = sanitize_component(F.col("title"))

    disc_part = F.when(
        ~is_blank(F.col("discnumber")), F.concat(F.trim(F.col("discnumber")), F.lit("-"))
    ).otherwise(F.lit(""))
    track_part = F.when(
        ~is_blank(track_p), F.concat(F.trim(track_p), F.lit(" - "))
    ).otherwise(F.lit(""))
    artist_part = F.when(
        (F.col("compilation") == "1") & ~is_blank(artist_s),
        F.concat(artist_s, F.lit(" - ")),
    ).otherwise(F.lit(""))
    base = F.trim(
        F.concat(disc_part, track_part, artist_part, F.coalesce(title_s, F.lit("")))
    )
    raw_name = F.when(is_blank(base), F.lit("")).otherwise(
        F.when(base.endswith(F.concat(F.lit("."), ext)), base).otherwise(
            F.concat(base, F.lit("."), ext)
        )
    )
    planned = joined.withColumn("__new_filename_raw", raw_name).withColumn(
        "new_filename", _truncate_filename(F.col("__new_filename_raw"))
    )

    old_dirname = F.regexp_extract(F.col("__dirpath"), r"[^/]*$", 0)
    parent = F.regexp_replace(F.col("__dirpath"), r"/[^/]*$", "")
    new_dirpath = F.when(
        is_blank(F.col("new_dirname")) | (F.col("new_dirname") == old_dirname),
        F.col("__dirpath"),
    ).otherwise(F.concat(parent, F.lit("/"), F.col("new_dirname")))
    eff_filename = F.when(
        is_blank(F.col("new_filename")), F.col("__filename")
    ).otherwise(F.col("new_filename"))

    # ---- collision detection (rename_file :449-452 target-exists check,
    # lifted to plan level) ----
    # (b) a row's new filename equals a DIFFERENT row's current filename
    #     in the same directory (the rename would land on a live file) —
    #     filenames are unique within a directory (they are path
    #     components), so this is membership in the per-dir filename set
    #     carried by the facts aggregate, excluding the row's own name.
    #     Computed HERE, map-side, so the per-dir array is dropped
    #     BEFORE the collision window's exchange — carrying it per row
    #     through the shuffle would move gigabytes at sf0.1.
    nf_pre = F.when(
        is_blank(F.col("new_filename")), F.col("__filename")
    ).otherwise(F.col("new_filename"))
    planned = planned.select(
        "__path",
        F.col("__filename").alias("old_filename"),
        F.col("__dirpath").alias("old_dirpath"),
        "new_filename",
        "new_dirname",
        new_dirpath.alias("new_dirpath"),
        F.concat(new_dirpath, F.lit("/"), eff_filename).alias("new_path"),
        (
            F.array_contains(F.col("__dir_files"), nf_pre)
            & (nf_pre != F.col("__filename"))
        ).alias("_live_hit"),
    )

    # (a) two rows in one directory map to the same new filename — a
    #     count window over (old_dirpath, nf); hash partitioning on
    #     __dirpath from the facts join satisfies the window's clustering
    #     requirement (subset rule), so this adds a local sort, not an
    #     exchange.
    nf = F.when(is_blank(F.col("new_filename")), F.col("old_filename")).otherwise(
        F.col("new_filename")
    )
    planned = planned.withColumn(
        "_nf_dupes", F.count(F.lit(1)).over(W.partitionBy("old_dirpath", nf))
    )
    live_hit = F.col("_live_hit")

    file_changed = F.col("new_filename") != F.col("old_filename")
    dir_changed = F.col("new_dirpath") != F.col("old_dirpath")
    collision = (F.col("_nf_dupes") > 1) | live_hit
    action = (
        F.when(is_blank(F.col("new_filename")), F.lit("skip-empty"))
        .when(~file_changed & ~dir_changed, F.lit("noop"))
        .when(collision & file_changed, F.lit("skip-collision"))
        .otherwise(F.lit("rename"))
    )
    return (
        planned.withColumn("file_changed", file_changed.cast("int"))
        .withColumn("dir_changed", dir_changed.cast("int"))
        .withColumn("collision", (collision & file_changed).cast("int"))
        .withColumn("action", action)
        .drop("_nf_dupes", "_live_hit")
    )


def _default_renamer(rows: Iterator[Row]) -> None:
    raise NotImplementedError(
        "filesystem rename needs the real files; inject renamer_fn "
        "(dry-run — the plan DataFrame itself — is the default mode, "
        "98-rename-files-and-folders.py:66)"
    )


def apply_renames(
    plan: DataFrame,
    renamer_fn: Callable[[Iterator[Row]], None] | None = None,
) -> None:
    """Execute a rename plan: one task per directory (so a directory's
    file renames and its own rename are sequenced by one worker, like
    the reference's per-dir loop :478-546), rows in __path order."""
    plan.filter(F.col("action") == "rename").repartition(
        F.col("old_dirpath")
    ).sortWithinPartitions("old_dirpath", "__path").foreachPartition(
        renamer_fn or _default_renamer
    )


def update_paths_after_rename(
    alib: DataFrame,
    changelog: DataFrame,
    plan: DataFrame,
    script: str = "98-rename-files-and-folders",
    timestamp: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Post-rename DB maintenance (:173-285): rewrite alib system path
    columns, repoint historical changelog rows at the new paths, and
    append explicit rename changelog entries (rollback connectivity).

    Returns (alib', changelog'). Broadcast is NOT used: the mapping is
    same-order-of-magnitude as alib; both joins are equi-joins on the
    path key.
    """
    applied = plan.filter(F.col("action") == "rename").select(
        F.col("__path").alias("map_old"),
        "new_path",
        "new_dirpath",
        F.regexp_extract(F.col("new_dirpath"), r"[^/]*$", 0).alias("new_dirname_c"),
        F.regexp_extract(F.col("new_path"), r"[^/]*$", 0).alias("new_filename_c"),
    )
    applied = applied.withColumn(
        "new_filename_no_ext",
        F.regexp_replace(F.col("new_filename_c"), r"\.[^.]*$", ""),
    )

    alib2 = (
        alib.join(applied, alib["__path"] == applied["map_old"], "left")
        .withColumn("__path_new", F.coalesce(F.col("new_path"), F.col("__path")))
        .withColumn("__dirpath", F.coalesce(F.col("new_dirpath"), F.col("__dirpath")))
        .withColumn(
            "__dirname",
            F.coalesce(
                F.col("new_dirname_c"),
                F.regexp_extract(F.col("__dirpath"), r"[^/]*$", 0),
            ),
        )
        .withColumn(
            "__filename", F.coalesce(F.col("new_filename_c"), F.col("__filename"))
        )
        .drop(
            "map_old", "new_path", "new_dirpath", "new_dirname_c", "new_filename_c",
            "new_filename_no_ext", "__path",
        )
        .withColumnRenamed("__path_new", "__path")
    )

    mapping = applied.select("map_old", "new_path")
    changelog2 = (
        changelog.join(mapping, changelog["alib_path"] == mapping["map_old"], "left")
        .withColumn("alib_path", F.coalesce(F.col("new_path"), F.col("alib_path")))
        .drop("map_old", "new_path")
    )

    plan_changed = plan.filter(F.col("action") == "rename")
    entries = []
    for col, old_c, new_c in (
        ("__path", F.col("__path"), F.col("new_path")),
        ("__dirpath", F.col("old_dirpath"), F.col("new_dirpath")),
        (
            "__filename",
            F.col("old_filename"),
            F.regexp_extract(F.col("new_path"), r"[^/]*$", 0),
        ),
    ):
        entries.append(
            plan_changed.filter(old_c != new_c).select(
                F.col("new_path").alias("alib_path"),
                F.lit(col).alias("alib_column"),
                old_c.alias("old_value"),
                new_c.alias("new_value"),
                F.lit(script).alias("script"),
            )
        )
    new_rows = entries[0]
    for e in entries[1:]:
        new_rows = new_rows.unionByName(e)
    cl_cols = changelog2.columns
    new_rows = new_rows.select(
        *[
            (F.col(c) if c in new_rows.columns else F.lit(timestamp).alias(c))
            for c in cl_cols
        ]
    )
    return alib2, changelog2.unionByName(new_rows)
