"""Lookup/dictionary pipeline steps (reference parity → SURVEY.md Appendix A).

Continues ``tagminder_spark.pipeline.steps`` with the steps that consume a
reference dimension (case maps, vetted mappings, DR scores) or encode a
large rule table:

- 03 title/artist features   03-normalize-title-artist-features.py:105-279
- 07 vetted mappings         07-apply-vetted-contributor-mappings.py:146-214
- 14 releasetype             14-normalize-releasetype.py:46-114, 232-335
- 19 album DR                19-populate-album-dr.py:61-204

Scale notes: dictionary dimensions are config-scale (the reference itself
loads them as Python dicts — 06:741-777), so they are embedded as
``create_map`` literals and every step below is **map-only / zero shuffle**
except step 14's null-assignment heuristic, which needs one per-directory
window (track counts). No Python UDFs anywhere — all rules stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from tagminder_spark.functions.core import (
    MV_DELIM,
    blank_to_null,
    is_blank,
    mv_join,
    mv_tokens,
)

_MV_RE = MV_DELIM.replace("\\", "\\\\")


def _map_literal(pairs: dict[str, str]) -> Column:
    """A small dict as a codegen-resident map literal (broadcast-dict
    pattern; the reference's equivalent is a driver-side Python dict).
    An empty dict becomes a NULL map<string,string> — `create_map()`
    alone types as map<void,void> and fails lookups."""
    if not pairs:
        return F.lit(None).cast("map<string,string>")
    items: list[Column] = []
    for k, v in pairs.items():
        items.append(F.lit(k))
        items.append(F.lit(v))
    return F.create_map(*items)


# ---------------------------------------------------------------------------
# 01: merges, involvedpeople fan-out, moves, retention gate
# ---------------------------------------------------------------------------

#: target ← sources merge rules (01-null-unauthorised-tags.py:414-455).
DEFAULT_MERGES: dict[str, tuple[str, ...]] = {
    "personnel": ("studiopersonnel", "main_personnel"),
    "artist": ("featured_artist", "studiopersonnel"),
    "composer": ("author", "songwriter"),
    "albumartist": ("album artist", "primary_artist", "musician"),
    "album_dr": ("album dynamic range", "dynamic range"),
    "catalog": ("catalog#", "mcn", "catalognumber"),
    "originalyear": ("origyear",),
    "version": ("albumversion", "release"),
    "releasetype": ("musicbrainz album type", "musicbrainz_albumtype"),
    "label": ("music publisher", "discogs_label"),
    "producer": ("co-producer", "additionalproducer"),
    "remixer": ("remixedby",),
    "engineer": (
        "recording engineer",
        "mixing engineer",
        "mastering engineer",
        "vocal engineer",
        "additional programming engineer",
    ),
    "review": ("description", "comment"),
}

#: involvedpeople role → target columns (01:181-184).
ROLE_FANOUT: dict[str, tuple[str, ...]] = {
    "mainartist": ("albumartist",),
    "composerlyricist": ("composer", "lyricist"),
}


def _fanout_people(involved: Column, role_key: str) -> Column:
    """People from ``Person, role, role`` entries whose normalized role
    list contains ``role_key`` (01:175-213), in entry order."""
    entries = mv_tokens(F.coalesce(involved, F.lit("")))
    matching = F.filter(
        entries,
        lambda e: F.size(F.split(e, ",")) >= 2,
    )
    matching = F.filter(
        matching,
        lambda e: F.exists(
            F.slice(F.split(e, ","), 2, F.size(F.split(e, ","))),
            lambda r: F.replace(F.lower(F.trim(r)), F.lit(" "), F.lit("")) == role_key,
        ),
    )
    people = F.transform(matching, lambda e: F.trim(F.element_at(F.split(e, ","), 1)))
    return F.filter(people, lambda p: p != "")


def step01_merge_and_retain(
    df: DataFrame,
    keep: tuple[str, ...] | None = None,
    merges: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Step 01 (01-null-unauthorised-tags.py:414-558): source→target tag
    merges with caseless segment dedup (sources nulled), involvedpeople
    role fan-out, unsyncedlyrics→lyrics move, itunesadvisory→explicit,
    then the retention gate NULLing every non-kept non-system column.
    Map-only: zero shuffle at any corpus size."""
    from tagminder_spark.pipeline.steps import _caseless_ordered_dedup

    out_cols: dict[str, Column] = {c: F.col(c) for c in df.columns}
    consumed: set[str] = set()

    for target, sources in (merges or DEFAULT_MERGES).items():
        present = [s for s in sources if s in df.columns]
        if not present:
            continue
        if target not in out_cols:
            out_cols[target] = F.lit(None).cast("string")
        # coalesce: concat() of arrays is NULL if ANY input is NULL
        arrs = [mv_tokens(F.coalesce(out_cols[target], F.lit("")))] + [
            mv_tokens(F.coalesce(F.col(s), F.lit(""))) for s in present
        ]
        out_cols[target] = mv_join(_caseless_ordered_dedup(F.concat(*arrs)))
        consumed.update(present)

    if "involvedpeople" in df.columns:
        for role_key, targets in ROLE_FANOUT.items():
            people = _fanout_people(F.col("involvedpeople"), role_key)
            for target in targets:
                base = out_cols.get(target, F.lit(None).cast("string"))
                out_cols[target] = mv_join(
                    _caseless_ordered_dedup(
                        F.concat(mv_tokens(F.coalesce(base, F.lit(""))), people)
                    )
                )

    if "unsyncedlyrics" in df.columns:
        lyr = out_cols.get("lyrics", F.lit(None).cast("string"))
        uns = F.col("unsyncedlyrics")
        out_cols["lyrics"] = F.when(
            is_blank(lyr) & ~is_blank(uns), F.trim(uns)
        ).otherwise(lyr)
        out_cols["unsyncedlyrics"] = F.when(
            is_blank(lyr) & ~is_blank(uns), F.lit(None).cast("string")
        ).otherwise(uns)

    if "itunesadvisory" in df.columns:
        adv = F.trim(F.col("itunesadvisory"))
        exp = out_cols.get("explicit", F.lit(None).cast("string"))
        out_cols["explicit"] = (
            F.when(adv == "1", F.lit("1"))
            .when(adv.isin("0", "2"), F.lit(None).cast("string"))
            .otherwise(exp)
        )

    if keep is not None:
        kept = set(keep)
        for c in list(out_cols):
            if not c.startswith("__") and c not in kept:
                out_cols[c] = F.lit(None).cast("string")
    else:
        for c in consumed:  # merged-away sources are always nulled
            out_cols[c] = F.lit(None).cast("string")

    # Two-phase select (see step03): HOF lambdas + output-shadows-input
    # aliasing mis-resolve, so compute under temp names, then rename.
    ordered = list(df.columns) + [c for c in out_cols if c not in df.columns]
    pre = df.select(*[out_cols[c].alias(f"__n_{i}") for i, c in enumerate(ordered)])
    return pre.select(*[F.col(f"__n_{i}").alias(c) for i, c in enumerate(ordered)])


# ---------------------------------------------------------------------------
# 03: title/artist feature extraction
# ---------------------------------------------------------------------------

_BRACKET = r"(?i)\s*[\(\[\{<]([^\)\]\}>]+)[\)\]\}>]\s*$"
_FEAT_SPLIT = r"(?i)\s+(?:feat\.?|featuring|with|w/)\s+"
_FEATURE_PREFIXES = ("with", "w/", "feat", "feat.", "featuring")
_SUBTITLE_PREFIXES = (
    "remix", "rmx", "remaster", "remastered",
    "demo", "outtake", "alt", "alternate", "alt.",
    "mix", "early mix", "instrumental", "bonus", "radio",
    "reprise", "unplugged", "acoustic", "electric", "akoesties",
)
_TRAILING_MATCHES = ("mix", "session", "demos", "remaster", "remastered",
                     "remix", "version")


def _append_subtitle(subtitle: Column, item: Column, live_guard: bool) -> Column:
    """Token-aware, case-insensitive append of ``item`` to the subtitle
    cell (separators: legacy ``\\\\`` and ``; ``), first-seen dedup."""
    toks = F.filter(
        F.transform(
            F.split(F.coalesce(subtitle, F.lit("")), _MV_RE + r"|\s*;\s*"),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    already = F.exists(toks, lambda t: F.lower(t) == F.lower(item))
    guarded = (
        F.coalesce(F.lower(subtitle).contains("live at"), F.lit(False))
        if live_guard
        else F.lit(False)
    )
    appended = F.array_join(F.array_append(toks, item), "; ")
    return F.when(already | guarded, subtitle).otherwise(appended)


def step03_title_features(
    df: DataFrame, case_map: dict[str, str] | None = None
) -> DataFrame:
    """Bracketed-suffix extraction on title → artist/subtitle/live, plus
    artist feature-prefix splitting with a canonical-case dictionary guard.

    Reference: 03-normalize-title-artist-features.py:105-161 (artist
    prefixes + case map) and :189-279 (suffix rules). The reference's
    per-row Python loop becomes one ``when`` chain over extracted pieces.
    """
    cm = _map_literal({k.lower(): v for k, v in (case_map or {}).items()})
    lart = F.lower(F.col("artist"))
    canonical = cm[lart]
    feat_main = F.trim(F.regexp_extract(F.col("artist"), _FEAT_SPLIT.join(["^(.*?)", "(.*)$"]), 1))
    feat_rest = F.trim(F.regexp_extract(F.col("artist"), _FEAT_SPLIT.join(["^(.*?)", "(.*)$"]), 2))
    artist1 = (
        F.when(canonical.isNotNull(), canonical)
        .when(
            (feat_main != "") & (feat_rest != ""),
            F.concat(feat_main, F.lit(MV_DELIM), feat_rest),
        )
        .otherwise(F.col("artist"))
    )

    content = F.trim(F.regexp_extract(F.col("title"), _BRACKET, 1))
    words = F.split(content, r"\s+")
    first_raw = F.lower(F.element_at(words, 1))
    word_norm = _map_literal(
        {"remaster": "remastered", "rmx": "remix", "alt": "alt. take"}
    )
    first = F.coalesce(word_norm[first_raw], first_raw)
    is_feature = first.isin(*_FEATURE_PREFIXES)
    rest = F.when(
        is_feature, F.array_join(F.slice(words, 2, F.size(words)), " ")
    ).otherwise(content)
    rest_clean = F.trim(F.regexp_replace(rest, r"^[\[\]\(\)\{\}<>]+|[\[\]\(\)\{\}<>]+$", ""))
    rest_wrapped = F.concat(F.lit("["), rest_clean, F.lit("]"))
    stripped_title = blank_to_null(F.trim(F.regexp_replace(F.col("title"), _BRACKET, "")))
    last_word = F.regexp_replace(
        F.lower(F.element_at(words, -1)), r"^[^a-z0-9]+|[^a-z0-9]+$", ""
    )
    has_bracket = content != ""
    feature_hit = has_bracket & is_feature & (rest_clean != "")
    live_hit = has_bracket & (first == "live") & (rest_clean != "")
    subtitle_hit = has_bracket & (
        first.isin(*_SUBTITLE_PREFIXES) | last_word.isin(*_TRAILING_MATCHES)
    )

    artist_has = F.coalesce(artist1.contains(rest_clean), F.lit(False))
    new_artist = F.when(
        feature_hit & ~artist_has,
        F.when(is_blank(artist1), rest_clean).otherwise(
            F.concat(artist1, F.lit(MV_DELIM), rest_clean)
        ),
    ).otherwise(artist1)
    new_title = F.when(
        feature_hit | live_hit | subtitle_hit, stripped_title
    ).otherwise(F.col("title"))
    new_subtitle = (
        F.when(live_hit, _append_subtitle(F.col("subtitle"), rest_wrapped, True))
        .when(subtitle_hit, _append_subtitle(F.col("subtitle"), rest_wrapped, False))
        .otherwise(F.col("subtitle"))
    )
    new_live = F.when(live_hit, F.lit("1")).otherwise(F.col("live"))
    # Two-phase select: compute into temp names first, then rename. A
    # single select aliasing outputs to the same names as the inputs
    # ("title" := f(title)) mis-resolves references *inside HOF lambdas*
    # to the new columns (analyzer resolves lambdas after the projection
    # split), silently breaking the subtitle dedup. Chained withColumn has
    # the same self-reference hazard, so: no shadowing, ever.
    tmp = {
        "artist": new_artist,
        "title": new_title,
        "subtitle": new_subtitle,
        "live": new_live,
    }
    pre = df.select("*", *[e.alias(f"__new_{c}") for c, e in tmp.items()])
    return pre.select(
        *[
            (F.col(f"__new_{c}") if c in tmp else F.col(c)).alias(c)
            for c in df.columns
        ]
    )


# ---------------------------------------------------------------------------
# 07: vetted contributor mappings
# ---------------------------------------------------------------------------

def step07_vetted_mappings(
    df: DataFrame,
    mapping: dict[str, str],
    cols: tuple[str, ...] = ("artist", "albumartist", "composer"),
) -> DataFrame:
    """current→replacement contributor rewrite, whole-field first, then
    item-level inside multi-value cells with first-seen dedup.

    Reference: 07-apply-vetted-contributor-mappings.py:146-214
    (``transform_contributor_entry_all``). Zero shuffle: the vetted table
    is config-scale, embedded as a map literal over token ``transform``.
    """
    m = _map_literal({k.lower(): v for k, v in mapping.items()})
    out = df
    for c in cols:
        if c not in df.columns:
            continue
        cell = F.trim(F.col(c))
        whole = F.coalesce(m[F.lower(cell)], cell)
        toks = mv_tokens(whole)
        toks2 = F.transform(toks, lambda t: F.coalesce(m[F.lower(t)], t))
        rebuilt = mv_join(F.array_distinct(toks2))
        out = out.withColumn(
            c,
            F.when(F.col(c).isNull(), F.col(c))
            .when(whole.contains(MV_DELIM), rebuilt)
            .otherwise(blank_to_null(whole)),
        )
    return out


# ---------------------------------------------------------------------------
# 14: releasetype normalization
# ---------------------------------------------------------------------------

#: lowercase joined-cell → canonical (verbatim rule table,
#: 14-normalize-releasetype.py:46-111).
RELEASE_TYPE_MAPPING: dict[str, str] = {
    "album\\\\audiobook": "Studio Album\\\\Audiobook",
    "album\\\\audio drama": "Studio Album",
    "album\\\\bootleg": "Demos, Soundboards & Bootlegs",
    "album\\\\bootleg\\\\live": "Demos, Soundboards & Bootlegs\\\\Live Album",
    "album\\\\compilation\\\\dj-mix": "Remix",
    "album\\\\compilation": "Greatest Hits & Anthologies",
    "album\\\\compilation\\\\live": "Greatest Hits & Anthologies\\\\Live Album",
    "album\\\\compilation\\\\soundtrack": "Soundtrack",
    "album\\\\demo": "Demos, Soundboards & Bootlegs",
    "album\\\\dj-mix": "Remix\\\\DJ-Mix",
    "album\\\\interview": "Studio Album\\\\Interview",
    "album\\\\live": "Live Album",
    "album\\\\mixtape/street": "Mixtape/Street",
    "album\\\\remix": "Remix",
    "album\\\\live\\\\soundtrack": "Soundtrack\\\\Live Album",
    "album\\\\soundtrack": "Soundtrack\\\\Studio Album",
    "album": "Studio Album",
    "anthology": "Greatest Hits & Anthologies",
    "audio drama\\\\broadcast": "Live Album\\\\Broadcast",
    "bootleg\\\\soundboard": "Demos, Soundboards & Bootlegs",
    "box set": "Box Set",
    "box set\\\\live album": "Box Set\\\\Live Album",
    "broadcast\\\\live": "Live Album\\\\Broadcast",
    "compilation\\\\album": "Greatest Hits & Anthologies",
    "compilation\\\\demo\\\\ep": "Demos, Soundboards & Bootlegs\\\\Extended Play",
    "compilation\\\\ep": "Greatest Hits & Anthologies\\\\Extended Play",
    "compilation\\\\live": "Greatest Hits & Anthologies\\\\Live Album",
    "compilation\\\\live album": "Greatest Hits & Anthologies\\\\Live Album",
    "compilation": "Greatest Hits & Anthologies",
    "compilation\\\\single": "Single\\\\Compilation",
    "composite reissue": "Studio Album",
    "demo": "Demos, Soundboards & Bootlegs",
    "demo\\\\ep": "Demos, Soundboards & Bootlegs\\\\Extended Play",
    "ep": "Extended Play",
    "ep\\\\live": "Extended Play\\\\Live Album",
    "ep\\\\mixtape/street": "Mixtape/Street\\\\Extended Play",
    "ep\\\\remix": "Remix\\\\Extended Play",
    "ep\\\\soundtrack": "Soundtrack\\\\Extended Play",
    "extended play": "Extended Play",
    "extended play\\\\remix": "Remix\\\\Extended Play",
    "interview\\\\single": "Single\\\\Interview",
    "live album": "Live Album",
    "live\\\\album": "Live Album",
    "live\\\\ep": "Extended Play\\\\Live Album",
    "live": "Live Album",
    "live\\\\single": "Single\\\\Live Album",
    "mixtape/street": "Mixtape/Street",
    "other": "Studio Album",
    "remix": "Remix",
    "remix\\\\single": "Remix\\\\Single",
    "single\\\\live": "Single\\\\Live Album",
    "single": "Single",
    "single\\\\soundtrack": "Single\\\\Soundtrack",
    "soundtrack\\\\album": "Soundtrack\\\\Studio Album",
    "soundtrack": "Soundtrack",
    "studio album\\\\compilation": "Greatest Hits & Anthologies",
    "studio album\\\\compilation\\\\remix": "Remix",
    "studio album\\\\demo": "Demos, Soundboards & Bootlegs",
    "studio album\\\\remix": "Remix",
    "studio album": "Studio Album",
    "various artists": "Various Artists Compilation",
}


def step14_releasetype(df: DataFrame) -> DataFrame:
    """Two-stage releasetype normalization: (1) whole-cell mapping of the
    lowercased multi-value key; (2) null-assignment heuristics by
    per-directory track count (≤3 Single, 4-6 EP, excluding
    classical/jazz), ``/OST`` path → Soundtrack, remainder Studio Album;
    (3) truthy isgreatesthits/issoundtrack flags force their component in.

    Reference: 14-normalize-releasetype.py:46-114 (mapping), 232-335
    (null assignment), 336-470 (flag logic). One window shuffle
    (per-directory count); everything else map-side.
    """
    # stage 1: mapping (keys/values already carry the two-literal-backslash
    # delimiter — exactly the on-disk cell encoding)
    m = _map_literal(RELEASE_TYPE_MAPPING)
    key = F.lower(mv_join(mv_tokens(F.col("releasetype"))))
    mapped = blank_to_null(F.coalesce(m[key], F.col("releasetype")))

    # stage 2: null assignment
    genre = F.coalesce(F.col("genre"), F.lit(""))
    classical_jazz = genre.rlike("(?i)classical|jazz")
    w = W.partitionBy("__dirpath")
    null_cnt = F.sum(
        (mapped.isNull() & ~classical_jazz).cast("long")
    ).over(w)
    assigned = (
        F.when(mapped.isNotNull(), mapped)
        .when(~classical_jazz & (null_cnt <= 3), F.lit("Single"))
        .when(~classical_jazz & (null_cnt <= 6), F.lit("Extended Play"))
        .when(F.col("__dirpath").contains("/OST"), F.lit("Soundtrack"))
        .otherwise(F.lit("Studio Album"))
    )

    # stage 3: flag enforcement
    def truthy(c: str) -> Column:
        if c not in df.columns:
            return F.lit(False)
        v = F.lower(F.trim(F.col(c)))
        return v.isin("1", "true")

    def ensure(cell: Column, component: str, flag: Column) -> Column:
        toks = mv_tokens(cell)
        has = F.exists(toks, lambda t: F.lower(t) == component.lower())
        return F.when(flag & ~has, mv_join(F.array_append(toks, F.lit(component)))).otherwise(cell)

    out = ensure(assigned, "Greatest Hits & Anthologies", truthy("isgreatesthits"))
    out = ensure(out, "Soundtrack", truthy("issoundtrack"))
    return df.withColumn("releasetype", out)


# ---------------------------------------------------------------------------
# 19: album DR population
# ---------------------------------------------------------------------------

def parse_dr_scores(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse the pipe-delimited ``<dirpath>|DR<n>`` feed into a
    (``__dirpath``, ``dr``) dimension, dropping malformed rows — the
    validation ladder of 19-populate-album-dr.py:61-100 as filters."""
    line = F.trim(F.col(value_col))
    dirpath = F.trim(F.substring_index(line, "|", 1))
    score_tok = F.trim(F.expr(f"substring({value_col}, instr({value_col}, '|') + 1)"))
    score = F.trim(F.regexp_extract(F.upper(score_tok), r"^DR(\d+)$", 1))
    return (
        raw.select(line.alias("line"), dirpath.alias("__dirpath"), score.alias("dr"))
        .filter(
            (F.col("line") != "")
            & ~F.col("line").startswith("#")
            & F.col("line").contains("|")
            & (F.col("__dirpath") != "")
            & (F.col("dr") != "")
        )
        .select("__dirpath", "dr")
    )


def step19_album_dr(df: DataFrame, dr_scores: DataFrame) -> DataFrame:
    """Populate ``album_dr`` from the DR dimension keyed by directory.

    Reference: 19-populate-album-dr.py:103-204. The per-dirpath chunked
    ``IN`` fetch becomes one broadcast left join (the DR feed is one row
    per album — always small relative to alib).
    """
    dim = F.broadcast(dr_scores.withColumnRenamed("dr", "__dr_new"))
    return (
        df.join(dim, "__dirpath", "left")
        .withColumn(
            "album_dr",
            F.when(
                F.col("__dr_new").isNotNull()
                & (is_blank(F.col("album_dr")) | (F.col("album_dr") != F.col("__dr_new"))),
                F.col("__dr_new"),
            ).otherwise(F.col("album_dr")),
        )
        .drop("__dr_new")
    )
