"""Step runner — `tm-cli list|describe|run` parity.

Reference: src/tagminder/app/tm_cli.py:130-241 discovers numbered scripts
by filename convention, uses the module docstring as the description, and
runs each as a subprocess. Here the registry is explicit (no filesystem
convention needed), descriptions come from the step functions' docstrings,
and "run" executes the step in-process on a shared SparkSession through
the diff-audit protocol — each step is one Spark job, not one OS process.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from tagminder_spark import pipeline as P
from tagminder_spark.operators.diff_audit import diff_audit
from tagminder_spark.operators.rename import rename_plan


@dataclass(frozen=True)
class StepSpec:
    number: str
    name: str
    fn: Callable[[DataFrame], DataFrame]
    cols: tuple[str, ...]
    needs: tuple[str, ...] = ()  # extra inputs beyond the alib frame
    #: "mutate" steps transform alib rows (diff-audit old vs new alib);
    #: "workspace" steps derive an auxiliary table (reference: the
    #: _REF_* analysis tables) — diff-audit runs against the previous
    #: workspace snapshot so re-analysis logs its delta.
    kind: str = "mutate"
    ws_key: tuple[str, ...] = ()  # workspace identity columns


#: Steps runnable with no external dimension; dimension-consuming steps
#: (01/03/06/07/10/11/18/19/22/23) are listed with their `needs` so a
#: caller provides the reference frames/dicts via functools.partial.
REGISTRY: dict[str, StepSpec] = {
    s.number: s
    for s in [
        StepSpec("02", "clean-text", P.step02_clean_text, P.STEP_COLUMNS["02"]),
        StepSpec("04", "merge-writers", P.step04_merge_writers, P.STEP_COLUMNS["04"]),
        StepSpec("05", "infer-composers", P.step05_infer_composers, P.STEP_COLUMNS["05"]),
        StepSpec("08", "subtitles", P.step08_subtitles, P.STEP_COLUMNS["08"]),
        StepSpec("09", "live-markers", P.step09_live_markers, P.STEP_COLUMNS["09"]),
        StepSpec("12", "compilations", P.step12_compilations, P.STEP_COLUMNS["12"]),
        StepSpec("13", "discnumber", P.step13_discnumber, P.STEP_COLUMNS["13"]),
        StepSpec("14", "releasetype", P.step14_releasetype, ("releasetype",)),
        StepSpec("16", "track-uuid", P.step16_track_uuid, P.STEP_COLUMNS["16"]),
        StepSpec("17", "dedupe-tags", P.step17_dedupe_tags, P.STEP_COLUMNS["17"]),
        StepSpec("20", "dates", P.step20_dates, P.STEP_COLUMNS["20"]),
        StepSpec("21", "titlecase", P.step21_titlecase, P.STEP_COLUMNS["21"]),
        StepSpec(
            "01", "null-unauthorised", P.step01_merge_and_retain,
            ("albumartist", "composer", "lyricist", "lyrics", "explicit"),
            needs=("keep",),
        ),
        StepSpec(
            "03", "title-features", P.step03_title_features,
            ("title", "subtitle", "artist", "live"), needs=("case_map",),
        ),
        StepSpec(
            "06", "contributors", P.step06_contributors,
            ("artist", "albumartist", "composer"), needs=("contributors",),
        ),
        StepSpec(
            "07", "vetted-mappings", P.step07_vetted_mappings,
            ("artist", "albumartist", "composer"), needs=("mapping",),
        ),
        StepSpec("10", "genres", P.step10_genres, ("genre", "style"), needs=("vetted",)),
        StepSpec(
            "11", "genre-enrichment", P.step11_genre_enrich,
            ("genre", "style"), needs=("norms",),
        ),
        StepSpec(
            "18", "mbids", P.step18_mbids, ("musicbrainz_artistid",),
            needs=("disambiguated",),
        ),
        StepSpec("19", "album-dr", P.step19_album_dr, ("album_dr",), needs=("dr_scores",)),
        StepSpec(
            "23", "retire-synthetic", P.step23_retire_synthetic,
            ("musicbrainz_artistid",), needs=("disambiguated",),
        ),
        StepSpec(
            "15", "contributor-similarity", P.step15_contributor_similarity,
            ("similarity",), kind="workspace", ws_key=("name_a", "name_b"),
        ),
        StepSpec(
            "22", "infer-works", P.step22_apply_works,
            ("work", "musicbrainz_workid"), needs=("works",),
        ),
        StepSpec(
            "98", "rename-plan", rename_plan,
            ("new_filename", "new_dirname", "new_path", "collision", "action"),
            kind="workspace", ws_key=("__path",),
        ),
    ]
}


def list_steps() -> list[tuple[str, str, str]]:
    """(number, name, one-line description) sorted by number —
    tm_cli.py's `list` output shape."""
    out = []
    for num in sorted(REGISTRY):
        s = REGISTRY[num]
        doc = (s.fn.__doc__ or "").strip().splitlines()
        out.append((num, s.name, doc[0] if doc else ""))
    return out


def describe_step(number: str) -> str:
    s = REGISTRY[number]
    return (s.fn.__doc__ or "").strip()


def run_named_step(
    number: str,
    alib: DataFrame,
    key: str = "__path",
    **deps,
) -> tuple[DataFrame, DataFrame]:
    """Run a step through diff-audit → (updated_rows, changelog_rows).

    Dimension-consuming steps take their extra inputs as keyword args
    matching the spec's `needs` names.
    """
    s = REGISTRY[number]
    missing = [n for n in s.needs if n not in deps]
    if missing:
        raise ValueError(f"step {number} needs inputs: {missing}")
    new = s.fn(alib, **{n: deps[n] for n in s.needs}) if s.needs else s.fn(alib)
    if s.kind == "workspace":
        return _workspace_diff(s, new, deps.get("previous"), f"{number}-{s.name}")
    cols = [c for c in s.cols if c in new.columns]
    return diff_audit(alib, new, key, cols, script=f"{number}-{s.name}")


def _workspace_diff(
    s: StepSpec, new_ws: DataFrame, previous: DataFrame | None, script: str
) -> tuple[DataFrame, DataFrame]:
    """Diff-audit a workspace refresh: changed rows via the join-based
    diff on the composite key, NEW rows via anti-join logged as
    NULL→value changelog entries. Returns (new_workspace, changelog)."""
    from pyspark.sql import functions as F

    wkey = F.concat_ws("␟", *[F.col(c) for c in s.ws_key])
    keyed_new = new_ws.withColumn("__wkey", wkey)
    if previous is None:
        previous = new_ws.limit(0)
    keyed_prev = previous.withColumn("__wkey", wkey)
    _, changed_cl = diff_audit(keyed_prev, keyed_new, "__wkey", list(s.cols), script)
    adds = keyed_new.join(keyed_prev.select("__wkey"), "__wkey", "left_anti")
    add_cl = None
    for c in s.cols:
        part = adds.select(
            F.col("__wkey").alias("alib_path"),
            F.lit(c).alias("alib_column"),
            F.lit(None).cast("string").alias("old_value"),
            F.col(c).cast("string").alias("new_value"),
            F.lit(script).alias("script"),
        )
        add_cl = part if add_cl is None else add_cl.unionByName(part)
    return new_ws, changed_cl.unionByName(add_cl)
