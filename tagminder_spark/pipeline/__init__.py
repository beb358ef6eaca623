"""The reference's numbered pipeline steps as Spark transforms.

Each step is a pure ``DataFrame → DataFrame`` function over an alib-shaped
frame (all-string tag columns keyed by ``__path``); ``run_step`` pairs any
of them with the generic diff-audit operator to produce the
updates+changelog outputs every mutating step must emit (SURVEY.md §2.10).
"""

from tagminder_spark.pipeline.steps import (
    STEP_COLUMNS,
    run_step,
    step02_clean_text,
    step04_merge_writers,
    step05_infer_composers,
    step08_subtitles,
    step09_live_markers,
    step12_compilations,
    step13_discnumber,
    step16_track_uuid,
    step17_dedupe_tags,
    step20_dates,
    step21_titlecase,
)

__all__ = [
    "STEP_COLUMNS",
    "run_step",
    "step02_clean_text",
    "step04_merge_writers",
    "step05_infer_composers",
    "step08_subtitles",
    "step09_live_markers",
    "step12_compilations",
    "step13_discnumber",
    "step16_track_uuid",
    "step17_dedupe_tags",
    "step20_dates",
    "step21_titlecase",
]
