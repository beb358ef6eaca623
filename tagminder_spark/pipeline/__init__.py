"""The reference's numbered pipeline steps as Spark transforms.

Each step is a pure ``DataFrame → DataFrame`` function over an alib-shaped
frame (all-string tag columns keyed by ``__path``); ``run_step`` pairs any
of them with the generic diff-audit operator to produce the
updates+changelog outputs every mutating step must emit (SURVEY.md §2.10).
"""

from tagminder_spark.pipeline.steps_ext import (
    RELEASE_TYPE_MAPPING,
    parse_dr_scores,
    step03_title_features,
    step07_vetted_mappings,
    step14_releasetype,
    step19_album_dr,
)
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
    "RELEASE_TYPE_MAPPING",
    "STEP_COLUMNS",
    "parse_dr_scores",
    "run_step",
    "step02_clean_text",
    "step03_title_features",
    "step07_vetted_mappings",
    "step14_releasetype",
    "step19_album_dr",
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
