"""The reference's numbered pipeline steps as Spark transforms.

Each step is a pure ``DataFrame → DataFrame`` function over an alib-shaped
frame (all-string tag columns keyed by ``__path``); ``run_step`` pairs any
of them with the generic diff-audit operator to produce the
updates+changelog outputs every mutating step must emit (SURVEY.md §2.10).
"""

from tagminder_spark.pipeline.steps_contrib import (
    HARD_CODED_REPLACEMENTS,
    normalize_contributor_cell,
    parse_genre_norms,
    step06_contributors,
    step10_genres,
    step11_genre_enrich,
)
from tagminder_spark.pipeline.steps_ext import (
    DEFAULT_MERGES,
    RELEASE_TYPE_MAPPING,
    parse_dr_scores,
    step01_merge_and_retain,
    step03_title_features,
    step07_vetted_mappings,
    step14_releasetype,
    step19_album_dr,
)
from tagminder_spark.pipeline.steps_works import (
    ROLE_SCORE_RULES,
    step15_contributor_similarity,
    step22_apply_works,
    step22_work_inference,
)
from tagminder_spark.pipeline.steps_mbid import (
    SYNTHETIC_NAMESPACE,
    step18_mbids,
    step23_retire_synthetic,
    synthetic_mbid,
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
    "DEFAULT_MERGES",
    "HARD_CODED_REPLACEMENTS",
    "RELEASE_TYPE_MAPPING",
    "STEP_COLUMNS",
    "SYNTHETIC_NAMESPACE",
    "normalize_contributor_cell",
    "parse_dr_scores",
    "parse_genre_norms",
    "run_step",
    "step01_merge_and_retain",
    "step02_clean_text",
    "step03_title_features",
    "step06_contributors",
    "step07_vetted_mappings",
    "step10_genres",
    "step11_genre_enrich",
    "step14_releasetype",
    "step15_contributor_similarity",
    "step18_mbids",
    "step19_album_dr",
    "step22_apply_works",
    "step22_work_inference",
    "step23_retire_synthetic",
    "ROLE_SCORE_RULES",
    "synthetic_mbid",
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
