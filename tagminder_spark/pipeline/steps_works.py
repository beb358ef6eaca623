"""Scoring / entity-resolution steps (reference parity → SURVEY.md App. A).

- 22 work inference            22-infer-works-in-library.py:846-1140, 394-401
- 15 contributor similarity    15-contributor-similarity-analysis.py:120-330

Scale notes: step 22 is candidate generation via three equi-joins
(title-norm, workid, alias-token) against the works dimension, one
aggregation per (track, work) pair, a role-pivot corroboration join, and
one per-track ranking window — every join key is a computed equi-key, so
AQE/broadcast handles the dimension side and the only large shuffles are
keyed by track. Step 15 replaces the reference's single-node TF-IDF
string_grouper with a character-bigram Jaccard self-join over the
*distinct-name pool* (tiny relative to the track table), the same
shared-shingle candidate-join pattern as ``operators.dedupe`` — the LSH
scale path for huge pools lives in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from tagminder_spark.functions.core import mv_tokens

#: role → (cap, weight) corroboration scores (22:115-123).
ROLE_SCORE_RULES: dict[str, tuple[int, int]] = {
    "composer": (20, 10),
    "arranger": (10, 5),
    "lyricist": (10, 5),
    "writer": (10, 5),
}

TITLE_SCORE = 35   # 22:910
ALIAS_SCORE = 20   # 22:1000
WORKID_SCORE = 70  # 22:948
AUTO_APPLY_SCORE = 80   # 22:126
AUTO_APPLY_MARGIN = 20  # 22:127


def _norm(c):
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def step22_work_inference(
    tracks: DataFrame,
    works: DataFrame,
    roles: tuple[str, ...] = ("composer", "lyricist"),
) -> DataFrame:
    """Multi-signal work inference with explainable confidence tiers.

    tracks: alib frame with __path, title, musicbrainz_workid and role
    columns. works: dimension with work_id, work_mbid, work_title_norm,
    alias_norm (multi-value), and people_<role> (multi-value) columns.

    Signals (sum per (track, work) candidate): exact title-norm match
    +35, exact workid +70, alias-token match +20, per-role person
    corroboration min(cap, matches*weight). Per track: best candidate by
    (score desc, work_id asc), tier A/B/C/D from (exact_workid, score,
    margin, person_match) — 22:394-401 — and the guarded auto-apply rule
    (score/margin thresholds + exact-workid-or-unique-exact-title route
    guard, 22:1392-1405).
    """
    t = tracks.select(
        "__path",
        _norm(F.col("title")).alias("title_norm"),
        F.col("musicbrainz_workid"),
        *[F.col(r) for r in roles if r in tracks.columns],
    )
    w_base = works.select(
        "work_id", "work_mbid", "work_title_norm", "alias_norm",
        *[c for c in works.columns if c.startswith("people_")],
    )

    title_c = t.join(
        w_base, t["title_norm"] == w_base["work_title_norm"], "inner"
    ).select(
        "__path",
        "work_id",
        F.lit(TITLE_SCORE).alias("title_score"),
        F.lit(0).alias("alias_score"),
        F.lit(0).alias("workid_score"),
        F.lit(True).alias("exact_title_norm"),
        F.lit(False).alias("exact_workid"),
    )
    workid_c = t.filter(F.col("musicbrainz_workid").isNotNull()).join(
        w_base, t["musicbrainz_workid"] == w_base["work_mbid"], "inner"
    ).select(
        "__path",
        "work_id",
        F.lit(0).alias("title_score"),
        F.lit(0).alias("alias_score"),
        F.lit(WORKID_SCORE).alias("workid_score"),
        F.lit(False).alias("exact_title_norm"),
        F.lit(True).alias("exact_workid"),
    )
    aliases = w_base.select(
        "work_id", F.explode(mv_tokens(F.col("alias_norm"))).alias("alias_tok")
    )
    alias_c = t.join(
        aliases, t["title_norm"] == aliases["alias_tok"], "inner"
    ).select(
        "__path",
        "work_id",
        F.lit(0).alias("title_score"),
        F.lit(ALIAS_SCORE).alias("alias_score"),
        F.lit(0).alias("workid_score"),
        F.lit(False).alias("exact_title_norm"),
        F.lit(False).alias("exact_workid"),
    )
    cands = (
        title_c.unionByName(workid_c)
        .unionByName(alias_c)
        .groupBy("__path", "work_id")
        .agg(
            F.sum("title_score").alias("title_score"),
            F.sum("alias_score").alias("alias_score"),
            F.sum("workid_score").alias("workid_score"),
            F.max("exact_title_norm").alias("exact_title_norm"),
            F.max("exact_workid").alias("exact_workid"),
        )
    )

    # person corroboration as set arithmetic (optimization round 14,
    # guide §2.3/§2.4): the per-(track, work, role) distinct-match count
    # is |distinct_norm(track tokens) ∩ distinct_norm(work tokens)| —
    # computed with array_intersect on token arrays attached to the
    # candidate row, instead of the former explode → candidate join →
    # dropDuplicates → pivot → re-join chain (four shuffles and a
    # multi-million-row exploded intermediate; the arrays are a handful
    # of short names per cell, so carrying them is cheaper than
    # exploding them). Roles present on only one side can never match —
    # identical to the old role-keyed equi-join.
    common_roles = [
        r
        for r in roles
        if r in tracks.columns and f"people_{r}" in works.columns
    ]
    # preserve the scoring contract: every requested role must have a rule
    for r in roles:
        ROLE_SCORE_RULES[r]
    if common_roles:
        norm_set = lambda c: F.array_distinct(  # noqa: E731
            F.transform(mv_tokens(c), _norm)
        )
        tp_arrays = tracks.select(
            "__path",
            *[norm_set(F.col(r)).alias(f"__tp_{r}") for r in common_roles],
        )
        wp_arrays = w_base.select(
            "work_id",
            *[
                norm_set(F.col(f"people_{r}")).alias(f"__wp_{r}")
                for r in common_roles
            ],
        )
        n_match = {
            r: F.size(
                F.array_intersect(
                    F.coalesce(F.col(f"__tp_{r}"), F.array()),
                    F.coalesce(F.col(f"__wp_{r}"), F.array()),
                )
            )
            for r in common_roles
        }
        score_expr = None
        match_expr = None
        for r in common_roles:
            cap, weight = ROLE_SCORE_RULES[r]
            s = F.when(
                n_match[r] > 0, F.least(F.lit(cap), n_match[r] * weight)
            ).otherwise(F.lit(0))
            score_expr = s if score_expr is None else score_expr + s
            m = n_match[r] > 0
            match_expr = m if match_expr is None else match_expr | m
        cands = (
            cands.join(wp_arrays, "work_id")
            .join(tp_arrays, "__path")
            .withColumn("people_score", score_expr.cast("long"))
            .withColumn("person_match", match_expr)
            .drop(
                *[f"__tp_{r}" for r in common_roles],
                *[f"__wp_{r}" for r in common_roles],
            )
        )
    else:
        cands = cands.withColumn("people_score", F.lit(0)).withColumn(
            "person_match", F.lit(False)
        )

    total = (
        F.col("title_score")
        + F.col("alias_score")
        + F.col("workid_score")
        + F.col("people_score")
    )
    # One shuffle by __path serves the ranking AND the per-track
    # aggregates: runner-up score and exact-title count ride as plain
    # windows over the same partitioning instead of a groupBy + rejoin.
    rank_w = W.partitionBy("__path").orderBy(F.desc("total"), F.asc("work_id"))
    path_w = W.partitionBy("__path")
    ranked = (
        cands.withColumn("total", total)
        .withColumn("rn", F.row_number().over(rank_w))
        .withColumn(
            "exact_title_cnt",
            F.sum(F.col("exact_title_norm").cast("long")).over(path_w),
        )
        .withColumn(
            "runner_up_score",
            F.max(F.when(F.col("rn") == 2, F.col("total"))).over(path_w),
        )
    )
    best = ranked.filter(F.col("rn") == 1).na.fill({"runner_up_score": 0})
    margin = F.col("total") - F.col("runner_up_score")
    tier = (
        F.when(
            F.col("exact_workid") & (F.col("total") >= 90) & (margin >= 20),
            F.lit("A"),
        )
        .when(
            (F.col("total") >= 80) & (margin >= 20) & F.col("person_match"),
            F.lit("B"),
        )
        .when(F.col("total") >= 60, F.lit("C"))
        .otherwise(F.lit("D"))
    )
    route_ok = F.col("exact_workid") | (
        F.col("exact_title_norm") & (F.col("exact_title_cnt") == 1)
    )
    summary = best.select(
        "__path",
        F.col("work_id").alias("best_work_id"),
        F.col("total").alias("best_score"),
        F.col("runner_up_score"),
        tier.alias("confidence_tier"),
        F.when(
            tier.isin("A", "B")
            & (F.col("total") >= AUTO_APPLY_SCORE)
            & (margin >= AUTO_APPLY_MARGIN)
            & route_ok,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("auto_apply"),
    )
    return (
        tracks.select("__path")
        .join(summary, "__path", "left")
        .na.fill(
            {
                "best_score": 0,
                "runner_up_score": 0,
                "confidence_tier": "D",
                "auto_apply": 0,
            }
        )
    )


# ---------------------------------------------------------------------------
# 15: contributor similarity workspace
# ---------------------------------------------------------------------------

def step15_contributor_similarity(
    df: DataFrame,
    cols: tuple[str, ...] = ("artist", "albumartist", "composer"),
    threshold: float = 0.6,
) -> DataFrame:
    """Candidate duplicate-contributor pairs: pool distinct names across
    the contributor columns, character-bigram Jaccard over normalized
    names via the shared-shingle equi-join, keep pairs ≥ threshold with
    bidirectional-dup elimination (name_a < name_b).

    The reference uses TF-IDF char-ngram cosine at 0.85
    (15-contributor-similarity-analysis.py:35, 225-313); bigram Jaccard
    is the deterministic, engine-portable analogue (SURVEY §7.4: calibrate
    thresholds against fixtures rather than chasing numeric equality).
    """
    pool = None
    for c in cols:
        if c not in df.columns:
            continue
        p = df.select(F.explode(mv_tokens(F.col(c))).alias("name"))
        pool = p if pool is None else pool.unionByName(p)
    pool = pool.dropDuplicates().withColumn("norm", _norm(F.col("name")))

    # sequence(1, n-1) with n<2 would generate a DESCENDING sequence —
    # guard single-char names to an empty gram list.
    positions = F.when(
        F.length("norm") >= 2, F.sequence(F.lit(1), F.length("norm") - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = pool.select(
        "name",
        "norm",
        F.explode(
            F.array_distinct(
                F.transform(positions, lambda i: F.col("norm").substr(i, F.lit(2)))
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("name").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col("name").alias("name_a"), "g")
    b = grams.select(F.col("name").alias("name_b"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("name").alias("name_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("name").alias("name_b"), F.col("n_grams").alias("nb"))
    out = (
        shared.join(sa, "name_a")
        .join(sb, "name_b")
        .withColumn(
            "similarity",
            F.col("shared")
            / (F.col("na") + F.col("nb") - F.col("shared")).cast("double"),
        )
        .filter(F.col("similarity") >= threshold)
        .select("name_a", "name_b", "similarity")
    )
    return out


def step22_apply_works(alib: DataFrame, works: DataFrame) -> DataFrame:
    """Apply high-confidence work inferences to the track table — the
    reference's auto-apply phase (22-infer-works-in-library.py:1684-1758):
    for rows passing the guarded auto-apply rule, fill a BLANK ``work``
    from the best work's title and set ``musicbrainz_workid`` from the
    best work's MBID (existing workid kept when the work has none).

    Returns an alib-shaped frame; diff-audit against the input yields the
    reference's changelog semantics (only-actual-changes logged).
    """
    from tagminder_spark.functions.core import blank_to_null

    inferred = step22_work_inference(alib, works).filter(F.col("auto_apply") == 1)
    dim_cols = ["work_id"]
    if "work_title" in works.columns:
        dim_cols.append("work_title")
    if "work_mbid" in works.columns:
        dim_cols.append("work_mbid")
    best = inferred.join(
        F.broadcast(works.select(*dim_cols).dropDuplicates(["work_id"])),
        inferred.best_work_id == F.col("work_id"),
        "left",
    ).select("__path", *dim_cols[1:])
    # best is per-track (not a dimension) — let AQE pick the join strategy
    out = alib.join(best, "__path", "left")
    if "work" in alib.columns and "work_title" in best.columns:
        out = out.withColumn(
            "work", F.coalesce(blank_to_null(F.col("work")), F.col("work_title"))
        )
    if "musicbrainz_workid" in alib.columns and "work_mbid" in best.columns:
        out = out.withColumn(
            "musicbrainz_workid",
            F.coalesce(F.col("work_mbid"), F.col("musicbrainz_workid")),
        )
    return out.drop(*[c for c in ("work_title", "work_mbid") if c in out.columns])
