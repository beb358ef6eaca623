"""Five-phase entity-resolution merge — the reference's contributor MDM
harvest (scripts/mdm/harvest/emit_contributors.py:1043-3014) at fidelity.

Shape of the reference flow:

1. **Staged positional match** between the two keyed sources (mbid →
   qid → mnid-where-mbid-null; :1043-1140): within each stage the k-th
   left row holding a key value pairs with the k-th right row holding it
   (cum_count/ROW_NUMBER parity), matched rows leave both residual pools
   before the next stage, and the stage name is recorded as provenance.
2. **Merged output** with source-prefixed columns and ``has_*_row``
   flags (:2627-2743) — every surviving attribute keeps its source
   namespace, nothing is overwritten blindly.
3. **Enrichment phases** over the residuals, each a coalesce-style fill
   that only touches rows still missing that source:
   - MNID bridge (:1669): rows holding MB+WD but no AMG reach AMG
     through the WD-side MNID.
   - exact-name fallbacks (:1853 WD, :2164 AMG): normalized-name
     equi-join guarded by BOTH-side name uniqueness and cross-field
     consistency (ids must agree when both present).
   - terminal lower-name (:2440): last name-based pass for MB-only rows.
   - allocation (:2615): seed-key enrichment via the MB-side MNID, then
     residual AMG rows appended as new output rows.

Scale notes: every phase is an equi-join on a normalized key; the
uniqueness guards are group-by-count filters (no windows over the full
table); the sequential-residual structure is a linear chain of narrow
anti-joins. At 100 TB you would checkpoint the merged base between
phases to cut the replay depth; at gate scale Catalyst handles the
whole chain as one plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from tagminder_spark.cache import scoped_persist


def norm_key(c: Column) -> Column:
    """The reference's _normalize_exact_name_expr (:47-59): blank → NULL,
    else collapse whitespace, trim, lowercase."""
    s = F.lower(F.trim(F.regexp_replace(c.cast("string"), r"\s+", " ")))
    return F.when(c.isNull() | (F.trim(c.cast("string")) == ""), F.lit(None)).otherwise(s)


NORM_SQL = (
    "CASE WHEN {x} IS NULL OR trim(CAST({x} AS VARCHAR)) = '' THEN NULL "
    "ELSE lower(trim(regexp_replace(CAST({x} AS VARCHAR), '\\s+', ' ', 'g'))) END"
)


def staged_positional_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    stages: list[tuple[str, str, Column | None]],
    right_quarantine: dict[str, str] | None = None,
    cp=None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(matches, left_residual, right_residual).

    ``stages``: (key_col, stage_name, right_extra_filter). Positional
    contract per stage: the k-th left row with a key value (ordered by
    id) pairs with the k-th right row with it — exactly the reference's
    cum_count-over-key join (:1097-1121) — and matched rows leave both
    pools before the next, coarser stage.

    ``right_quarantine``: stage_name → column; AFTER that stage, rows of
    the right residual whose (non-null) value in the column is shared by
    another residual row are removed for good — the reference's
    inter-stage data-quality gate (emit_contributors.py:1134-1210:
    duplicated QIDs quarantined before the qid stage, duplicated MNIDs
    before the mnid stage). Positional matching over ambiguous
    duplicates would otherwise pair them arbitrarily.

    ``cp``: optional lineage-truncating materializer applied to each
    stage's (small, id-pair) match frame — it is consumed three times
    (matches union + both residual anti-joins) and would otherwise
    recompute its window joins per consumer.
    """
    cp = cp or (lambda d: d)
    matches: DataFrame | None = None
    l_res, r_res = left, right
    for key, name, r_filter in stages:
        l = (
            l_res.filter(F.col(key).isNotNull())
            .withColumn("__rn", F.row_number().over(W.partitionBy(key).orderBy(left_id)))
            .select(left_id, key, "__rn")
        )
        r = r_res.filter(F.col(key).isNotNull())
        if r_filter is not None:
            r = r.filter(r_filter)
        r = r.withColumn(
            "__rn", F.row_number().over(W.partitionBy(key).orderBy(right_id))
        ).select(right_id, key, "__rn")
        m = cp(
            l.join(r, [key, "__rn"]).select(
                left_id, right_id, F.lit(name).alias("match_stage")
            )
        )
        matches = m if matches is None else matches.unionByName(m)
        l_res = l_res.join(m.select(left_id), left_id, "left_anti")
        r_res = r_res.join(m.select(right_id), right_id, "left_anti")
        if right_quarantine and name in right_quarantine:
            qcol = right_quarantine[name]
            # count-window form, same rationale as unique_on: the old
            # groupBy + anti-join computed r_res twice and added a
            # broadcast build; NULL qcol rows are never quarantined
            # (they all land in one window partition, where the
            # non-null count is 0 for them by the filter below).
            r_res = (
                r_res.withColumn(
                    "__qn",
                    F.count(F.when(F.col(qcol).isNotNull(), F.lit(1))).over(
                        W.partitionBy(qcol)
                    ),
                )
                .filter(F.col(qcol).isNull() | (F.col("__qn") <= 1))
                .drop("__qn")
            )
    return matches, l_res, r_res


def unique_on(df: DataFrame, col: str) -> DataFrame:
    """Rows whose non-null ``col`` value occurs exactly once — the
    reference's both-side uniqueness guard (:1965-1972, :2504-2519).

    One count-window over ``col`` instead of groupBy + semi-join
    (optimization round 14): the join form computed ``df`` twice (once
    under the aggregate, once as probe side) and added a broadcast
    build per call — 3 extra plan levels × 8 call sites in a merge
    whose wall-clock is stage-count-bound (each stage pays a fixed
    scheduling latency; the frames here are small keyed maps). Row set
    is identical: non-null values kept iff their count is exactly 1.
    """
    return (
        df.filter(F.col(col).isNotNull())
        .withColumn("__n", F.count(F.lit(1)).over(W.partitionBy(col)))
        .filter(F.col("__n") == 1)
        .drop("__n")
    )


def consistent(a: Column, b: Column) -> Column:
    """The id_ok guard (:1984-2009): when both sides carry the id they
    must agree; a missing side never blocks the match."""
    return F.when(a.isNotNull() & b.isNotNull(), a == b).otherwise(F.lit(True))


def contributors_merge(
    mb: DataFrame,
    wd: DataFrame,
    amg: DataFrame,
    checkpoint: bool = True,
    checkpointer=None,
) -> DataFrame:
    """The full 5-phase merge for the contributor column contract.

    Inputs (ids long, attributes string, nullable):
      mb(mb_id, name, mbid, qid, mnid) · wd(wd_id, name, mbid, qid, mnid)
      · amg(amg_id, name, mnid) with amg.mnid unique (the AMG rollup is
      keyed by MNID, :558).

    Output: one row per MB contributor plus residual-allocated AMG rows,
    with source-prefixed columns, has_*_row flags, the staged match
    stage, and per-source enrichment-phase provenance.

    Execution shape (round 4): the sequential-residual phase logic runs
    entirely over SMALL keyed frames — each phase emits an id-pair map
    ``(mb_id, wd_id|amg_id)`` — and the wide output is assembled in ONE
    final join pass (mbn ⟕ wd-map ⟕ wdn ⟕ amg-map ⟕ amgn).  Only the
    tiny match maps are checkpointed to bound plan-compounding; the wide
    frame is never materialized mid-flight (round 3 checkpointed it six
    times, which dominated runtime and, via ``localCheckpoint``, was
    fragile to executor loss at cluster scale).

    ``checkpoint`` truncates lineage at each phase boundary.
    ``checkpointer`` makes the primitive pluggable: pass
    ``lambda d: d.checkpoint()`` (with ``sparkContext.setCheckpointDir``)
    for reliable cluster-scale checkpoints; the default is
    ``localCheckpoint`` — right for single-node / gate scale.
    """
    if checkpointer is not None:
        _cp = checkpointer
    else:
        # eager=False (optimization round 13): the DataFrame-level plan
        # truncation (LogicalRDD) happens at call time either way — what
        # eager=True added was ONE SEPARATE JOB per phase map (~13 jobs
        # for the full merge, each paying scheduling + exchange latency
        # on a tiny frame). Lazily-checkpointed maps materialize inside
        # their first consumer's job and are served from the persisted
        # blocks for every later consumer. Measured sf0.1: the merge
        # 12.2 -> 7.8 s, identical output (oracle-gated); the
        # no-checkpoint variant still compounds plans unboundedly, so
        # truncation itself stays.
        _cp = (
            (lambda d: d.localCheckpoint(eager=False))
            if checkpoint
            else (lambda d: d)
        )
    mbn = mb.select(
        "mb_id",
        F.col("name").alias("mb_name"),
        F.col("mbid").alias("mb_mbid"),
        F.col("qid").alias("mb_qid"),
        F.col("mnid").alias("mb_mnid"),
        norm_key(F.col("name")).alias("mb_name_n"),
        norm_key(F.col("mbid")).alias("mb_mbid_n"),
        norm_key(F.col("qid")).alias("mb_qid_n"),
        norm_key(F.col("mnid")).alias("mb_mnid_n"),
    )
    wdn = wd.select(
        "wd_id",
        F.col("name").alias("wd_name"),
        F.col("mbid").alias("wd_mbid"),
        F.col("qid").alias("wd_qid"),
        F.col("mnid").alias("wd_mnid"),
        norm_key(F.col("name")).alias("wd_name_n"),
        norm_key(F.col("mbid")).alias("wd_mbid_n"),
        norm_key(F.col("qid")).alias("wd_qid_n"),
        norm_key(F.col("mnid")).alias("wd_mnid_n"),
    )
    amgn = amg.select(
        "amg_id",
        F.col("name").alias("amg_name"),
        F.col("mnid").alias("amg_mnid"),
        norm_key(F.col("name")).alias("amg_name_n"),
        norm_key(F.col("mnid")).alias("amg_mnid_n"),
    )
    # the normalized inputs are consumed by EVERY phase (residual
    # anti-joins, name lookups, final assembly); each eager checkpoint
    # otherwise re-runs their scan+normalize chain once per phase —
    # persist them for the merge's lifetime (the consumer's action
    # fills the cache; bench/driver reclaim blocks after the query)
    mbn = scoped_persist(mbn)
    wdn = scoped_persist(wdn)
    amgn = scoped_persist(amgn)

    # ---- stage A: staged positional MB↔WD match (mbid → qid → mnid) ----
    matches, _, wd_res = staged_positional_match(
        mbn.select("mb_id", "mb_mbid_n", "mb_qid_n", "mb_mnid_n").withColumnsRenamed(
            {"mb_mbid_n": "k_mbid", "mb_qid_n": "k_qid", "mb_mnid_n": "k_mnid"}
        ),
        wdn.select("wd_id", "wd_mbid_n", "wd_qid_n", "wd_mnid_n").withColumnsRenamed(
            {"wd_mbid_n": "k_mbid", "wd_qid_n": "k_qid", "wd_mnid_n": "k_mnid"}
        ),
        "mb_id",
        "wd_id",
        [
            ("k_mbid", "mbid", None),
            ("k_qid", "qid", None),
            # MNID matching only for WD rows that carry no MBID (:1092)
            ("k_mnid", "mnid", F.col("k_mbid").isNull()),
        ],
        # inter-stage quality gates (:1134-1210): residual WD rows with
        # duplicated QIDs leave before the qid stage, duplicated MNIDs
        # before the mnid stage — and stay out of the later name phases
        right_quarantine={"mbid": "k_qid", "qid": "k_mnid"},
        cp=_cp,
    )
    matches = _cp(matches)
    wd_res = _cp(wd_res.select("wd_id"))

    # ---- phase 1: MNID bridge (:1669) — staged MB+WD rows reach AMG
    # through the WD-side MNID (AMG is MNID-unique by rollup
    # construction). unique_on guard: a malformed input with a duplicated
    # MNID would fan this join out and silently duplicate output rows —
    # enforce the contract here (same guard family as the name phases).
    bridge_targets = (
        matches.select("mb_id", "wd_id")
        .join(wdn.select("wd_id", "wd_mnid_n"), "wd_id")
        .filter(F.col("wd_mnid_n").isNotNull())
        .select("mb_id", F.col("wd_mnid_n").alias("k"))
    )
    m1 = _cp(
        bridge_targets.join(
            unique_on(amgn, "amg_mnid_n").select(
                "amg_id", F.col("amg_mnid_n").alias("k")
            ),
            "k",
        ).select("mb_id", "amg_id")
    )

    # ---- phase 2: WD exact-name fallback (:1853) — rows without a WD
    # match take the residual WD row of the same unique normalized name,
    # guarded by id consistency ----
    t2 = unique_on(
        mbn.join(matches.select("mb_id"), "mb_id", "left_anti")
        .filter(F.col("mb_name_n").isNotNull())
        .select("mb_id", F.col("mb_name_n").alias("k"), "mb_mbid_n", "mb_qid_n", "mb_mnid_n"),
        "k",
    )
    s2 = unique_on(
        wd_res.join(wdn, "wd_id")
        .filter(F.col("wd_name_n").isNotNull())
        .select("wd_id", F.col("wd_name_n").alias("k"), "wd_mbid_n", "wd_qid_n", "wd_mnid_n"),
        "k",
    )
    m2 = _cp(
        t2.join(s2, "k")
        .filter(
            consistent(F.col("mb_mbid_n"), F.col("wd_mbid_n"))
            & consistent(F.col("mb_qid_n"), F.col("wd_qid_n"))
            & consistent(F.col("mb_mnid_n"), F.col("wd_mnid_n"))
        )
        .select("mb_id", "wd_id")
    )

    # WD assignment map: staged matches carry the stage name; name-phase
    # matches carry the phase label only (the reference records no stage
    # for name fallbacks).
    wd_map = matches.select(
        "mb_id", "wd_id", "match_stage", F.lit("staged").alias("wd_phase")
    ).unionByName(
        m2.select(
            "mb_id",
            "wd_id",
            F.lit(None).cast("string").alias("match_stage"),
            F.lit("wd_name").alias("wd_phase"),
        )
    )

    # ---- phase 3: AMG exact-name fallback (:2164) — WD-carrying rows
    # (staged OR name-matched) not already bridged match residual AMG by
    # the WD label ----
    t3 = unique_on(
        wd_map.select("mb_id", "wd_id")
        .join(m1.select("mb_id"), "mb_id", "left_anti")
        .join(wdn.select("wd_id", "wd_name_n"), "wd_id")
        .join(mbn.select("mb_id", "mb_mnid_n"), "mb_id")
        .filter(F.col("wd_name_n").isNotNull())
        .select("mb_id", F.col("wd_name_n").alias("k"), "mb_mnid_n"),
        "k",
    )
    amg_res = amgn.select("amg_id", "amg_name_n", "amg_mnid_n").join(
        m1.select("amg_id"), "amg_id", "left_anti"
    )
    s3 = unique_on(
        amg_res.filter(F.col("amg_name_n").isNotNull()).select(
            "amg_id", F.col("amg_name_n").alias("k"), "amg_mnid_n"
        ),
        "k",
    )
    m3 = _cp(
        t3.join(s3, "k")
        .filter(consistent(F.col("mb_mnid_n"), F.col("amg_mnid_n")))
        .select("mb_id", "amg_id")
    )

    # ---- phase 4: terminal lower-name (:2440) — MB-only rows, strictly
    # unique normalized names on both sides ----
    t4 = unique_on(
        mbn.join(wd_map.select("mb_id"), "mb_id", "left_anti")
        .join(
            m1.select("mb_id").unionByName(m3.select("mb_id")), "mb_id", "left_anti"
        )
        .filter(F.col("mb_name_n").isNotNull())
        .select("mb_id", F.col("mb_name_n").alias("k"), "mb_mnid_n"),
        "k",
    )
    amg_res = amg_res.join(m3.select("amg_id"), "amg_id", "left_anti")
    s4 = unique_on(
        amg_res.filter(F.col("amg_name_n").isNotNull()).select(
            "amg_id", F.col("amg_name_n").alias("k"), "amg_mnid_n"
        ),
        "k",
    )
    m4 = _cp(
        t4.join(s4, "k")
        .filter(consistent(F.col("mb_mnid_n"), F.col("amg_mnid_n")))
        .select("mb_id", "amg_id")
    )

    # ---- phase 5: allocation (:2615) — seed enrichment through the
    # MB-side MNID over everything still unmatched ----
    consumed_mb = (
        m1.select("mb_id").unionByName(m3.select("mb_id")).unionByName(m4.select("mb_id"))
    )
    t5 = (
        mbn.join(consumed_mb, "mb_id", "left_anti")
        .filter(F.col("mb_mnid_n").isNotNull())
        .select("mb_id", F.col("mb_mnid_n").alias("k"))
    )
    amg_res = amg_res.join(m4.select("amg_id"), "amg_id", "left_anti")
    m5 = t5.join(
        unique_on(amg_res, "amg_mnid_n").select(
            "amg_id", F.col("amg_mnid_n").alias("k")
        ),
        "k",
    ).select("mb_id", "amg_id")

    # AMG assignment map with phase provenance.
    amg_map = _cp(
        m1.withColumn("amg_phase", F.lit("bridge"))
        .unionByName(m3.withColumn("amg_phase", F.lit("amg_name")))
        .unionByName(m4.withColumn("amg_phase", F.lit("amg_lower")))
        .unionByName(m5.withColumn("amg_phase", F.lit("allocation")))
    )

    # ---- final assembly: ONE wide pass ----
    base = (
        mbn.join(wd_map, "mb_id", "left")
        .join(wdn, "wd_id", "left")
        .join(amg_map, "mb_id", "left")
        .join(amgn.select("amg_id", "amg_name", "amg_mnid"), "amg_id", "left")
        .withColumn("has_musicbrainz_row", F.lit(1))
        .withColumn("has_wikimedia_row", F.col("wd_id").isNotNull().cast("int"))
        .withColumn("has_allmusic_row", F.col("amg_id").isNotNull().cast("int"))
    )
    amg_res = amg_res.join(m5.select("amg_id"), "amg_id", "left_anti").join(
        amgn.select("amg_id", "amg_name", "amg_mnid"), "amg_id"
    )

    out_cols = [
        "contributor_row_id",
        "has_musicbrainz_row",
        "has_wikimedia_row",
        "has_allmusic_row",
        "match_stage",
        "wd_phase",
        "amg_phase",
        "musicbrainz_name",
        "musicbrainz_mbid",
        "musicbrainz_qid",
        "musicbrainz_mnid",
        "wikimedia_name",
        "wikimedia_mbid",
        "wikimedia_qid",
        "wikimedia_mnid",
        "allmusic_name",
        "allmusic_mnid",
    ]
    merged = base.select(
        F.concat(F.lit("mb:"), F.col("mb_id").cast("string")).alias("contributor_row_id"),
        "has_musicbrainz_row",
        "has_wikimedia_row",
        "has_allmusic_row",
        "match_stage",
        "wd_phase",
        "amg_phase",
        F.col("mb_name").alias("musicbrainz_name"),
        F.col("mb_mbid").alias("musicbrainz_mbid"),
        F.col("mb_qid").alias("musicbrainz_qid"),
        F.col("mb_mnid").alias("musicbrainz_mnid"),
        F.col("wd_name").alias("wikimedia_name"),
        F.col("wd_mbid").alias("wikimedia_mbid"),
        F.col("wd_qid").alias("wikimedia_qid"),
        F.col("wd_mnid").alias("wikimedia_mnid"),
        F.col("amg_name").alias("allmusic_name"),
        F.col("amg_mnid").alias("allmusic_mnid"),
    )
    residual = amg_res.select(
        F.concat(F.lit("amg:"), F.col("amg_id").cast("string")).alias(
            "contributor_row_id"
        ),
        F.lit(0).alias("has_musicbrainz_row"),
        F.lit(0).alias("has_wikimedia_row"),
        F.lit(1).alias("has_allmusic_row"),
        F.lit(None).cast("string").alias("match_stage"),
        F.lit(None).cast("string").alias("wd_phase"),
        F.lit("residual").alias("amg_phase"),
        *[F.lit(None).cast("string").alias(c) for c in (
            "musicbrainz_name", "musicbrainz_mbid", "musicbrainz_qid",
            "musicbrainz_mnid", "wikimedia_name", "wikimedia_mbid",
            "wikimedia_qid", "wikimedia_mnid",
        )],
        F.col("amg_name").alias("allmusic_name"),
        F.col("amg_mnid").alias("allmusic_mnid"),
    )
    return merged.select(*out_cols).unionByName(residual.select(*out_cols))
