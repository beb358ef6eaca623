"""Unit-level properties of the 5-phase ER merge (operators/er_merge.py):
positional stage matching, guard behavior, phase provenance, residuals."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagminder_spark.operators.er_merge import (
    contributors_merge,
    staged_positional_match,
)


def _src(spark, rows, id_name):
    return spark.createDataFrame(
        rows, f"{id_name} bigint, name string, mbid string, qid string, mnid string"
    )


def test_positional_match_pairs_kth_with_kth(spark):
    left = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y")], "mb_id bigint, k_mbid string"
    )
    right = spark.createDataFrame(
        [(10, "X"), (20, "X"), (30, "Z")], "wd_id bigint, k_mbid string"
    )
    m, l_res, r_res = staged_positional_match(
        left, right, "mb_id", "wd_id", [("k_mbid", "mbid", None)]
    )
    got = {(r.mb_id, r.wd_id) for r in m.collect()}
    # 1st X pairs 1st X, 2nd X pairs 2nd X; Y and Z stay residual
    assert got == {(1, 10), (2, 20)}
    assert [r.mb_id for r in l_res.collect()] == [3]
    assert [r.wd_id for r in r_res.collect()] == [30]


def test_stage_order_and_mnid_requires_null_mbid(spark):
    mb = _src(spark, [(1, "A", "B1", "Q1", None), (2, "B", None, "Q2", "M1")], "mb_id")
    wd = _src(
        spark,
        [
            (10, "A", "B1", "Q9", None),   # matches row 1 by mbid (stage 1)
            (20, "B", "B9", None, "M1"),   # mnid M1 but HAS mbid → no mnid match
        ],
        "wd_id",
    )
    amg = spark.createDataFrame([], "amg_id bigint, name string, mnid string")
    out = contributors_merge(mb, wd, amg)
    rows = {r.contributor_row_id: r for r in out.collect()}
    assert rows["mb:1"].match_stage == "mbid"
    # wd row 20 carries an MBID, so the mnid stage must NOT take it
    assert rows["mb:2"].match_stage is None


def test_name_fallback_guards_and_residual(spark):
    mb = _src(
        spark,
        [
            (1, "Alice", None, None, None),   # unique name → wd_name fallback
            (2, "Dup", None, None, None),     # duplicated name → blocked
            (3, "Dup", None, None, None),
            (4, "Carol", None, None, "M7"),   # conflict: mb mnid M7 vs wd M8
        ],
        "mb_id",
    )
    wd = _src(
        spark,
        [
            (10, " alice ", None, None, None),  # normalization bridges spacing/case
            (20, "Dup", None, None, None),
            (30, "Carol", None, None, "M8"),
        ],
        "wd_id",
    )
    amg = spark.createDataFrame(
        [(100, "Zed", "M99")], "amg_id bigint, name string, mnid string"
    )
    out = contributors_merge(mb, wd, amg)
    rows = {r.contributor_row_id: r for r in out.collect()}
    assert rows["mb:1"].wd_phase == "wd_name"
    assert rows["mb:1"].wikimedia_name == " alice "  # raw value preserved
    assert rows["mb:2"].wd_phase is None and rows["mb:3"].wd_phase is None
    assert rows["mb:4"].wd_phase is None  # mnid conflict blocks the match
    # unmatched AMG appended as residual with source-prefixed columns
    assert rows["amg:100"].amg_phase == "residual"
    assert rows["amg:100"].allmusic_name == "Zed"
    assert rows["amg:100"].has_musicbrainz_row == 0


def test_bridge_and_allocation_consume_amg(spark):
    mb = _src(
        spark,
        [
            (1, "A", "B1", None, None),    # staged via mbid; wd mnid M5 → bridge
            (2, "B", None, None, "M6"),    # no wd; mb mnid M6 → allocation
        ],
        "mb_id",
    )
    wd = _src(spark, [(10, "A", "B1", None, "M5")], "wd_id")
    amg = spark.createDataFrame(
        [(5, "Amg5", "M5"), (6, "Amg6", "M6")], "amg_id bigint, name string, mnid string"
    )
    out = contributors_merge(mb, wd, amg)
    rows = {r.contributor_row_id: r for r in out.collect()}
    assert rows["mb:1"].amg_phase == "bridge" and rows["mb:1"].allmusic_mnid == "M5"
    assert rows["mb:2"].amg_phase == "allocation" and rows["mb:2"].allmusic_mnid == "M6"
    assert out.filter(F.col("amg_phase") == "residual").count() == 0
